"""Whole-region CRF training on the bundled real reads.

Every failed real-data attempt on the rnnrf head (BASELINE.md rounds
2-3) trained on WINDOWS: short signal crops whose truth substrings are
derived from an estimated alignment, with local START/END states
absorbing the endpoint fuzz.  For a globally-normalised CRF that setup
is structurally noisy — a 2,000-block window has two uncertain
endpoints per 2,000 blocks and its truth substring inherits block-level
alignment jitter.

This module trains the canonical way CRF basecallers are trained
(e.g. ONT's production pipelines): ONE long region per read with the
truth sequence it covers, alignment marginalised by the lattice
forward over the whole region.  Endpoint uncertainty shrinks to two
ends per ~20k blocks and no interior label is alignment-derived at
all.  Memory is handled by checkpointed chunked scans (sqrt-remat over
the time axis) so a 30k-block x 7k-base lattice backprop fits on one
chip.

Losses use the SOUND local pair (crf_lattice_forward / local
partition), train/lattice.py.  Head-only mode freezes the conv+GRU
stack (features precomputed once) and fits only the 96->25 transition
head — a low-capacity domain adaptation that cannot forget the
simulated distribution's acoustic model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from scrappie_tpu.train.lattice import (
    _crf_lattice_forward_impl,
    _crf_local_partition_impl,
)


def chunked_scan(chunk: int):
    """A lax.scan-compatible callable that checkpoints in time chunks.

    Backprop through a T-step scan saves residuals for every step;
    wrapping each `chunk`-step slice in jax.checkpoint stores only the
    chunk boundary carries and recomputes inside the chunk, bounding
    residual memory at one chunk regardless of T.  Requires T % chunk
    == 0 (callers trim regions to a chunk multiple) and steps that
    return ys=None.
    """

    def scan(f, init, xs):
        def inner(c, xc):
            c, _ = jax.lax.scan(f, c, xc)
            return c, None

        T = jax.tree_util.tree_leaves(xs)[0].shape[0]
        if T % chunk:
            raise ValueError(f"T={T} not a multiple of chunk={chunk}")
        xs_c = jax.tree_util.tree_map(
            lambda a: a.reshape((T // chunk, chunk) + a.shape[1:]), xs)
        carry, _ = jax.lax.scan(jax.checkpoint(inner), init, xs_c)
        return carry, None

    return scan


def crf_wholeread_nll(trans, bases, local_pen: float = 4.0,
                      chunk: int = 256):
    """Sound per-block NLL of `bases` under transitions, remat-chunked.

    trans [B, T, 25] (T % chunk == 0), bases [B, L] (-1 right-padding).
    Returns scalar: mean over rows of (logZ_local - log P(seq)) / T.
    """
    scan = chunked_scan(chunk)
    logp = _crf_lattice_forward_impl(trans, bases, local_pen, scan)
    logz = _crf_local_partition_impl(trans, local_pen, scan)
    return ((logz - logp) / trans.shape[1]).mean()


def region_sequence(read, train_end: int, stride: int, chunk: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(signal [Tsig], bases [L]) for a read's training region.

    Trims the region so nblock = Tsig/stride is a multiple of `chunk`
    (chunked_scan requirement) and derives the truth subsequence from
    the span of aligned base indices inside the trimmed region — the
    only alignment information used; interior alignment is marginalised
    by the lattice.
    """
    tsig = (train_end // (stride * chunk)) * stride * chunk
    sig = read.norm[:tsig].astype(np.float32)
    ba = read.base_at[:tsig]
    valid = ba[ba >= 0]
    if not len(valid):
        raise ValueError(f"read {read.name}: no aligned bases in region")
    lo, hi = int(valid.min()), int(valid.max())
    return sig, read.bases[lo : hi + 1].astype(np.int32)


def make_wholeread_step(model: str, optimizer, local_pen: float = 4.0,
                        chunk: int = 256):
    """Full-parameter whole-region CRF train step (one read per call).

    sig [1, Tsig, 1], bases [1, L]; retraces per distinct (Tsig, L) —
    with two bundled reads that is two compilations.
    """
    import optax

    from scrappie_tpu import ops
    from scrappie_tpu.train.trainer import posterior_fn

    @jax.jit
    def train_step(params, opt_state, sig, bases):
        def lfn(p):
            with ops.pallas(False):
                trans = posterior_fn(model)(p, sig)
            return crf_wholeread_nll(trans, bases, local_pen, chunk)

        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def transducer_wholeread_nll(lp, seqstates, stay_pen: float = 0.0,
                             skip_pen: float = 4.0, local_pen: float = 4.0,
                             chunk: int = 256):
    """Whole-region transducer lattice NLL, remat-chunked.

    lp [B, T, S] per-block-normalised log posteriors (T % chunk == 0),
    seqstates [B, L] kmer states (-1 right-padding).  Unlike the CRF
    pair no partition term is needed: the posterior is per-block
    normalised, so -log P(seq)/T is the sound per-block NLL directly
    (same loss as train/lattice.lattice_loss_fn, over a whole region
    instead of a window)."""
    from scrappie_tpu.train.lattice import _lattice_forward_impl

    scan = chunked_scan(chunk)
    logp = _lattice_forward_impl(lp, seqstates, stay_pen, skip_pen,
                                 local_pen, scan)
    return (-logp / lp.shape[1]).mean()


def region_seqstates(read, train_end: int, stride: int, chunk: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """(signal [Tsig], kmer states [L-4]) for a transducer training
    region — the kmer-state analogue of region_sequence."""
    from scrappie_tpu.api import encode_bases
    from scrappie_tpu.models.specs import KMER_LEN

    sig, bases = region_sequence(read, train_end, stride, chunk)
    seq = "".join("ACGT"[b] for b in bases)
    return sig, np.asarray(encode_bases(seq, KMER_LEN), np.int32)


def region_event_seqstates(sampler, ridx: int, chunk: int
                           ) -> tuple[np.ndarray, np.ndarray]:
    """(event feats [T, 4], kmer states [L]) for an events-model
    training region — the event-table analogue of region_seqstates.

    T is the read's training-region event count trimmed to a multiple
    of `chunk`; features are the whole-read-studentised rows the
    shipping pipeline feeds the network (train/realdata.py
    RealEventSampler), and the kmer states span the bases aligned to
    the region's events (interior alignment marginalised by the
    lattice, exactly as for raw regions)."""
    d = sampler._ev[ridx]
    nev = (sampler._train_nev[ridx] // chunk) * chunk
    if not nev:
        raise ValueError("training region shorter than one chunk of events")
    feats = d["feats"][:nev].astype(np.float32)
    eb = d["ev_base"][:nev]
    valid = eb[eb >= 0]
    if not len(valid):
        raise ValueError("no aligned bases in events region")
    lo = max(int(valid.min()), sampler.klen - 1)
    hi = int(valid.max())
    if hi < lo:
        raise ValueError("events region spans no full kmer")
    return feats, d["kmers"][lo : hi + 1].astype(np.int32)


def make_wholeread_transducer_step(model: str, optimizer,
                                   stay_pen: float = 0.0,
                                   skip_pen: float = 4.0,
                                   local_pen: float = 4.0,
                                   chunk: int = 256):
    """Full-parameter whole-region transducer train step (one read per
    call).  sig [1, Tsig, 1], seqstates [1, L]; retraces per distinct
    (Tsig, L) shape.  Also serves nanonet_events, whose per-block
    posterior is per-event: pass event feats [1, T, 4] as `sig`
    (region_event_seqstates) — the lattice loss is identical because
    both model families emit per-block-normalised transducer
    posteriors (ref src/networks.c:146-194 events vs :321-420 raw)."""
    import optax

    from scrappie_tpu import ops
    from scrappie_tpu.train.trainer import posterior_fn

    @jax.jit
    def train_step(params, opt_state, sig, seqstates):
        def lfn(p):
            with ops.pallas(False):
                lp = posterior_fn(model)(p, sig)
            return transducer_wholeread_nll(lp, seqstates, stay_pen,
                                            skip_pen, local_pen, chunk)

        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


HEAD_KEYS = ("FF_W", "FF_b")


def make_head_step(optimizer, local_pen: float = 4.0, chunk: int = 256):
    """Head-only whole-region step on PRECOMPUTED features.

    feats [1, T, 96] from models.forward.rnnrf_features under the
    frozen stack; only FF_W/FF_b receive gradients.  globalnorm is kept
    in the graph so the trained head sees the exact energies decode
    uses (the sound NLL itself is shift-invariant only up to the local
    free-stay mixing, so train in decode parameterisation).
    """
    import optax

    from scrappie_tpu.nn.layers import globalnorm

    @jax.jit
    def train_step(head, opt_state, feats, bases):
        def lfn(h):
            trans = globalnorm(feats, h["FF_W"], h["FF_b"])
            return crf_wholeread_nll(trans, bases, local_pen, chunk)

        loss, grads = jax.value_and_grad(lfn)(head)
        updates, opt_state = optimizer.update(grads, opt_state, head)
        head = optax.apply_updates(head, updates)
        return head, opt_state, loss

    return train_step

"""Alignment-free (CTC-style) sequence lattice loss.

Per-block CE labels (train/trainer.loss_fn) require an exact
signal-to-sequence alignment.  On real reads the alignment is itself
estimated (train/realdata.py) with block-level jitter, and on
high-dwell data the stay class dominates: CE on noisy alignments
teaches the network to hedge into stays, which collapses the decoded
sequence (observed: models fine-tuned with CE on real/realistic data
call almost no bases).

The fix is the classic CTC idea: marginalise over alignments.  The
transducer posterior already defines a lattice over (stay | advance to
next kmer | skip) — the same lattice the posterior->sequence mapper
scores (decode/mapping.py, behavioural spec ref src/decode.c:1547-1626).
This module is a batched, differentiable forward pass of that lattice:

    loss = -(1/nblock) * log P(truth kmer sequence | posterior)

Local START/END states absorb window-edge uncertainty (the truth
substring endpoints are only approximately known), exactly as the
reference's local-global mapping does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1.0e30


@functools.partial(jax.jit, static_argnames=())
def lattice_forward_batch(logpost, seqstates, stay_pen=0.0, skip_pen=4.0,
                          local_pen=4.0):
    """Batched forward score of sequences under transducer posteriors.

    logpost [B, T, S] log-probabilities (stay class = S-1);
    seqstates [B, L] kmer state per sequence position, -1 padding
    (sequences are left-aligned, padded on the right).
    Returns [B] log P(sequence | posterior), local-global.
    (jitted wrapper; see _lattice_forward_impl)
    """
    return _lattice_forward_impl(logpost, seqstates, stay_pen, skip_pen,
                                 local_pen, jax.lax.scan)


def _lattice_forward_impl(logpost, seqstates, stay_pen, skip_pen,
                          local_pen, scan_fn):
    """Scan-parametrised transducer lattice forward: `scan_fn` is
    lax.scan for windows, or train/wholeread.chunked_scan for
    remat-chunked whole-region training (the CRF pair's pattern)."""
    logpost = jnp.asarray(logpost, jnp.float32)
    seqstates = jnp.asarray(seqstates, jnp.int32)
    B, T, S = logpost.shape
    L = seqstates.shape[1]
    neg = jnp.float32(-BIG)

    valid = seqstates >= 0                       # [B, L]
    safe = jnp.where(valid, seqstates, 0)
    seqlen = valid.sum(axis=1)                   # [B]
    lastpos = jnp.maximum(seqlen - 1, 0)

    init_pos = jnp.full((B, L), -BIG, jnp.float32)
    init = (init_pos, jnp.zeros((B,), jnp.float32),
            jnp.full((B,), -BIG, jnp.float32))   # positions, START, END

    def step(carry, lp_t):
        prev, start, end = carry                 # [B, L], [B], [B]
        emit = jnp.take_along_axis(lp_t, safe, axis=1)  # [B, L]
        emit = jnp.where(valid, emit, neg)
        stay_lp = lp_t[:, S - 1]                 # [B]

        stay_c = prev - stay_pen + stay_lp[:, None]
        step_c = jnp.concatenate(
            [jnp.full((B, 1), -BIG), prev[:, :-1]], axis=1) + emit
        skip_c = jnp.concatenate(
            [jnp.full((B, 2), -BIG), prev[:, :-2]], axis=1) - skip_pen + emit
        curr = jnp.logaddexp(jnp.logaddexp(stay_c, step_c), skip_c)
        # Entry from START at position 0 (any block)
        entry = start + emit[:, 0]
        curr = curr.at[:, 0].set(jnp.logaddexp(curr[:, 0], entry))
        curr = jnp.where(valid, curr, neg)

        local_stay = jnp.logaddexp(-local_pen, stay_lp)
        new_start = start + local_stay
        exit_c = jnp.take_along_axis(prev, lastpos[:, None], axis=1)[:, 0] \
            - local_pen
        new_end = jnp.logaddexp(end + local_stay, exit_c)
        return (curr, new_start, new_end), None

    (final, _, end), _ = scan_fn(
        step, init, jnp.moveaxis(logpost, 1, 0))
    last = jnp.take_along_axis(final, lastpos[:, None], axis=1)[:, 0]
    return jnp.logaddexp(last, end)


def lattice_loss_fn(params, sig, seqstates, model: str, stay_pen=0.0,
                    skip_pen=4.0, local_pen=4.0):
    """-log P(sequence)/nblock averaged over the batch (transducer).

    Rows with no labelled sequence (all -1, e.g. a window over an
    unaligned stretch) are excluded: their forward score is the -1e30
    sentinel, which would blow up the mean (observed loss ~1e27).
    """
    from scrappie_tpu import ops
    from scrappie_tpu.train.trainer import posterior_fn

    with ops.pallas(False):
        lp = posterior_fn(model)(params, sig)    # [B, T, S] log probs
    logp = lattice_forward_batch(lp, seqstates, stay_pen, skip_pen, local_pen)
    valid = (seqstates >= 0).any(axis=1)
    logp = jnp.where(valid, logp, 0.0)
    return -(logp / lp.shape[1]).sum() / jnp.maximum(valid.sum(), 1)


@jax.jit
def crf_lattice_forward_batch(trans, bases, local_pen=4.0):
    """Batched forward score of base sequences under CRF transitions.
    (jitted wrapper; see _crf_lattice_forward_impl)"""
    return _crf_lattice_forward_impl(trans, bases, local_pen, jax.lax.scan)


def _crf_lattice_forward_impl(trans, bases, local_pen, scan_fn):
    """Batched forward score of base sequences under CRF transitions.

    Marginalises over all state paths that emit the sequence — the CRF
    analogue of CTC.  States are {A,C,G,T,-} with energy
    trans[t, to*5 + from] (behavioural spec ref src/decode.c:836-894);
    a path emits base `to` whenever to < 4, so a sequence corresponds
    to the lattice (j bases emitted) x (last state = seq[j-1] | '-').

    trans [B, T, 25] globally-normalised transition energies;
    bases [B, L] base ints 0..3, -1 padding (left-aligned).
    Local START/END states absorb window-edge uncertainty at
    local_pen per block, as in the transducer lattice above.
    Returns [B] log P(sequence | transitions).
    """
    trans = jnp.asarray(trans, jnp.float32)
    bases = jnp.asarray(bases, jnp.int32)
    B, T, _ = trans.shape
    L = bases.shape[1]
    ns = 5
    neg = jnp.float32(-BIG)

    valid = bases >= 0                                  # [B, L]
    safe = jnp.where(valid, bases, 0)
    seqlen = valid.sum(axis=1)                          # [B]

    # Gather indices per lattice position j=0..L (j = #bases emitted).
    # For j >= 1 the emit-state is seq[j-1]; j=0 has no emit-state.
    b_j = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), safe], axis=1)
    b_jm1 = jnp.concatenate([jnp.zeros((B, 2), jnp.int32), safe[:, :-1]],
                            axis=1)
    jvalid = jnp.concatenate(
        [jnp.ones((B, 1), bool), valid], axis=1)        # [B, L+1]
    idx_ee = b_j * ns + b_jm1       # emit seq[j-1] from emit-state seq[j-2]
    idx_es = b_j * ns + 4           # emit seq[j-1] from '-'
    idx_se = 4 * ns + b_j           # stay from emit-state seq[j-1]

    # START is the sole initial state (it subsumes the pre-emission '-'
    # chain via local_stay below), so every path is counted once.
    init = (jnp.full((B, L + 1), -BIG, jnp.float32),    # emit-state alphas
            jnp.full((B, L + 1), -BIG, jnp.float32),    # stay-state alphas
            jnp.zeros((B,), jnp.float32),               # START
            jnp.full((B,), -BIG, jnp.float32))          # END

    def step(carry, tr_t):
        a_e, a_s, start, end = carry
        ee = jnp.take_along_axis(tr_t, idx_ee, axis=1)
        es = jnp.take_along_axis(tr_t, idx_es, axis=1)
        se = jnp.take_along_axis(tr_t, idx_se, axis=1)
        ss = tr_t[:, 4 * ns + 4][:, None]               # '-' -> '-'

        shift_e = jnp.concatenate([jnp.full((B, 1), -BIG), a_e[:, :-1]],
                                  axis=1)
        shift_s = jnp.concatenate([jnp.full((B, 1), -BIG), a_s[:, :-1]],
                                  axis=1)
        new_e = jnp.logaddexp(shift_e + ee, shift_s + es)
        # Entry from START emits the first base (j=1)
        new_e = new_e.at[:, 1].set(
            jnp.logaddexp(new_e[:, 1], start + es[:, 1]))
        new_s = jnp.logaddexp(a_e + se, a_s + ss)
        new_e = jnp.where(jvalid, new_e, neg)
        new_s = jnp.where(jvalid, new_s, neg)

        local_stay = jnp.logaddexp(-local_pen, ss[:, 0])
        last_e = jnp.take_along_axis(a_e, seqlen[:, None], axis=1)[:, 0]
        last_s = jnp.take_along_axis(a_s, seqlen[:, None], axis=1)[:, 0]
        exit_c = jnp.logaddexp(last_e, last_s) - local_pen
        new_start = start + local_stay
        new_end = jnp.logaddexp(end + local_stay, exit_c)
        return (new_e, new_s, new_start, new_end), None

    (a_e, a_s, _, end), _ = scan_fn(
        step, init, jnp.moveaxis(trans, 1, 0))
    last_e = jnp.take_along_axis(a_e, seqlen[:, None], axis=1)[:, 0]
    last_s = jnp.take_along_axis(a_s, seqlen[:, None], axis=1)[:, 0]
    return jnp.logaddexp(jnp.logaddexp(last_e, last_s), end)


@jax.jit
def crf_local_partition(trans, local_pen=4.0):
    """Partition function of the locally-extended CRF lattice.
    (jitted wrapper; see _crf_local_partition_impl)"""
    return _crf_local_partition_impl(trans, local_pen, jax.lax.scan)


def _crf_local_partition_impl(trans, local_pen, scan_fn):
    """Partition function of the locally-extended CRF lattice.

    Sums over ALL base sequences and state paths under exactly the
    START/END-extended transition semantics of
    crf_lattice_forward_batch.  Without this normaliser the local
    states are unsound as a loss: globalnorm makes the sum over plain
    paths 1, but individual transition energies are unbounded, so a
    model can route the expensive blocks through the -local_pen
    free-stay chain and drive log P above 0 (observed in training).
    Returns [B] logZ_local >= crf_lattice_forward_batch(trans, ...).
    """
    trans = jnp.asarray(trans, jnp.float32)
    B, T, _ = trans.shape
    ns = 5

    # State vector: [START, A, C, G, T, '-', END]
    init = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.full((B, ns + 1), -BIG, jnp.float32)], axis=1)

    def step(z, tr_t):
        start, z5, end = z[:, 0], z[:, 1 : 1 + ns], z[:, 1 + ns]
        tmat = tr_t.reshape(B, ns, ns)                  # [B, to, from]
        new5 = jax.nn.logsumexp(tmat + z5[:, None, :], axis=-1)
        # Entry from START emits a base (to < 4) with from='-' energy
        entry = start[:, None] + tmat[:, :4, 4]
        new5 = new5.at[:, :4].set(jnp.logaddexp(new5[:, :4], entry))
        ss = tr_t[:, 4 * ns + 4]
        local_stay = jnp.logaddexp(-local_pen, ss)
        new_start = start + local_stay
        exit_c = jax.nn.logsumexp(z5, axis=-1) - local_pen
        new_end = jnp.logaddexp(end + local_stay, exit_c)
        return jnp.concatenate(
            [new_start[:, None], new5, new_end[:, None]], axis=1), None

    z, _ = scan_fn(step, init, jnp.moveaxis(trans, 1, 0))
    return jnp.logaddexp(jax.nn.logsumexp(z[:, 1 : 1 + ns], axis=-1),
                         z[:, 1 + ns])


def crf_lattice_loss_fn(params, sig, bases, model: str, local_pen=4.0):
    """-log P(sequence)/nblock averaged over the batch (CRF models).

    P is normalised over the locally-extended lattice
    (crf_local_partition), so the loss is bounded below by 0.
    """
    from scrappie_tpu import ops
    from scrappie_tpu.train.trainer import posterior_fn

    with ops.pallas(False):
        trans = posterior_fn(model)(params, sig)        # [B, T, 25]
    logp = crf_lattice_forward_batch(trans, bases, local_pen)
    logz = crf_local_partition(trans, local_pen)
    valid = (bases >= 0).any(axis=1)
    nll = jnp.where(valid, logz - logp, 0.0)
    return (nll / trans.shape[1]).sum() / jnp.maximum(valid.sum(), 1)


def make_lattice_train_step(model: str, optimizer, stay_pen=0.0,
                            skip_pen=4.0, local_pen=4.0):
    """Lattice (alignment-marginal) train step.

    Accepts kmer seqstates [B, L] (-1 padded) for every model kind: CRF
    models reduce them to per-position bases (last base = state % 4,
    realdata._rolling_kmers encoding) and use the CRF-CTC lattice.
    """
    import optax

    from scrappie_tpu.models.specs import RAW_MODELS

    is_crf = model in RAW_MODELS and RAW_MODELS[model].kind == "rnnrf"

    @jax.jit
    def train_step(params, opt_state, sig, seqstates):
        def lfn(p):
            if is_crf:
                bases = jnp.where(seqstates >= 0, seqstates % 4, -1)
                return crf_lattice_loss_fn(p, sig, bases, model, local_pen)
            return lattice_loss_fn(p, sig, seqstates, model, stay_pen,
                                   skip_pen, local_pen)
        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step

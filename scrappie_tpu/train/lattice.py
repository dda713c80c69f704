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
    """
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

    (final, _, end), _ = jax.lax.scan(
        step, init, jnp.moveaxis(logpost, 1, 0))
    last = jnp.take_along_axis(final, lastpos[:, None], axis=1)[:, 0]
    return jnp.logaddexp(last, end)


def lattice_loss_fn(params, sig, seqstates, model: str, stay_pen=0.0,
                    skip_pen=4.0, local_pen=4.0):
    """-log P(sequence)/nblock averaged over the batch (transducer)."""
    from scrappie_tpu import ops
    from scrappie_tpu.train.trainer import posterior_fn

    with ops.pallas(False):
        lp = posterior_fn(model)(params, sig)    # [B, T, S] log probs
    logp = lattice_forward_batch(lp, seqstates, stay_pen, skip_pen, local_pen)
    return -(logp / lp.shape[1]).mean()


def make_lattice_train_step(model: str, optimizer, stay_pen=0.0,
                            skip_pen=4.0, local_pen=4.0):
    import optax

    @jax.jit
    def train_step(params, opt_state, sig, seqstates):
        def lfn(p):
            return lattice_loss_fn(p, sig, seqstates, model, stay_pen,
                                   skip_pen, local_pen)
        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step

"""Transducer Viterbi decoding on device.

Behavioural spec: ref src/decode.c:123-365 (vectorised) and :725-834
(scalar).  The state space is nhistory = 4^k kmer-history states plus a
local start and end state.  Moves per block:

  stay  (pen stay_pen) ..... state -> state, emits the stay symbol
  step  ................... drop oldest base, append one: the 4
                             predecessors of dest d are {r*4^(k-1) + d>>2}
  skip  (pen skip_pen) ..... drop two bases: 16 predecessors
  slip  (pen 2*skip_pen) ... drop three bases: 64 predecessors (optional)
  start/end local states ... enter/exit with local_pen (local basecall)

The max-over-predecessors for step/skip/slip is a reshape + max over the
leading (oldest-base) axis: kmer index = b0*4^(k-1) + ... + b_{k-1}, so
predecessors of d under a step share d's prefix = their suffix.  The
reference's SSE code exploits the same structure with grouped hmax; here
it is a [4, N/4] / [16, N/16] / [64, N/64] reshape-max that XLA maps to
the VPU, scanned over blocks with lax.scan.  Traceback is stored as an
int16 predecessor table and walked by a second (cheap) scan.

Everything is batched: logpost [B, T, nstate] decodes B reads/chunks in
one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG_FLOAT = 1.0e30


@functools.partial(jax.jit, static_argnames=("use_slip",))
def viterbi_transducer_scores(logpost, stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                              use_slip: bool = False):
    """Forward Viterbi pass.

    logpost: [B, T, nstate] log posteriors, stay = last state.
    Returns (final_scores [B, nhist+2], traceback [B, T, nhist+2] int16).
    """
    B, T, nstate = logpost.shape
    nhist = nstate - 1
    START = nhist
    END = nhist + 1

    init = jnp.full((B, nhist + 2), -BIG_FLOAT, dtype=jnp.float32)
    init = init.at[:, START].set(0.0)

    idx4 = jnp.arange(nhist // 4, dtype=jnp.int32)
    idx16 = jnp.arange(nhist // 16, dtype=jnp.int32)
    idx64 = jnp.arange(nhist // 64, dtype=jnp.int32)

    def block(prev, lp):
        # prev [B, nhist+2], lp [B, nstate]
        hist = prev[:, :nhist]
        stay_lp = lp[:, nhist]

        # Stay (traceback -1)
        score = hist + (stay_lp - stay_pen)[:, None]
        tb = jnp.full((B, nhist), -1, dtype=jnp.int16)

        def contend(score, tb, cand, cand_tb):
            upd = cand > score
            return (jnp.where(upd, cand, score),
                    jnp.where(upd, cand_tb.astype(jnp.int16), tb))

        # Step: predecessors of dest share the first k-1 of dest's bases
        # as their last k-1 bases -> group over the oldest-base axis.
        m4 = hist.reshape(B, 4, nhist // 4)
        pred_step = (m4.argmax(axis=1).astype(jnp.int32) * (nhist // 4) + idx4)
        cand = lp[:, :nhist] + jnp.repeat(m4.max(axis=1), 4, axis=-1)
        score, tb = contend(score, tb, cand, jnp.repeat(pred_step, 4, axis=-1))

        # Skip
        m16 = hist.reshape(B, 16, nhist // 16)
        pred_skip = (m16.argmax(axis=1).astype(jnp.int32) * (nhist // 16) + idx16)
        cand = lp[:, :nhist] + jnp.repeat(m16.max(axis=1), 16, axis=-1) - skip_pen
        score, tb = contend(score, tb, cand, jnp.repeat(pred_skip, 16, axis=-1))

        if use_slip:
            m64 = hist.reshape(B, 64, nhist // 64)
            pred_slip = (m64.argmax(axis=1).astype(jnp.int32) * (nhist // 64) + idx64)
            cand = lp[:, :nhist] + jnp.repeat(m64.max(axis=1), 64, axis=-1) - 2.0 * skip_pen
            score, tb = contend(score, tb, cand, jnp.repeat(pred_slip, 64, axis=-1))

        # Exit start state into any history state
        cand = prev[:, START][:, None] + lp[:, :nhist]
        score, tb = contend(score, tb, cand, jnp.full((B, nhist), START, jnp.int32))

        # Remain in start / end state: stay or local penalty
        local_stay = jnp.maximum(-local_pen, stay_lp - stay_pen)
        start_score = prev[:, START] + local_stay
        end_score = prev[:, END] + local_stay
        end_tb = jnp.full((B,), END, dtype=jnp.int16)
        # Enter end state from the best history state
        enter = hist.max(axis=1) - local_pen
        enter_tb = hist.argmax(axis=1).astype(jnp.int16)
        better = enter > end_score
        end_score = jnp.where(better, enter, end_score)
        end_tb = jnp.where(better, enter_tb, end_tb)

        new = jnp.concatenate([score, start_score[:, None], end_score[:, None]], axis=1)
        new_tb = jnp.concatenate(
            [tb, jnp.full((B, 1), START, jnp.int16), end_tb[:, None]], axis=1
        )
        return new, new_tb

    final, tbs = jax.lax.scan(block, init, jnp.moveaxis(logpost, 1, 0))
    return final, jnp.moveaxis(tbs, 0, 1)


@jax.jit
def viterbi_local_backtrace(final, traceback):
    """Walk the traceback (ref viterbi_local_backtrace, src/decode.c:58-98).

    Returns (logscore [B], path [B, T+1] int32) with stay = -1; the
    leading run of start states / trailing run of end states are
    transcoded to -1.
    """
    B, T, nst2 = traceback.shape
    nhist = nst2 - 2
    START, END = nhist, nhist + 1

    last = jnp.argmax(final, axis=1).astype(jnp.int32)
    logscore = jnp.take_along_axis(final, last[:, None], axis=1)[:, 0]

    def back(last, tb_t):
        state = jnp.take_along_axis(tb_t, last[:, None].astype(jnp.int32), axis=1)[:, 0]
        emit = jnp.where(state >= 0, last, -1)
        new_last = jnp.where(state >= 0, state.astype(jnp.int32), last)
        return new_last, emit

    first, emits = jax.lax.scan(back, last, jnp.moveaxis(traceback, 1, 0), reverse=True)
    path = jnp.concatenate([first[:, None], jnp.moveaxis(emits, 0, 1)], axis=1)

    # Transcode leading start / trailing end runs to stay (-1).
    is_start = path == START
    lead = jnp.cumprod(is_start, axis=1).astype(bool)  # prefix of start states
    is_end = path == END
    trail = jnp.cumprod(is_end[:, ::-1], axis=1)[:, ::-1].astype(bool)
    path = jnp.where(lead | trail, -1, path)
    return logscore, path


def viterbi_decode_batch(logpost, stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                         use_slip: bool = False):
    """Forward + backtrace for [B, T, nstate] -> (score [B], path [B, T+1]).

    Dispatches to the Pallas kernels on TPU (ops/viterbi.py), otherwise
    the lax.scan programs above.  Results are identical (same contend
    order and first-max tie-breaking).
    """
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        from scrappie_tpu.ops.viterbi import (
            viterbi_backtrace_tm,
            viterbi_scores_tm,
        )

        lp_tm = jnp.moveaxis(logpost, 1, 0)
        final, tb = viterbi_scores_tm(lp_tm, stay_pen, skip_pen, local_pen,
                                      use_slip,
                                      fast_expand=ops.fast_expand_enabled())
        return viterbi_backtrace_tm(final, tb)
    final, tb = viterbi_transducer_scores(logpost, stay_pen, skip_pen,
                                          local_pen, use_slip)
    return viterbi_local_backtrace(final, tb)


def decode_transducer(logpost, stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                      use_slip=False):
    """Full transducer decode: (score [B], path [B, T+1]).

    Accepts [T, nstate] or [B, T, nstate]; mirrors ref decode_transducer
    (src/decode.c:123-365) + viterbi_local_backtrace.
    """
    squeeze = logpost.ndim == 2
    lp = jnp.asarray(logpost, dtype=jnp.float32)
    if squeeze:
        lp = lp[None]
    score, path = viterbi_decode_batch(lp, stay_pen, skip_pen, local_pen,
                                       use_slip)
    if squeeze:
        return float(score[0]), np.asarray(path[0])
    return np.asarray(score), np.asarray(path)


def argmax_decoder(logpost):
    """Per-block argmax decode (ref src/decode.c:100-121).

    Returns (score, path [T]) with stay encoded as -1.
    """
    lp = np.asarray(logpost)
    nstate = lp.shape[-1]
    imax = lp.argmax(axis=-1)
    score = np.take_along_axis(lp, imax[..., None], axis=-1).sum(axis=(-1, -2))
    path = np.where(imax == nstate - 1, -1, imax)
    return score, path

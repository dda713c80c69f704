"""Pallas TPU kernel for posterior-to-sequence mapping (seqmappy path).

Behavioural spec: ref map_to_sequence_viterbi/forward,
src/decode.c:1420-1636 and decode/mapping.py (_map_dense).  Per
posterior block the DP updates a [seqlen + START + END] score vector
with stay/step/skip moves and local entry/exit; emissions are the
posterior probability of each reference position's kmer state.

The per-block kmer emission lookup lp[t, seqstates] is a lane gather,
which Mosaic lacks; it becomes an exact one-hot MXU matmul
lp_t @ K with K[s, pos] = 1 iff seqstates[pos] == s (the same 3-way
bf16-split exact-copy trick as ops/viterbi._expand).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrappie_tpu.ops import LANE, interpret_mode
from scrappie_tpu.ops import round_up as _round_up
from scrappie_tpu.ops.dtw import _shift_right
from scrappie_tpu.ops.viterbi import _expand

BIG = 1.0e30


def _seqmap_kernel(n_ref, staypen_ref, skippen_ref, localpen_ref, lp_ref,
                   K_ref, fin_ref, tb_ref, v_sc, *, seqlen, CT, viterbi, nst):
    W = v_sc.shape[1]
    START, END = seqlen, seqlen + 1
    t = pl.program_id(0)
    T = pl.num_programs(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lanesf = lanes.astype(jnp.float32)

    @pl.when(t == 0)
    def _():
        v_sc[:] = jnp.where(lanes == START, 0.0, -BIG)

    n = n_ref[0, 0]
    stay_pen = staypen_ref[0, 0]
    skip_pen = skippen_ref[0, 0]
    local_pen = localpen_ref[0, 0]
    K = K_ref[:]
    prev = v_sc[:]

    for i in range(CT):
        lp = lp_ref[i : i + 1]                        # [1, NSP]
        stay_lp = jnp.max(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1) == nst - 1,
            lp, -BIG), axis=1, keepdims=True)
        emit = _expand(lp, K)                          # [1, W] exact gather
        sstart = jnp.max(jnp.where(lanes == START, prev, -BIG),
                         axis=1, keepdims=True)
        send = jnp.max(jnp.where(lanes == END, prev, -BIG),
                       axis=1, keepdims=True)
        slast = jnp.max(jnp.where(lanes == seqlen - 1, prev, -BIG),
                        axis=1, keepdims=True)

        curr = prev - stay_pen + stay_lp               # stay
        tb = lanesf

        def contend(curr, tb, cand, ctb):
            if viterbi:
                upd = cand > curr
                return jnp.where(upd, cand, curr), jnp.where(upd, ctb, tb)
            return jnp.logaddexp(curr, cand), tb

        cand = _shift_right(prev, 1, fill=-BIG) + emit          # step
        curr, tb = contend(curr, tb, cand, lanesf - 1.0)
        cand = _shift_right(prev, 2, fill=-BIG) - skip_pen + emit  # skip
        curr, tb = contend(curr, tb, cand, lanesf - 2.0)
        # Enter sequence at position 0 from START (lane 0 only — a
        # masked full-width contend could still beat doubly-degenerate
        # scores below -BIG, unlike the scan's single-lane update).
        entry = sstart + emit
        if viterbi:
            upd0 = (lanes == 0) & (entry > curr)
            curr = jnp.where(upd0, entry, curr)
            tb = jnp.where(upd0, float(START), tb)
        else:
            curr = jnp.where(lanes == 0, jnp.logaddexp(curr, entry), curr)

        # Local states (overwrite the START/END lanes completely).
        if viterbi:
            local_stay = jnp.maximum(-local_pen, stay_lp)
        else:
            local_stay = jnp.logaddexp(-local_pen, stay_lp)
        start_new = sstart + local_stay
        end_new = send + local_stay
        end_tb = jnp.full((1, 1), float(END))
        exit_c = slast - local_pen
        if viterbi:
            updl = exit_c > end_new
            end_tb = jnp.where(updl, float(seqlen - 1), end_tb)
            end_new = jnp.where(updl, exit_c, end_new)
        else:
            end_new = jnp.logaddexp(end_new, exit_c)

        curr = jnp.where(lanes == START, start_new, curr)
        curr = jnp.where(lanes == END, end_new, curr)
        tb = jnp.where(lanes == START, float(START), tb)
        tb = jnp.where(lanes == END, end_tb, tb)
        curr = jnp.where(lanes < END + 1, curr, -BIG)  # keep pads dead

        valid = t * CT + i < n   # trailing time pad: state unchanged
        prev = jnp.where(valid, curr, prev)
        tb_ref[i] = tb.astype(jnp.int32)[0]

    v_sc[:] = prev

    @pl.when(t == T - 1)
    def _():
        fin_ref[:] = v_sc[:]


@functools.partial(jax.jit, static_argnames=("viterbi", "interpret", "ct"))
def map_to_sequence_tm(logpost, seqstates, stay_pen=0.0, skip_pen=0.0,
                       local_pen=4.0, viterbi: bool = True,
                       interpret: bool | None = None, ct: int = 8):
    """Pallas posterior-to-sequence DP.

    logpost [T, nst] log posterior; seqstates [seqlen] int kmer per
    reference position.  Returns (final [seqlen+2], tb [T, seqlen+2]
    int32), matching decode/mapping._map_dense.
    """
    if interpret is None:
        interpret = interpret_mode()
    T, nst = logpost.shape
    seqlen = seqstates.shape[0]
    W = _round_up(seqlen + 2, LANE)
    NSP = _round_up(nst, LANE)

    CT = min(ct, max(T, 1))
    tpad = (-T) % CT
    # Trailing time pad is masked out of the state update in-kernel
    # (the sample count travels as an SMEM scalar).  -inf log posteriors
    # are clamped to -BIG: the emission gather is a one-hot matmul, and
    # an infinite operand would poison every output via 0 * inf = NaN.
    lp = jnp.pad(jnp.maximum(jnp.asarray(logpost, jnp.float32), -BIG),
                 ((0, tpad), (0, NSP - nst)), constant_values=-BIG)
    Tp = T + tpad

    K = (jnp.asarray(seqstates)[None, :]
         == jnp.arange(NSP)[:, None]).astype(jnp.float32)
    K = jnp.pad(K, ((0, 0), (0, W - seqlen)))

    scal = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 1)
    smem = lambda: pl.BlockSpec((1, 1), lambda t: (0, 0),
                                memory_space=pltpu.SMEM)
    kern = functools.partial(_seqmap_kernel, seqlen=seqlen, CT=CT,
                             viterbi=viterbi, nst=nst)
    fin, tb = pl.pallas_call(
        kern,
        grid=(Tp // CT,),
        in_specs=[
            smem(), smem(), smem(), smem(),
            pl.BlockSpec((CT, NSP), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSP, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, W), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((Tp, W), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(T, jnp.int32).reshape(1, 1), scal(stay_pen),
      scal(skip_pen), scal(local_pen), lp, K)
    return fin[0, : seqlen + 2], tb[:T, : seqlen + 2]

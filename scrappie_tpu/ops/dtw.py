"""Pallas TPU kernel for signal-to-squiggle alignment (mappy path).

Behavioural spec: ref squiggle_match_viterbi/forward, src/decode.c:1035-1401
and decode/dtw.py (the lax.scan program).  Per raw sample the DP updates
a forward-state vector [start | npos positions | end] and a back-state
vector [npos] with stay/step/skip/jump/back moves and floored Laplace
emissions; the per-sample sequential scan is the hot loop (a read is
10^5 samples).

Kernel design notes:
  * f and b live in separate lane-padded VMEM scratch vectors — the
    combined [nstate] vector of the scan program would need slices at
    the unaligned nfstate offset.
  * shifted candidates (step/skip/from-back) are pltpu.roll + lane
    masks; the emission location/scale vectors are pre-shifted onto the
    f-lane grid outside the kernel so emissions are pure elementwise.
  * CT samples are processed per grid step; trailing pad samples are
    neutralised with a validity mask on the state update (the sample
    count is an SMEM scalar).
  * the traceback is streamed as int32 (state ids reach 2*npos+2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrappie_tpu.ops import LANE, interpret_mode
from scrappie_tpu.ops import round_up as _round_up

LARGE = 1.0e30
LOG_HALF = float(np.log(0.5))


def _shift_right(v, k, fill=-LARGE):
    lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lanes < k, fill, pltpu.roll(v, k, axis=1))


def _shift_left(v, k, width, fill=-LARGE):
    W = v.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    rolled = pltpu.roll(v, W - k, axis=1)
    return jnp.where(lanes >= width - k, fill, rolled)


def _first_argmax(v, m, width):
    """First lane index with v == m among lanes < width."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    cand = jnp.where((v == m) & (lanes < width), lanes, v.shape[1])
    return jnp.min(cand, axis=1, keepdims=True)


def _dtw_kernel(n_ref, pb_ref, lpen_ref, spen_ref, mins_ref, sig_ref,
                mp_ref, sp_ref, sj_ref, ej_ref, locf_ref, sclf_ref,
                lsclf_ref, locb_ref, sclb_ref, lsclb_ref,
                ff_ref, fb_ref, tbf_ref, tbb_ref, f_sc, b_sc,
                *, nfstate, npos, CT, viterbi):
    W = f_sc.shape[1]
    t = pl.program_id(0)
    T = pl.num_programs(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lanesf = lanes.astype(jnp.float32)

    @pl.when(t == 0)
    def _():
        f_sc[:] = jnp.where(lanes == 0, 0.0, -LARGE)
        b_sc[:] = jnp.full((1, W), -LARGE, jnp.float32)

    n = n_ref[0, 0]
    prob_back = pb_ref[0, 0]
    local_pen = lpen_ref[0, 0]
    skip_pen = spen_ref[0, 0]
    minscore = mins_ref[0, 0]
    # log(0) = -inf makes back states unreachable, exactly like the
    # lax.scan reference with prob_back=0 (no products involve it, so
    # no inf*0 hazard).
    move_back_pen = jnp.log(prob_back)

    mp = mp_ref[:]          # move_pen on f lanes
    sp = sp_ref[:]          # stay_pen on f lanes
    sj = sj_ref[:]          # start-jump cands (additive to f[0])
    ej = ej_ref[:]          # end-jump additive vector
    f = f_sc[:]
    b = b_sc[:]

    def combine(cur, cand):
        if viterbi:
            return jnp.maximum(cur, cand)
        return jnp.logaddexp(cur, cand)

    for i in range(CT):
        x = sig_ref[i, 0]
        s_global = t * CT + i
        valid = s_global < n

        # ---- forward states
        cf = f + sp                                        # stay
        tbf = lanesf
        def contend(cf, tbf, cand, ctb):
            if viterbi:
                upd = cand > cf
                return jnp.where(upd, cand, cf), jnp.where(upd, ctb, tbf)
            return jnp.logaddexp(cf, cand), tbf
        cand = _shift_right(f + mp, 1)                     # step
        cf, tbf = contend(cf, tbf, cand, lanesf - 1.0)
        cand = _shift_right(f + mp - skip_pen, 2)          # skip
        cf, tbf = contend(cf, tbf, cand, lanesf - 2.0)
        f0 = jnp.max(jnp.where(lanes == 0, f, -LARGE), axis=1, keepdims=True)
        cf, tbf = contend(cf, tbf, f0 + sj, jnp.zeros((1, W), jnp.float32))
        # sequence -> end jump (single destination lane nfstate-1)
        ev = f + ej
        if viterbi:
            endc = jnp.max(ev, axis=1, keepdims=True)
            esrc = _first_argmax(ev, endc, nfstate).astype(jnp.float32)
            is_end = lanes == nfstate - 1
            upd = is_end & (endc > cf)
            cf = jnp.where(upd, endc, cf)
            tbf = jnp.where(upd, esrc, tbf)
        else:
            endc = jax.nn.logsumexp(jnp.where(
                (lanes < nfstate), ev, -LARGE), axis=1, keepdims=True)
            cf = jnp.where(lanes == nfstate - 1, jnp.logaddexp(cf, endc), cf)
        # from back state b[st-2] into fwd st (st in 2..npos)
        fromb = _shift_right(b + LOG_HALF, 2)
        fromb = jnp.where((lanes >= 2) & (lanes <= npos), fromb, -LARGE)
        cf, tbf = contend(cf, tbf, fromb, lanesf - 2.0 + float(nfstate))

        # ---- back states (lane j <-> position j+1, global id nfstate+j)
        cb = b + LOG_HALF                                  # stay
        tbb = lanesf + float(nfstate)
        cand = _shift_left(f, 2, nfstate)                  # f[j+2] -> back j
        cand = jnp.where(lanes < npos - 1, cand + move_back_pen, -LARGE)
        if viterbi:
            updb = cand > cb
            cb = jnp.where(updb, cand, cb)
            tbb = jnp.where(updb, lanesf + 2.0, tbb)
        else:
            cb = jnp.logaddexp(cb, cand)

        # ---- emissions (pre-shifted location/scale grids)
        emf = jnp.maximum(-minscore,
                          -jnp.abs(x - locf_ref[:]) / sclf_ref[:]
                          - lsclf_ref[:] - jnp.log(2.0))
        cf = jnp.where((lanes >= 1) & (lanes <= npos), cf + emf, cf)
        emb = jnp.maximum(-minscore,
                          -jnp.abs(x - locb_ref[:]) / sclb_ref[:]
                          - lsclb_ref[:] - jnp.log(2.0))
        cb = jnp.where(lanes < npos, cb + emb, cb)
        cf = jnp.where((lanes == 0) | (lanes == nfstate - 1),
                       cf - local_pen, cf)

        f = jnp.where(valid, cf, f)
        b = jnp.where(valid, cb, b)
        tbf_ref[i] = tbf.astype(jnp.int32)[0]
        tbb_ref[i] = tbb.astype(jnp.int32)[0]

    f_sc[:] = f
    b_sc[:] = b

    @pl.when(t == T - 1)
    def _():
        ff_ref[:] = f_sc[:]
        fb_ref[:] = b_sc[:]


@functools.partial(jax.jit, static_argnames=("viterbi", "interpret", "ct"))
def squiggle_match_tm(sig, locs, scales, logscales, move_pen, stay_pen,
                      prob_back, local_pen, skip_pen, minscore,
                      viterbi: bool = True, interpret: bool | None = None,
                      ct: int = 8):
    """Pallas squiggle-match DP.

    sig [T]; locs/scales/logscales [npos]; move_pen/stay_pen [nfstate].
    Returns (final [nstate], tb [T, nstate] int32) with the same state
    numbering as decode/dtw.py (f states, then back states).
    """
    if interpret is None:
        interpret = interpret_mode()
    T = sig.shape[0]
    npos = locs.shape[0]
    nfstate = npos + 2
    W = _round_up(nfstate, LANE)

    CT = min(ct, max(T, 1))
    Tp = _round_up(T, CT)
    sigp = jnp.pad(jnp.asarray(sig, jnp.float32), (0, Tp - T))[:, None]

    padW = lambda v, fill: jnp.pad(jnp.asarray(v, jnp.float32),
                                   (0, W - v.shape[0]),
                                   constant_values=fill)[None]
    # f-lane grids: position p sits at lane p+1
    locf = padW(jnp.pad(locs, (1, 1)), 0.0)
    sclf = padW(jnp.pad(scales, (1, 1), constant_values=1.0), 1.0)
    lsclf = padW(jnp.pad(logscales, (1, 1)), 0.0)
    # b-lane grids: position p at lane p
    locb = padW(locs, 0.0)
    sclb = padW(scales, 1.0)
    lsclb = padW(logscales, 0.0)
    mp = padW(move_pen, -LARGE)
    sp = padW(stay_pen, -LARGE)

    # start-jump cands (additive to f[0]); end-jump additive vector
    move_pen = jnp.asarray(move_pen, jnp.float32)
    start_jump = jnp.full((nfstate,), -LARGE, jnp.float32)
    end_jump = jnp.full((nfstate,), -LARGE, jnp.float32)
    if npos > 1:
        start_jump = start_jump.at[2 : nfstate - 1].set(
            move_pen[0] - local_pen * jnp.arange(1, npos, dtype=jnp.float32))
        end_jump = end_jump.at[1:npos].set(
            move_pen[1:npos] - local_pen
            * (npos - 1 - jnp.arange(npos - 1, dtype=jnp.float32)))
    sj = padW(start_jump, -LARGE)
    ej = padW(end_jump, -LARGE)

    scal = lambda v, dt=jnp.float32: jnp.asarray(v, dt).reshape(1, 1)
    smem = lambda dt=jnp.float32: pl.BlockSpec((1, 1), lambda t: (0, 0),
                                               memory_space=pltpu.SMEM)
    const = lambda: pl.BlockSpec((1, W), lambda t: (0, 0),
                                 memory_space=pltpu.VMEM)
    kern = functools.partial(_dtw_kernel, nfstate=nfstate, npos=npos,
                             CT=CT, viterbi=viterbi)
    ff, fb, tbf, tbb = pl.pallas_call(
        kern,
        grid=(Tp // CT,),
        in_specs=[
            smem(jnp.int32), smem(), smem(), smem(), smem(),
            pl.BlockSpec((CT, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            const(), const(), const(), const(),
            const(), const(), const(), const(), const(), const(),
        ],
        out_specs=(
            pl.BlockSpec((1, W), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, W), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, W), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((Tp, W), jnp.int32),
            jax.ShapeDtypeStruct((Tp, W), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.float32),
                        pltpu.VMEM((1, W), jnp.float32)],
        interpret=interpret,
    )(scal(T, jnp.int32), scal(prob_back), scal(local_pen),
      scal(skip_pen), scal(minscore), sigp, mp, sp, sj, ej,
      locf, sclf, lsclf, locb, sclb, lsclb)

    final = jnp.concatenate([ff[0, :nfstate], fb[0, :npos]])
    tb = jnp.concatenate([tbf[:T, :nfstate], tbb[:T, :npos]], axis=1)
    return final, tb

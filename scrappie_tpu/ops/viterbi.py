"""Pallas TPU kernels for transducer Viterbi decode.

Semantics match decode/transducer.py exactly (behavioural spec: ref
src/decode.c:123-365 vectorised, :725-834 scalar, :58-98 backtrace),
including tie-breaking: candidate moves contend in the same order with
strict `>`, and within-group argmaxes are first-max (implemented as a
reversed equality chain, identical to jnp.argmax on the group axis).

Forward kernel
  grid (batch_tiles, T); per step a time-major log-posterior block
  streams HBM->VMEM (double-buffered by the grid pipeline), the DP
  vector lives in VMEM scratch (a constant-index output block would be
  flushed to HBM every grid step — measured 4x slowdown — so finals are
  written once at the last step), and int16 traceback blocks are
  written per step.  The grouped max over 4
  (step) / 16 (skip) / 64 (slip) predecessors is a [B, n, nhist/n]
  reshape + max over the group axis (kmer index = b0*4^(k-1) + ... +
  b_{k-1}, so predecessors of dest d form the lane set {r*q + d>>2b}).

  Mosaic's vector layouts require every lane width in the kernel to be
  128-aligned, so the nhist+1-state posterior is passed as two aligned
  inputs (history lanes | stay lane) and the start/end local states are
  carried in a separate 2-lane block rather than as trailing lanes.

Backtrace kernel
  Replays the traceback blocks in reverse grid order; the per-row
  dynamic pick tb[b, cur[b]] is a one-hot select + lane sum (TPU has
  no fast lane gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrappie_tpu.ops import interpret_mode
from scrappie_tpu.ops import pick_batch_tile as _pick_batch_tile

BIG = 1.0e30


def _dot(m, E, precision):
    return jax.lax.dot_general(m, E, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _expand(m, E, fast: bool = False):
    """Interleaved lane expansion out[:, d] = m[:, d // n] as exact MXU
    matmuls with the one-hot matrix E [q, nhist] (single 1.0 per column).

    Mosaic has no interleaving lane reshape/gather, so the MXU performs
    the permutation.  A one-hot matmul copies each f32 bit-exactly iff
    every product and the sum are exact; a single bf16 pass is not, so
    the operand is split into three disjoint-significand bf16 chunks
    (8+8+8 = 24 bits), each expanded in a one-pass bf16 matmul, and the
    partial sums recombine exactly (disjoint bit ranges).  This is 2x
    cheaper than Mosaic's HIGHEST (6-pass) lowering.

    fast=True (SCRAPPIE_TPU_FAST_EXPAND, experimental): a single 2-chunk
    (hi+mid, 16 significand bits) expansion — 1/3 less expansion work at
    ~8e-6 relative DP error per copy.  This GIVES UP the bit-exact
    decode-parity guarantee (paths can drift from the lax.scan programs
    over long chunks); it exists to measure the roofline headroom the
    exactness costs (BASELINE.md round-3 roofline: 67% of the bf16
    path's MXU budget is exact expansion)."""
    hi = m.astype(jnp.bfloat16).astype(jnp.float32)
    # +-inf survives through hi alone; the residual would be inf-inf=NaN.
    rem = jnp.where(jnp.isfinite(m), m - hi, 0.0)
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    d = jax.lax.Precision.DEFAULT
    if fast:
        return _dot(hi, E, d) + _dot(mid, E, d)
    lo = rem - mid
    return (_dot(hi, E, d) + _dot(mid, E, d)) + _dot(lo, E, d)


def _expand_smallint(r, E):
    """Exact expansion of small non-negative integers (< 256, exactly
    representable in one bf16 pass)."""
    return _dot(r, E, jax.lax.Precision.DEFAULT)


def _dp_step(lph, stay_lp_raw, stay_pen, skip_pen, local_pen,
             hist_ref, loc_ref, tbh_ref, tbl_ref, e4, e16, e64,
             *, nhist, use_slip, tb_slot=0, fast_expand=False):
    """One Viterbi block update on VMEM-resident values.

    lph [Bt, nhist] history-state log posteriors; stay_lp_raw [Bt, 1]
    stay log posterior (before the stay penalty).  Updates the scratch
    carries and writes the int16 traceback blocks.
    """
    Bt = lph.shape[0]
    START, END = nhist, nhist + 1
    hist = hist_ref[:]                        # [Bt, nhist]
    start_prev = loc_ref[:, 0:1]              # [Bt, 1]
    end_prev = loc_ref[:, 1:2]
    stay_lp = stay_lp_raw - stay_pen
    lanesh = jax.lax.broadcasted_iota(jnp.int32, (Bt, nhist), 1)

    # Stay (traceback -1).  Traceback values are carried as f32 (every
    # state index is < 2^24 so this is exact) to avoid int/float vector
    # relayouts; they are stored as int16.
    score = hist + stay_lp
    tb = jnp.full((Bt, nhist), -1.0, jnp.float32)

    def contend(score, tb, cand, cand_tb):
        upd = cand > score
        return jnp.where(upd, cand, score), jnp.where(upd, cand_tb, tb)

    def move(score, tb, n, pen, E):
        # Predecessor slices are contiguous on the lane axis (Mosaic has
        # no (B, n, q) reshape for q < 128, so slice chains throughout).
        q = nhist // n
        g = [hist[:, i * q : (i + 1) * q] for i in range(n)]
        m = g[0]
        for s in g[1:]:
            m = jnp.maximum(m, s)
        r = jnp.zeros((Bt, q), jnp.float32)
        for i in range(n - 1, -1, -1):        # reversed => first max wins
            r = jnp.where(g[i] == m, float(i), r)
        cand = lph + _expand(m, E, fast=fast_expand) - pen
        # pred = r*q + group(d), group(d) = d // n = lanes >> log2(n)
        ptb = (_expand_smallint(r, E) * float(q)
               + (lanesh // n).astype(jnp.float32))
        return contend(score, tb, cand, ptb)

    score, tb = move(score, tb, 4, 0.0, e4)                 # step
    score, tb = move(score, tb, 16, skip_pen, e16)          # skip
    if use_slip:
        score, tb = move(score, tb, 64, 2.0 * skip_pen, e64)  # slip

    # Exit the local start state into any history state.
    score, tb = contend(score, tb, start_prev + lph,
                        jnp.full((Bt, nhist), float(START), jnp.float32))

    # Remain in start / end local states: stay or local penalty.
    local_stay = jnp.maximum(-local_pen, stay_lp)
    start_score = start_prev + local_stay
    end_score = end_prev + local_stay
    # Enter the end state from the best history state.
    m = jnp.max(hist, axis=1, keepdims=True)
    entb = jnp.min(jnp.where(hist == m, lanesh, nhist), axis=1, keepdims=True)
    enter = m - local_pen
    better = enter > end_score
    end_score = jnp.where(better, enter, end_score)
    end_tb = jnp.where(better, entb.astype(jnp.float32), float(END))

    hist_ref[:] = score
    loc_ref[:] = jnp.concatenate([start_score, end_score], axis=1)
    tbh_ref[tb_slot] = tb.astype(jnp.int16)
    tbl_ref[tb_slot] = jnp.concatenate(
        [jnp.full((Bt, 1), float(START), jnp.float32), end_tb], axis=1
    ).astype(jnp.int16)


def _dp_init(hist_ref, loc_ref):
    Bt = hist_ref.shape[0]
    hist_ref[:] = jnp.full(hist_ref.shape, -BIG, jnp.float32)
    loc_ref[:] = jnp.concatenate(
        [jnp.zeros((Bt, 1), jnp.float32),            # start
         jnp.full((Bt, 1), -BIG, jnp.float32)], axis=1)  # end


def _fwd_kernel(stay_ref, skip_ref, local_ref, lph_ref, lps_ref, e4_ref,
                e16_ref, e64_ref, fhist_ref, floc_ref, tbh_ref, tbl_ref,
                hist_ref, loc_ref, *, nhist, use_slip, fast_expand=False):
    # hist_ref/loc_ref are VMEM *scratch*: a constant-index output block
    # would be flushed to HBM every grid step when another output
    # streams (measured 4x slowdown), so the carry lives in scratch and
    # is copied to the final outputs at the last step only.
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        _dp_init(hist_ref, loc_ref)

    _dp_step(lph_ref[0], lps_ref[0], stay_ref[0, 0], skip_ref[0, 0],
             local_ref[0, 0], hist_ref, loc_ref, tbh_ref, tbl_ref,
             e4_ref[:], e16_ref[:], e64_ref[:], nhist=nhist,
             use_slip=use_slip, fast_expand=fast_expand)

    @pl.when(t == T - 1)
    def _():
        fhist_ref[:] = hist_ref[:]
        floc_ref[:] = loc_ref[:]


def _onehot_expander(nhist: int, n: int):
    """E [nhist//n, nhist] with E[g, d] = 1 iff d // n == g."""
    q = nhist // n
    d = jnp.arange(nhist)
    return (jnp.arange(q)[:, None] == (d // n)[None, :]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("use_slip", "interpret",
                                              "fast_expand"))
def viterbi_scores_tm(lp_tm, stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                      use_slip: bool = False, interpret: bool | None = None,
                      fast_expand: bool = False):
    """Forward Viterbi over time-major log posteriors [T, B, nstate].

    Returns (final [B, nhist+2] f32, traceback [T, B, nhist+2] int16);
    identical to decode.transducer.viterbi_transducer_scores modulo the
    [B, T] <-> [T, B] layout.
    """
    if interpret is None:
        interpret = interpret_mode()
    T, B, nstate = lp_tm.shape
    nhist = nstate - 1
    group = 64 if use_slip else 16
    if nhist % group:
        raise ValueError(f"nhist={nhist} not divisible by {group}")

    pad = (-B) % 8
    # -inf log posteriors would poison the one-hot expansion matmuls
    # (0 * inf = NaN in the accumulation); clamp to the finite -BIG.
    lp_tm = jnp.maximum(lp_tm, -BIG)
    if pad:
        lp_tm = jnp.pad(lp_tm, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad
    Bt = _pick_batch_tile(Bp, limit=128)
    nbt = Bp // Bt

    # Aligned split: history lanes | stay lane (see module docstring).
    lph = lp_tm[:, :, :nhist]
    lps = lp_tm[:, :, nhist:]

    kern = functools.partial(_fwd_kernel, nhist=nhist, use_slip=use_slip,
                             fast_expand=fast_expand)
    scal = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 1)
    smem = lambda: pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                                memory_space=pltpu.SMEM)
    e4 = _onehot_expander(nhist, 4)
    e16 = _onehot_expander(nhist, 16)
    e64 = _onehot_expander(nhist, 64) if use_slip else jnp.zeros((1, nhist),
                                                                 jnp.float32)
    const = lambda shape: pl.BlockSpec(shape, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    fhist, floc, tbh, tbl = pl.pallas_call(
        kern,
        grid=(nbt, T),
        in_specs=[
            smem(), smem(), smem(),
            pl.BlockSpec((1, Bt, nhist), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, 1), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            const(e4.shape), const(e16.shape), const(e64.shape),
        ],
        out_specs=(
            pl.BlockSpec((Bt, nhist), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 2), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, nhist), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt, 2), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, nhist), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 2), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, nhist), jnp.int16),
            jax.ShapeDtypeStruct((T, Bp, 2), jnp.int16),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, nhist), jnp.float32),
            pltpu.VMEM((Bt, 2), jnp.float32),
        ],
        interpret=interpret,
    )(scal(stay_pen), scal(skip_pen), scal(local_pen), lph, lps, e4, e16, e64)
    final = jnp.concatenate([fhist, floc], axis=1)[:B]
    tb = jnp.concatenate([tbh, tbl], axis=2)[:, :B]
    return final, tb


def _bt_kernel(last_ref, tbh_ref, tbl_ref, first_ref, emit_ref, cur_ref,
               *, nhist, CT):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        cur_ref[:] = last_ref[:]

    cur = cur_ref[:]                            # [Bt, 1] int32 (scratch)
    for i in range(CT - 1, -1, -1):             # walk the block backwards
        tbh = tbh_ref[i].astype(jnp.int32)      # [Bt, nhist]
        tbl = tbl_ref[i].astype(jnp.int32)      # [Bt, 2]
        lanesh = jax.lax.broadcasted_iota(jnp.int32, tbh.shape, 1)
        lanesl = jax.lax.broadcasted_iota(jnp.int32, tbl.shape, 1) + nhist
        state = (jnp.sum(jnp.where(lanesh == cur, tbh, 0), axis=1,
                         keepdims=True)
                 + jnp.sum(jnp.where(lanesl == cur, tbl, 0), axis=1,
                           keepdims=True))
        emit_ref[i] = jnp.where(state >= 0, cur, -1)
        cur = jnp.where(state >= 0, state, cur)
    cur_ref[:] = cur

    @pl.when(t == T - 1)
    def _():
        first_ref[:] = cur_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "ct"))
def viterbi_backtrace_tm(final, tb_tm, interpret: bool | None = None,
                         ct: int = 8):
    """Walk the time-major traceback (ref src/decode.c:58-98).

    final [B, nhist+2], tb_tm [T, B, nhist+2] int16 ->
    (logscore [B], path [B, T+1] int32, stay = -1, leading start /
    trailing end runs transcoded to -1).
    """
    if interpret is None:
        interpret = interpret_mode()
    T, B, nst2 = tb_tm.shape
    nhist = nst2 - 2
    START, END = nhist, nhist + 1

    last = jnp.argmax(final, axis=1).astype(jnp.int32)
    logscore = jnp.take_along_axis(final, last[:, None], axis=1)[:, 0]

    pad = (-B) % 8
    if pad:
        tb_tm = jnp.pad(tb_tm, ((0, 0), (0, pad), (0, 0)))
        last = jnp.pad(last, (0, pad))
    Bp = B + pad
    Bt = _pick_batch_tile(Bp, limit=128)
    nbt = Bp // Bt

    # Walking starts at time T-1; pad the FRONT so pad rows (processed
    # last) land before t=0 and are sliced off.  Pad tb is "stay"
    # everywhere (-1), which leaves the carry state untouched.
    CT = min(ct, T)
    tpad = (-T) % CT
    if tpad:
        tb_tm = jnp.pad(tb_tm, ((tpad, 0), (0, 0), (0, 0)),
                        constant_values=-1)
    Tp = T + tpad
    nt = Tp // CT

    tbh = tb_tm[:, :, :nhist]
    tbl = tb_tm[:, :, nhist:]

    first, emits = pl.pallas_call(
        functools.partial(_bt_kernel, nhist=nhist, CT=CT),
        grid=(nbt, nt),
        in_specs=[
            pl.BlockSpec((Bt, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, nhist), lambda b, t: (nt - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, 2), lambda b, t: (nt - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bt, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, 1), lambda b, t: (nt - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Tp, Bp, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((Bt, 1), jnp.int32)],
        interpret=interpret,
    )(last[:, None], tbh, tbl)
    if tpad:
        emits = emits[tpad:]

    path = jnp.concatenate([first[:B], emits[:, :B, 0].T], axis=1)
    # Transcode leading start / trailing end runs to stay (-1),
    # identical to decode.transducer.viterbi_local_backtrace.
    lead = jnp.cumprod(path == START, axis=1).astype(bool)
    trail = jnp.cumprod((path == END)[:, ::-1], axis=1)[:, ::-1].astype(bool)
    path = jnp.where(lead | trail, -1, path)
    return logscore, path


def _fused_kernel(stay_ref, skip_ref, local_ref, tw_ref, tb_temp_ref,
                  c0_ref, c1_ref, h_ref, W_ref, bvec_ref, e4_ref, e16_ref,
                  e64_ref, fhist_ref, floc_ref, tbh_ref, tbl_ref,
                  hist_ref, loc_ref, *, nhist, use_slip, CT, prec=None, fast_expand=False):
    """Posterior head fused into the Viterbi scan: per step the hidden
    block h [Bt, Sp] goes through the output projection + temperature
    softmax (ref softmax_with_temperature, src/layers.c:333-357) +
    robustlog (src/layers.c:79-94) entirely in VMEM, then the DP
    update.  The [T, B, nstate] log posterior never exists in HBM —
    ~5x less memory traffic than posterior-then-decode."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        _dp_init(hist_ref, loc_ref)

    tempW = tw_ref[0, 0]
    tempb = tb_temp_ref[0, 0]
    c0 = c0_ref[0, 0]        # min_prob / nstate
    c1 = c1_ref[0, 0]        # 1 - min_prob
    W = W_ref[:]
    bvec = bvec_ref[:]

    for i in range(CT):
        # softmax(((h * tempb/tempW) @ W + b) / tempb), exactly as the
        # reference computes it; bias pad lanes are -BIG => prob 0.
        y = jnp.dot(h_ref[i] * (tempb / tempW), W,
                    preferred_element_type=jnp.float32,
                    precision=prec or jax.lax.Precision.HIGHEST)
        y = (y + bvec) / tempb
        m = jnp.max(y, axis=1, keepdims=True)
        e = jnp.exp(y - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        lp = jnp.log(c0 + c1 * p)
        _dp_step(lp[:, :nhist], lp[:, nhist : nhist + 1], stay_ref[0, 0],
                 skip_ref[0, 0], local_ref[0, 0], hist_ref, loc_ref,
                 tbh_ref, tbl_ref, e4_ref[:], e16_ref[:], e64_ref[:],
                 nhist=nhist, use_slip=use_slip, tb_slot=i,
                 fast_expand=fast_expand)

    @pl.when(t == T - 1)
    def _():
        fhist_ref[:] = hist_ref[:]
        floc_ref[:] = loc_ref[:]


@functools.partial(jax.jit, static_argnames=("use_slip", "interpret", "ct",
                                              "prec_name", "fast_expand"))
def viterbi_fused_tm(h_tm, W, bvec, nstate: int | None = None, min_prob=1e-5,
                     tempW=1.0, tempb=1.0, stay_pen=0.0, skip_pen=0.0,
                     local_pen=2.0, use_slip: bool = False,
                     interpret: bool | None = None, ct: int = 1,
                     prec_name: str | None = None,
                     fast_expand: bool = False):
    """Fused output-projection + softmax + robustlog + Viterbi forward.

    h_tm [T, B, Sp] lane-padded hidden features (time-major), W
    [Sp, nstate], bvec [nstate] -> (final [B, nhist+2], tb [T, B,
    nhist+2] int16), identical (within softmax reduction order) to
    robustlog(softmax_with_temperature(...)) -> viterbi_scores_tm.
    """
    if interpret is None:
        interpret = interpret_mode()
    T, B, Sp = h_tm.shape
    if nstate is None:
        nstate = W.shape[1]
    nhist = nstate - 1
    group = 64 if use_slip else 16
    if nhist % group:
        raise ValueError(f"nhist={nhist} not divisible by {group}")

    # Lane-pad the head: pad logits get bias -BIG => softmax prob 0.
    NSP = -(-nstate // 128) * 128
    Wp = jnp.pad(W, ((0, Sp - W.shape[0]), (0, NSP - nstate)))
    bp = jnp.concatenate([jnp.asarray(bvec, jnp.float32),
                          jnp.full((NSP - nstate,), -BIG, jnp.float32)])

    pad = (-B) % 8
    if pad:
        h_tm = jnp.pad(h_tm, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad
    Bt = _pick_batch_tile(Bp, limit=128)
    nbt = Bp // Bt

    CT = min(ct, max(T, 1))
    if T % CT:
        # Time padding is not implemented for the fused kernel (pad
        # blocks would update the DP carry); callers pick a divisor,
        # as ops/pipeline.py does.
        raise ValueError(f"T={T} must be a multiple of ct={CT}")
    nt = T // CT

    from scrappie_tpu.ops import resolve_precision

    kern = functools.partial(_fused_kernel, nhist=nhist, use_slip=use_slip,
                             CT=CT, prec=resolve_precision(prec_name),
                             fast_expand=fast_expand)
    scal = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 1)
    smem = lambda: pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                                memory_space=pltpu.SMEM)
    e4 = _onehot_expander(nhist, 4)
    e16 = _onehot_expander(nhist, 16)
    e64 = _onehot_expander(nhist, 64) if use_slip else jnp.zeros((1, nhist),
                                                                 jnp.float32)
    const = lambda shape: pl.BlockSpec(shape, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    fhist, floc, tbh, tbl = pl.pallas_call(
        kern,
        grid=(nbt, nt),
        in_specs=[
            smem(), smem(), smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec((CT, Bt, Sp), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            const(Wp.shape), const((1, NSP)),
            const(e4.shape), const(e16.shape), const(e64.shape),
        ],
        out_specs=(
            pl.BlockSpec((Bt, nhist), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 2), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, nhist), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, 2), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, nhist), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 2), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, nhist), jnp.int16),
            jax.ShapeDtypeStruct((T, Bp, 2), jnp.int16),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, nhist), jnp.float32),
            pltpu.VMEM((Bt, 2), jnp.float32),
        ],
        interpret=interpret,
    )(scal(stay_pen), scal(skip_pen), scal(local_pen), scal(tempW),
      scal(tempb), scal(min_prob / nstate), scal(1.0 - min_prob),
      h_tm, Wp, bp.reshape(1, -1), e4, e16, e64)
    final = jnp.concatenate([fhist, floc], axis=1)[:B]
    tb = jnp.concatenate([tbh, tbl], axis=2)[:, :B]
    return final, tb


def _fused_ens_kernel(stay_ref, skip_ref, local_ref, tw_ref, tb_temp_ref,
                      c0_ref, c1_ref, wk_ref, h_ref, W_ref, bvec_ref,
                      e4_ref, e16_ref, e64_ref, fhist_ref, floc_ref,
                      tbh_ref, tbl_ref, hist_ref, loc_ref, *, nhist, nstate,
                      K, use_slip, CT, prec=None, fast_expand=False):
    """K-model posterior combination fused into the Viterbi scan.

    Per step, each member's head projection + temperature softmax +
    robustlog runs in VMEM exactly as _fused_kernel does, the K
    robustlog posteriors combine as a weighted log-domain mean and are
    renormalised over the real nstate lanes (matching the engine's
    stitch-mode ensemble, parallel/runner._combined), then the DP
    update consumes the combined log posterior directly.  Neither the
    members' nor the combined [T, B, nstate] posterior ever exists in
    HBM — the ensemble's accuracy at fused-pipeline memory traffic
    (VERDICT r4 #1; the reference runs one network per call,
    ref src/scrappie_raw.c:199-210)."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        _dp_init(hist_ref, loc_ref)

    tempW = tw_ref[0, 0]
    tempb = tb_temp_ref[0, 0]
    c0 = c0_ref[0, 0]        # min_prob / nstate
    c1 = c1_ref[0, 0]        # 1 - min_prob

    for i in range(CT):
        acc = None
        for k in range(K):
            y = jnp.dot(h_ref[k, i] * (tempb / tempW), W_ref[k],
                        preferred_element_type=jnp.float32,
                        precision=prec or jax.lax.Precision.HIGHEST)
            y = (y + bvec_ref[k]) / tempb
            m = jnp.max(y, axis=1, keepdims=True)
            e = jnp.exp(y - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            lp_k = jnp.log(c0 + c1 * p) * wk_ref[0, k]
            acc = lp_k if acc is None else acc + lp_k
        # Renormalise over the REAL nstate lanes only: pad lanes carry
        # sum_k w_k*log(c0) (softmax prob 0 under the -BIG pad bias),
        # which must not leak into the normaliser.
        lanes = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        acc = jnp.where(lanes < nstate, acc, -BIG)
        mx = jnp.max(acc, axis=1, keepdims=True)
        lp = acc - (mx + jnp.log(jnp.sum(jnp.exp(acc - mx), axis=1,
                                         keepdims=True)))
        _dp_step(lp[:, :nhist], lp[:, nhist : nhist + 1], stay_ref[0, 0],
                 skip_ref[0, 0], local_ref[0, 0], hist_ref, loc_ref,
                 tbh_ref, tbl_ref, e4_ref[:], e16_ref[:], e64_ref[:],
                 nhist=nhist, use_slip=use_slip, tb_slot=i,
                 fast_expand=fast_expand)

    @pl.when(t == T - 1)
    def _():
        fhist_ref[:] = hist_ref[:]
        floc_ref[:] = loc_ref[:]


@functools.partial(jax.jit, static_argnames=("use_slip", "interpret", "ct",
                                              "prec_name", "fast_expand"))
def viterbi_fused_ens_tm(h_tm, W, bvec, weights, nstate: int | None = None,
                         min_prob=1e-5, tempW=1.0, tempb=1.0, stay_pen=0.0,
                         skip_pen=0.0, local_pen=2.0, use_slip: bool = False,
                         interpret: bool | None = None, ct: int = 1,
                         prec_name: str | None = None,
                         fast_expand: bool = False):
    """Ensemble twin of viterbi_fused_tm.

    h_tm [K, T, B, Sp] lane-padded per-member hidden features
    (time-major; members with narrower stacks are zero-padded to the
    common Sp — their head W rows pad with zeros), W [K, Sp_w, nstate],
    bvec [K, nstate], weights [K] normalised combination weights ->
    (final [B, nhist+2], tb [T, B, nhist+2] int16) over the combined
    log posterior sum_k w_k*robustlog(softmax_k), renormalised per
    block — identical (within f32 reduction order) to combining the
    members' forward.*_posterior outputs and running viterbi_scores_tm.
    """
    if interpret is None:
        interpret = interpret_mode()
    K, T, B, Sp = h_tm.shape
    if nstate is None:
        nstate = W.shape[2]
    nhist = nstate - 1
    group = 64 if use_slip else 16
    if nhist % group:
        raise ValueError(f"nhist={nhist} not divisible by {group}")

    NSP = -(-nstate // 128) * 128
    Wp = jnp.pad(W, ((0, 0), (0, Sp - W.shape[1]), (0, NSP - nstate)))
    bp = jnp.concatenate(
        [jnp.asarray(bvec, jnp.float32),
         jnp.full((K, NSP - nstate), -BIG, jnp.float32)], axis=1)

    pad = (-B) % 8
    if pad:
        h_tm = jnp.pad(h_tm, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Bp = B + pad
    Bt = _pick_batch_tile(Bp, limit=128)
    nbt = Bp // Bt

    CT = min(ct, max(T, 1))
    if T % CT:
        raise ValueError(f"T={T} must be a multiple of ct={CT}")
    nt = T // CT

    from scrappie_tpu.ops import resolve_precision

    kern = functools.partial(_fused_ens_kernel, nhist=nhist, nstate=nstate,
                             K=K, use_slip=use_slip, CT=CT,
                             prec=resolve_precision(prec_name),
                             fast_expand=fast_expand)
    scal = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 1)
    smem = lambda shape=(1, 1): pl.BlockSpec(shape, lambda b, t: (0, 0),
                                             memory_space=pltpu.SMEM)
    e4 = _onehot_expander(nhist, 4)
    e16 = _onehot_expander(nhist, 16)
    e64 = _onehot_expander(nhist, 64) if use_slip else jnp.zeros((1, nhist),
                                                                 jnp.float32)
    const = lambda shape: pl.BlockSpec(shape,
                                       lambda b, t, _n=len(shape): (0,) * _n,
                                       memory_space=pltpu.VMEM)
    fhist, floc, tbh, tbl = pl.pallas_call(
        kern,
        grid=(nbt, nt),
        in_specs=[
            smem(), smem(), smem(), smem(), smem(), smem(), smem(),
            smem((1, K)),
            pl.BlockSpec((K, CT, Bt, Sp), lambda b, t: (0, t, b, 0),
                         memory_space=pltpu.VMEM),
            const(Wp.shape), const((K, NSP)),
            const(e4.shape), const(e16.shape), const(e64.shape),
        ],
        out_specs=(
            pl.BlockSpec((Bt, nhist), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 2), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, nhist), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, Bt, 2), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, nhist), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 2), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, nhist), jnp.int16),
            jax.ShapeDtypeStruct((T, Bp, 2), jnp.int16),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bt, nhist), jnp.float32),
            pltpu.VMEM((Bt, 2), jnp.float32),
        ],
        interpret=interpret,
    )(scal(stay_pen), scal(skip_pen), scal(local_pen), scal(tempW),
      scal(tempb), scal(min_prob / nstate), scal(1.0 - min_prob),
      jnp.asarray(weights, jnp.float32).reshape(1, K), h_tm, Wp, bp,
      e4, e16, e64)
    final = jnp.concatenate([fhist, floc], axis=1)[:B]
    tb = jnp.concatenate([tbh, tbl], axis=2)[:, :B]
    return final, tb


def viterbi_scores_batch(logpost, stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                         use_slip: bool = False):
    """Batch-major convenience wrapper: logpost [B, T, nstate] ->
    (final [B, nhist+2], tb [B, T, nhist+2]) — drop-in for
    decode.transducer.viterbi_transducer_scores."""
    final, tb = viterbi_scores_tm(jnp.moveaxis(logpost, 1, 0), stay_pen,
                                  skip_pen, local_pen, use_slip)
    return final, jnp.moveaxis(tb, 1, 0)

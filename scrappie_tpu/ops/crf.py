"""Pallas TPU kernel for CRF Viterbi decode (rnnrf head).

Behavioural spec: ref decode_crf, src/decode.c:836-894; semantics match
decode/crf._crf_viterbi exactly (same candidate order, first-max ties
via argmax over the `from` axis).

The 5-state CRF is tiny, so the layout inverts the transducer kernels:
BATCH rides the 128-lane axis and the 25 transition entries ride the
sublane axis — each DP update is ~50 fully-unrolled [1, B] vector ops,
and one grid step advances CT blocks.  The sequential whole-read scan
the engine's device-stitch decode previously paid (jax.lax.scan over
20-40k blocks at stride 2) becomes a streamed VMEM recurrence, like
the GRU/Viterbi kernels.

Kernel I/O:
  trans_tm [T, 32, B]  f32  (trans[t, to*5+from, b]; rows 25..31 dead)
  final    [8, B]      f32  (rows 0..4 = last-block state scores)
  tb       [T, 8, B]   int8 (argmax `from` per `to`; rows 5..7 dead)

Wrappers accept/return the decode/crf.py batch-major convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrappie_tpu.ops import interpret_mode

NS = 5
ROWS = 8  # sublane-padded state rows
TR = 32   # sublane-padded transition rows


def _crf_fwd_kernel(trans_ref, final_ref, tb_ref, prev_ref, *, CT):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        prev_ref[:] = jnp.zeros_like(prev_ref)

    prev = prev_ref[:]                       # [ROWS, B] rows 0..4 live
    for i in range(CT):
        tr = trans_ref[i]                    # [TR, B]
        rows = []
        tbs = []
        for to in range(NS):
            best = tr[to * NS + 0 : to * NS + 1] + prev[0:1]
            bidx = jnp.zeros_like(best)
            for frm in range(1, NS):
                cand = tr[to * NS + frm : to * NS + frm + 1] \
                    + prev[frm : frm + 1]
                upd = cand > best            # first-max: strict >
                best = jnp.where(upd, cand, best)
                bidx = jnp.where(upd, float(frm), bidx)
            rows.append(best)
            tbs.append(bidx)
        pad = jnp.full_like(rows[0], -jnp.inf)
        prev = jnp.concatenate(rows + [pad] * (ROWS - NS), axis=0)
        tb_ref[i] = jnp.concatenate(
            tbs + [jnp.zeros_like(tbs[0])] * (ROWS - NS), axis=0
        ).astype(jnp.int8)
    prev_ref[:] = prev

    @pl.when(t == T - 1)
    def _():
        final_ref[:] = prev_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "ct"))
def crf_viterbi_scores_tm(trans_tm, interpret: bool | None = None,
                          ct: int = 8):
    """Forward CRF Viterbi: trans_tm [T, TR, B] -> (final [ROWS, B],
    tb [T, ROWS, B] int8).  B must be a multiple of 128 (caller pads);
    T a multiple of ct is arranged here by neutral padding (pad blocks
    allow only stays at cost 0 for every state: identity transitions)."""
    if interpret is None:
        interpret = interpret_mode()
    T, tr, B = trans_tm.shape
    assert tr == TR and B % 128 == 0
    CT = min(ct, max(T, 1))
    tpad = (-T) % CT
    if tpad:
        # identity-pad: to==from costs 0, others -inf -> prev carried
        # unchanged, tb rows are the identity map (to==from)
        eye = jnp.where(
            (jnp.arange(TR) % (NS + 1) == 0)[:, None]
            & (jnp.arange(TR) < NS * NS)[:, None],
            0.0, -jnp.float32(1e30))
        pad_blk = jnp.broadcast_to(eye, (tpad, TR, B))
        trans_tm = jnp.concatenate([trans_tm, pad_blk], axis=0)
    Tp = T + tpad
    nt = Tp // CT

    final, tb = pl.pallas_call(
        functools.partial(_crf_fwd_kernel, CT=CT),
        grid=(1, nt),
        in_specs=[pl.BlockSpec((CT, TR, B), lambda b, t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((ROWS, B), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, ROWS, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ROWS, B), jnp.float32),
            jax.ShapeDtypeStruct((Tp, ROWS, B), jnp.int8),
        ),
        scratch_shapes=[pltpu.VMEM((ROWS, B), jnp.float32)],
        interpret=interpret,
    )(trans_tm)
    return final, (tb[:T] if tpad else tb)


def _crf_bt_kernel(last_ref, tb_ref, first_ref, emit_ref, cur_ref, *, CT):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        cur_ref[:] = last_ref[:]

    cur = cur_ref[:]                         # [1, B] int32
    for i in range(CT - 1, -1, -1):
        tb = tb_ref[i].astype(jnp.int32)     # [ROWS, B]
        emit_ref[i] = cur
        nxt = jnp.zeros_like(cur)
        for s in range(NS):                  # sublane gather: tb[cur[b], b]
            nxt = jnp.where(cur == s, tb[s : s + 1], nxt)
        cur = nxt
    cur_ref[:] = cur

    @pl.when(t == T - 1)
    def _():
        first_ref[:] = cur_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "ct"))
def crf_backtrace_tm(final, tb, interpret: bool | None = None, ct: int = 8):
    """Walk the traceback: (final [ROWS, B], tb [T, ROWS, B] int8) ->
    (score [B], path [B, T+1] int32)."""
    if interpret is None:
        interpret = interpret_mode()
    T, rows, B = tb.shape
    live = final[:NS]                        # [NS, B]
    score = jnp.max(live, axis=0)
    last = jnp.argmax(live, axis=0).astype(jnp.int32)

    CT = min(ct, max(T, 1))
    tpad = (-T) % CT
    if tpad:
        # pad the FRONT (walked last); identity tb rows keep cur as-is
        idrows = jnp.broadcast_to(
            jnp.arange(ROWS, dtype=jnp.int8)[:, None], (ROWS, B))
        tb = jnp.concatenate(
            [jnp.broadcast_to(idrows, (tpad, ROWS, B)), tb], axis=0)
    Tp = T + tpad
    nt = Tp // CT

    first, emits = pl.pallas_call(
        functools.partial(_crf_bt_kernel, CT=CT),
        grid=(1, nt),
        in_specs=[
            pl.BlockSpec((1, B), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, ROWS, B), lambda b, t: (nt - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, 1, B), lambda b, t: (nt - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((Tp, 1, B), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
        interpret=interpret,
    )(last[None, :], tb)
    if tpad:
        emits = emits[tpad:]
    path = jnp.concatenate([first.T, emits[:, 0].T], axis=1)  # [B, T+1]
    return score, path


def crf_viterbi_kernel(trans):
    """Drop-in for decode/crf._crf_viterbi on TPU: trans [B, T, 25] ->
    (score [B], path [B, T+1] int32), batch lane-padded internally."""
    B, T, nsq = trans.shape
    assert nsq == NS * NS
    pad = (-B) % 128
    t = jnp.moveaxis(trans, 0, 2)            # [T, 25, B]
    t = jnp.pad(t, ((0, 0), (0, TR - NS * NS), (0, pad)),
                constant_values=0.0)
    final, tb = crf_viterbi_scores_tm(t)
    score, path = crf_backtrace_tm(final, tb)
    return score[:B], path[:B]

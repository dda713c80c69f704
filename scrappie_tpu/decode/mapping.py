"""Local-global mapping of a basecall posterior to a reference sequence.

Behavioural spec: ref src/decode.c:1420-1964.  States are the seqlen
kmer positions plus local START/END; per block a position can be
reached by stay (emit the stay symbol), step (from pos-1), or skip
(from pos-2, penalised), with local entry/exit.

Two on-device implementations:
  * dense: lax.scan over blocks with shifted [seqlen+2] vectors;
  * banded: the DP is restricted to a monotone band; instead of the
    reference's per-block variable loops we keep a fixed-width window
    (max band width, static shape) that slides along the sequence, so
    the banded cost is O(nblock * width) on the VPU and genuinely
    cheaper than the dense version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1.0e30


def are_bounds_sane(low, high, nblock: int, seqlen: int) -> bool:
    """Band validity checks (ref are_bounds_sane, src/decode.c:1638-1689)."""
    low = np.asarray(low)
    high = np.asarray(high)
    if low.shape[0] != nblock or high.shape[0] != nblock:
        return False
    ok = (
        low[0] == 0
        and high[-1] == seqlen
        and (low <= seqlen).all()
        and (high <= seqlen).all()
        and (low <= high).all()
        and (low[1:] <= high[:-1]).all()   # overlap (step-only allowed)
        and (low[1:] >= low[:-1]).all()    # monotone
        and (high[1:] >= high[:-1]).all()
    )
    return bool(ok)


@functools.partial(jax.jit, static_argnames=("viterbi", "want_path"))
def _map_dense(logpost, seqstates, stay_pen, skip_pen, local_pen,
               viterbi: bool, want_path: bool):
    T, nst = logpost.shape
    seqlen = seqstates.shape[0]
    START, END = seqlen, seqlen + 1

    init = jnp.full((seqlen + 2,), -BIG, dtype=jnp.float32).at[START].set(0.0)
    neg = jnp.float32(-BIG)
    pos_idx = jnp.arange(seqlen, dtype=jnp.int32)

    def step(prev, lp):
        stay_lp = lp[nst - 1]
        emit = lp[seqstates]  # [seqlen] log P(state of seq position)

        # Stay in ordinary states
        curr = prev[:seqlen] - stay_pen + stay_lp
        if viterbi:
            tb = pos_idx
            def contend(curr, tb, cand, cand_tb):
                upd = cand > curr
                return jnp.where(upd, cand, curr), jnp.where(upd, cand_tb, tb)
        else:
            tb = None
            def contend(curr, tb, cand, cand_tb):
                return jnp.logaddexp(curr, cand), None

        # Step from pos-1 (dest pos >= 1)
        stepc = jnp.concatenate([neg[None], prev[: seqlen - 1]]) + emit
        curr, tb = contend(curr, tb, stepc, pos_idx - 1)
        # Skip from pos-2 (dest pos >= 2)
        skipc = jnp.concatenate([neg[None], neg[None], prev[: seqlen - 2]]) - skip_pen + emit
        curr, tb = contend(curr, tb, skipc, pos_idx - 2)
        # Enter sequence at position 0 from START
        entry = prev[START] + emit[0]
        if viterbi:
            upd0 = entry > curr[0]
            curr = curr.at[0].set(jnp.where(upd0, entry, curr[0]))
            tb = tb.at[0].set(jnp.where(upd0, START, tb[0]))
        else:
            curr = curr.at[0].set(jnp.logaddexp(curr[0], entry))

        # Local states
        if viterbi:
            local_stay = jnp.maximum(-local_pen, stay_lp)
        else:
            local_stay = jnp.logaddexp(-local_pen, stay_lp)
        start_new = prev[START] + local_stay
        end_new = prev[END] + local_stay
        end_tb = jnp.int32(END)
        exit_c = prev[seqlen - 1] - local_pen
        if viterbi:
            upd = exit_c > end_new
            end_tb = jnp.where(upd, jnp.int32(seqlen - 1), end_tb)
            end_new = jnp.where(upd, exit_c, end_new)
        else:
            end_new = jnp.logaddexp(end_new, exit_c)

        new = jnp.concatenate([curr, start_new[None], end_new[None]])
        if viterbi and want_path:
            tb_full = jnp.concatenate([tb, jnp.full((1,), START, jnp.int32),
                                       end_tb[None]])
            return new, tb_full
        return new, None

    final, tbs = jax.lax.scan(step, init, logpost)
    return final, tbs


def _dense_dispatch(lp, seqstates, stay_pen, skip_pen, local_pen,
                    viterbi, want_path=True):
    """Pallas kernel on TPU (ops/seqmap.py), lax.scan otherwise."""
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        from scrappie_tpu.ops.seqmap import map_to_sequence_tm

        return map_to_sequence_tm(lp, seqstates, stay_pen, skip_pen,
                                  local_pen, viterbi=viterbi)
    return _map_dense(lp, seqstates, stay_pen, skip_pen, local_pen,
                      viterbi, want_path)


def map_to_sequence_viterbi(logpost, seq, stay_pen=0.0, skip_pen=0.0,
                            local_pen=4.0, want_path: bool = False):
    """Viterbi map of posterior to sequence (ref src/decode.c:1420-1531).

    Returns score, or (score, path [T]) when want_path (path entries are
    sequence positions, -1 for local states).
    """
    lp = jnp.asarray(logpost, dtype=jnp.float32)
    seqstates = jnp.asarray(seq, dtype=jnp.int32)
    seqlen = int(seqstates.shape[0])
    final, tbs = _dense_dispatch(lp, seqstates, float(stay_pen),
                                 float(skip_pen), float(local_pen), True,
                                 want_path)
    final = np.asarray(final)
    END = seqlen + 1
    score = float(max(final[seqlen - 1], final[END]))
    if not want_path:
        return score
    tbs = np.asarray(tbs)
    T = lp.shape[0]
    path = np.zeros(T, dtype=np.int32)
    path[T - 1] = seqlen - 1 if final[seqlen - 1] > final[END] else END
    for t in range(T - 1, 0, -1):
        path[t - 1] = tbs[t, path[t]]
    path[(path == seqlen) | (path == END)] = -1
    return score, path


def map_to_sequence_forward(logpost, seq, stay_pen=0.0, skip_pen=0.0, local_pen=4.0):
    """Forward score of posterior-to-sequence map (ref src/decode.c:1547-1626)."""
    lp = jnp.asarray(logpost, dtype=jnp.float32)
    seqstates = jnp.asarray(seq, dtype=jnp.int32)
    seqlen = int(seqstates.shape[0])
    final, _ = _dense_dispatch(lp, seqstates, float(stay_pen), float(skip_pen),
                          float(local_pen), False, False)
    final = np.asarray(final)
    return float(np.logaddexp(final[seqlen - 1], final[seqlen + 1]))


@functools.partial(jax.jit, static_argnames=("viterbi", "width"))
def _map_banded(logpost, emit_win, valid_win, delta, entry_ok, stay_pen,
                skip_pen, local_pen, seq0_emit, seqm1_in_band, init_win,
                width: int, viterbi: bool):
    """Windowed banded DP over blocks 1..T-1.

    Block 0 follows the reference's special first-block recursion
    (ref src/decode.c:1745-1768) and is computed by the caller into
    `init_win` (+ the fixed start/end carries below); the scan then
    iterates the uniform recursion.

    emit_win [T-1, width]: logpost of the sequence state at band offset
    w; valid_win [T-1, width]: in-band mask; delta [T-1]:
    low[t] - low[t-1]; entry_ok [T-1]: low[t] == 0 (entry allowed);
    seq0_emit [T-1]: logpost of seq[0] (entry), seqm1_in_band [T-1, 2]:
    (mask, window offset) of position seqlen-1 in the previous window.
    """
    neg = jnp.float32(-BIG)

    if viterbi:
        comb = jnp.maximum
        local_stay_fn = lambda s: jnp.maximum(-local_pen, s)
    else:
        comb = jnp.logaddexp
        local_stay_fn = lambda s: jnp.logaddexp(-local_pen, s)

    # Carries after block 0 (ref :1745-1768): START stayed once; END is
    # reached only by the direct start->end transition, which the
    # reference allows in the first block alone (commented out in the
    # main loop, ref :1812, :1950).
    init = (init_win, local_stay_fn(logpost[0, -1]), jnp.float32(-local_pen))

    def shift(prev, d, by):
        """prev window re-indexed: new[w] corresponds to old index w + d - by."""
        padded = jnp.concatenate([jnp.full((width,), -BIG), prev,
                                  jnp.full((width,), -BIG)])
        return jax.lax.dynamic_slice(padded, (width + d - by,), (width,))

    def step(carry, inputs):
        prev, start, end = carry
        emit, valid, d, stay_lp, s0e, sm1, eok = inputs

        # Stay: same absolute position -> old offset w + d
        stay_c = shift(prev, d, 0) - stay_pen + stay_lp
        # Step: from pos-1 -> old offset w + d - 1
        step_c = shift(prev, d, 1) + emit
        # Skip: from pos-2
        skip_c = shift(prev, d, 2) - skip_pen + emit

        curr = comb(comb(stay_c, step_c), skip_c)

        # Entry at absolute position 0 (only allowed while low[blk] == 0)
        entry = start + s0e
        curr = curr.at[0].set(jnp.where(eok, comb(curr[0], entry), curr[0]))

        curr = jnp.where(valid, curr, -BIG)

        new_start = start + local_stay_fn(stay_lp)
        new_end = end + local_stay_fn(stay_lp)
        # Exit from position seqlen-1
        exit_score = jnp.where(sm1[0] > 0, prev[sm1[1].astype(jnp.int32)], -BIG) - local_pen
        new_end = comb(new_end, exit_score)

        return (curr, new_start, new_end), None

    (final_win, _, final_end), _ = jax.lax.scan(
        step, init, (emit_win, valid_win, delta,
                     logpost[1:, -1], seq0_emit, seqm1_in_band, entry_ok)
    )
    return final_win, final_end


def map_to_sequence_banded(logpost, seq, low, high, stay_pen=0.0, skip_pen=0.0,
                           local_pen=4.0, viterbi: bool = True):
    """Banded map of posterior to sequence (ref src/decode.c:1706-1964).

    low/high: per-block inclusive/exclusive position bounds (monotone).
    Returns the score only (like the reference banded variants).

    Reproduces the reference's banded recursion exactly, including its
    first-block semantics (positions 1/2 seeded by a free step / a
    single skip penalty, ref src/decode.c:1750-1760) and the direct
    start->end transition that is allowed in the first block only (the
    main loop has it commented out, ref :1812, :1950).  First-block
    seeds outside the band are dropped: the reference writes them
    (conditions poshigh[0]>0 / >1) but its later read ranges are always
    clipped to the previous block's band, so they are never consumed.
    """
    lp = np.asarray(logpost, dtype=np.float32)
    seq = np.asarray(seq, dtype=np.int64)
    low = np.asarray(low, dtype=np.int64)
    high = np.asarray(high, dtype=np.int64)
    T, nst = lp.shape
    seqlen = len(seq)
    if not are_bounds_sane(low, high, T, seqlen):
        raise ValueError("banding structure is not valid")

    width = int((high - low).max())
    # Gather per-block windows host-side (cheap, numpy) then scan on device.
    offs = low[:, None] + np.arange(width)[None, :]
    valid = offs < high[:, None]
    offs_c = np.minimum(offs, seqlen - 1)
    emit_win = np.take_along_axis(lp, seq[offs_c], axis=1).astype(np.float32)
    delta = np.diff(low).astype(np.int32)
    seq0_emit = lp[:, seq[0]].astype(np.float32)
    sm1_mask = (low <= seqlen - 1) & (seqlen - 1 < high)
    # offset of seqlen-1 in the *previous* block's window (exit uses prev)
    prev_low = np.concatenate([[0], low[:-1]])
    prev_mask = np.concatenate([[False], sm1_mask[:-1]])
    sm1 = np.stack(
        [prev_mask.astype(np.int32),
         np.clip(seqlen - 1 - prev_low, 0, width - 1).astype(np.int32)], axis=1
    )

    # Block 0 (ref :1745-1768): entry at position 0, free step to 1,
    # single-skip to 2; window offsets are absolute (low[0] == 0).
    init_win = np.full(width, -BIG, dtype=np.float32)
    if high[0] > 0:  # like seeds 1/2: an out-of-band seed is never consumed
        init_win[0] = lp[0, seq[0]]
    if width > 1 and seqlen > 1 and high[0] > 1:
        init_win[1] = lp[0, seq[1]]
    if width > 2 and seqlen > 2 and high[0] > 2:
        init_win[2] = lp[0, seq[2]] - skip_pen

    final_win, final_end = _map_banded(
        jnp.asarray(lp), jnp.asarray(emit_win[1:]), jnp.asarray(valid[1:]),
        jnp.asarray(delta), jnp.asarray((low == 0)[1:]), float(stay_pen),
        float(skip_pen), float(local_pen), jnp.asarray(seq0_emit[1:]),
        jnp.asarray(sm1[1:]), jnp.asarray(init_win), width, viterbi,
    )
    final_win = np.asarray(final_win)
    w_last = seqlen - 1 - low[-1]
    last_pos_score = final_win[w_last] if 0 <= w_last < width else -BIG
    if viterbi:
        return float(max(last_pos_score, float(final_end)))
    return float(np.logaddexp(last_pos_score, float(final_end)))

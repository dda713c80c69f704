"""Signal-to-squiggle alignment (DTW-style HMM Viterbi / forward).

Behavioural spec: ref src/decode.c:1016-1401.  Aligns raw samples to a
predicted squiggle (per-position current/log-sd/log-dwell from the
squiggle nets).  State space: start, npos sequence positions, end, plus
npos "back" states modelling backward translocation.  Local alignment:
start/end absorb unmapped signal at local_pen per sample.

On-device design: one lax.scan over samples; the per-sample update is a
handful of shifted vector ops over the [nstate] score vector (VPU work),
with Laplace emissions fused in.  The Viterbi variant stores an int32
traceback and walks it with a second scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LARGE_VAL = 1.0e30
LOG_HALF = float(np.log(0.5))


def _penalties(params, rate: float, prob_back: float):
    """Per-position move/stay penalties (ref src/decode.c:1081-1098)."""
    dwell_logit = params[:, 2] + np.log(rate)
    mp = (1.0 - prob_back) * (0.5 * (1.0 + np.tanh(dwell_logit / 2.0)))
    move_pen_pos = np.log(mp)
    stay_pen_pos = np.log1p(-mp - prob_back)
    move_pen = np.concatenate([[move_pen_pos.mean()], move_pen_pos, [move_pen_pos.mean()]])
    stay_pen = np.concatenate([[stay_pen_pos.mean()], stay_pen_pos, [stay_pen_pos.mean()]])
    return move_pen.astype(np.float32), stay_pen.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("viterbi",))
def _squiggle_match(sig, locs, scales, logscales, move_pen, stay_pen,
                    prob_back, local_pen, skip_pen, minscore, viterbi: bool):
    npos = locs.shape[0]
    nfstate = npos + 2
    nstate = npos + nfstate
    move_back_pen = jnp.log(prob_back)

    fidx = jnp.arange(nfstate)
    init = jnp.full((nstate,), -LARGE_VAL, dtype=jnp.float32).at[0].set(0.0)

    # Start->pos jump penalties: -local_pen * destpos for destpos in 1..npos-1
    start_jump = jnp.full((nfstate,), -LARGE_VAL, dtype=jnp.float32)
    start_jump = start_jump.at[2:nfstate - 1].set(
        move_pen[0] - local_pen * jnp.arange(1, npos).astype(jnp.float32)
    )
    # Pos->end jump penalty per orig fwd-state: move_pen[origst] - local_pen*(npos-1-origpos)
    end_jump = jnp.full((nfstate,), -LARGE_VAL, dtype=jnp.float32)
    end_jump = end_jump.at[1:npos].set(
        move_pen[1:npos] - local_pen * (npos - 1 - jnp.arange(npos - 1)).astype(jnp.float32)
    )

    def combine(a, b):
        return jnp.logaddexp(a, b) if not viterbi else jnp.maximum(a, b)

    def step(prev, x):
        f = prev[:nfstate]
        bck = prev[nfstate:]

        # Stay
        curr_f = f + stay_pen
        curr_b = bck + LOG_HALF
        if viterbi:
            tb_f = fidx.astype(jnp.int32)
            tb_b = (jnp.arange(npos) + nfstate).astype(jnp.int32)

        def contend_f(curr_f, tb_f, cand, cand_tb):
            if viterbi:
                upd = cand > curr_f
                return jnp.where(upd, cand, curr_f), jnp.where(upd, cand_tb, tb_f)
            return jnp.logaddexp(curr_f, cand), None

        def contend_b(curr_b, tb_b, cand, cand_tb):
            if viterbi:
                upd = cand > curr_b
                return jnp.where(upd, cand, curr_b), jnp.where(upd, cand_tb, tb_b)
            return jnp.logaddexp(curr_b, cand), None

        if not viterbi:
            tb_f = tb_b = None

        neg = jnp.float32(-LARGE_VAL)
        # Step: dest st gets prev[st-1] + move_pen[st-1]
        stepc = jnp.concatenate([neg[None], f[:-1] + move_pen[:-1]])
        curr_f, tb_f = contend_f(curr_f, tb_f, stepc, fidx.astype(jnp.int32) - 1)
        # Skip
        skipc = jnp.concatenate([neg[None], neg[None], f[:-2] + move_pen[:-2] - skip_pen])
        curr_f, tb_f = contend_f(curr_f, tb_f, skipc, fidx.astype(jnp.int32) - 2)
        # Start -> sequence jump
        curr_f, tb_f = contend_f(curr_f, tb_f, f[0] + start_jump,
                                 jnp.zeros((nfstate,), jnp.int32))
        # Sequence -> end jump
        endc = jnp.max(f + end_jump) if viterbi else jax.nn.logsumexp(f + end_jump)
        if viterbi:
            end_src = jnp.argmax(f + end_jump).astype(jnp.int32)
            upd = endc > curr_f[nfstate - 1]
            curr_f = curr_f.at[nfstate - 1].set(jnp.where(upd, endc, curr_f[nfstate - 1]))
            tb_f = tb_f.at[nfstate - 1].set(jnp.where(upd, end_src, tb_f[nfstate - 1]))
        else:
            curr_f = curr_f.at[nfstate - 1].set(
                jnp.logaddexp(curr_f[nfstate - 1], endc)
            )
        # Move to back state b = st-1 from fwd-state st+1 (st in 1..npos-1)
        back_c = jnp.concatenate([f[2:nfstate - 1] + move_back_pen,
                                  jnp.full((1,), -LARGE_VAL)])
        curr_b, tb_b = contend_b(curr_b, tb_b, back_c,
                                 jnp.arange(npos, dtype=jnp.int32) + 2)
        # Move from back b = st-1 into fwd-state st+1
        fromb = jnp.concatenate([jnp.full((2,), -LARGE_VAL),
                                 bck[:npos - 1] + LOG_HALF,
                                 jnp.full((1,), -LARGE_VAL)])
        curr_f, tb_f = contend_f(
            curr_f, tb_f, fromb,
            jnp.arange(nfstate, dtype=jnp.int32) + nfstate - 2,
        )

        # Laplace emissions (floored), added to position + back states
        emission = jnp.maximum(
            -minscore, -jnp.abs(x - locs) / scales - logscales - jnp.log(2.0)
        )
        curr_f = curr_f.at[1:npos + 1].add(emission)
        curr_b = curr_b + emission
        curr_f = curr_f.at[0].add(-local_pen)
        curr_f = curr_f.at[nfstate - 1].add(-local_pen)

        new = jnp.concatenate([curr_f, curr_b])
        if viterbi:
            return new, jnp.concatenate([tb_f, tb_b])
        return new, None

    final, tbs = jax.lax.scan(step, init, sig)
    return final, tbs


def squiggle_match_viterbi(signal, params, rate=1.0, prob_back=0.0,
                           local_pen=2.0, skip_pen=0.0, minscore=5.0):
    """Viterbi signal-to-squiggle alignment (ref src/decode.c:1035-1244).

    signal: [nsample] normalised samples; params [npos, 3] untransformed
    squiggle output (current, log sd, -log dwell... as emitted with
    transform_units=False).  Returns (score, path [nsample]) where
    path[i] is the squiggle position of sample i (back moves report the
    position; -1 = unmapped under the local model).
    """
    params = np.asarray(params, dtype=np.float32)
    signal = jnp.asarray(signal, dtype=jnp.float32)
    npos = params.shape[0]
    nfstate = npos + 2

    prob_back = float(prob_back)
    # log(0) = -inf is fine for the disabled-back case; silence the warning
    with np.errstate(divide="ignore"):
        move_pen, stay_pen = _penalties(params, rate, max(prob_back, 0.0))
        pb = prob_back if prob_back > 0 else 0.0

    locs = jnp.asarray(params[:, 0])
    logscales = jnp.asarray(params[:, 1])
    scales = jnp.exp(logscales)

    final, tbs = _dispatch_match(
        signal, locs, scales, logscales, move_pen, stay_pen,
        pb, float(local_pen), float(skip_pen), float(minscore), True,
    )
    final = np.asarray(final)
    tbs = np.asarray(tbs)
    nsample = len(np.asarray(signal))

    # Final state: last position or end state (ref :1195-1202)
    score = float(max(final[nfstate - 2], final[nfstate - 1]))
    path = np.zeros(nsample, dtype=np.int32)
    path[-1] = nfstate - 2 if final[nfstate - 2] > final[nfstate - 1] else nfstate - 1
    for s in range(nsample - 1, 0, -1):
        path[s - 1] = tbs[s, path[s]]

    # Relabel (ref :1210-1234): leading starts / trailing ends -> -1,
    # back states -> position, fwd states -> position (index - 1).
    smin = 0
    while smin < nsample and path[smin] == 0:
        path[smin] = -1
        smin += 1
    smax = nsample
    while smax > 0 and path[smax - 1] == nfstate - 1:
        path[smax - 1] = -1
        smax -= 1
    seg = path[smin:smax]
    path[smin:smax] = np.where(seg >= nfstate, seg - nfstate, seg - 1)
    return score, path


def squiggle_match_forward(signal, params, rate=1.0, prob_back=0.0,
                           local_pen=2.0, skip_pen=0.0, minscore=5.0):
    """Forward score of the signal-squiggle alignment (ref src/decode.c:1262-1401)."""
    params = np.asarray(params, dtype=np.float32)
    signal = jnp.asarray(signal, dtype=jnp.float32)
    npos = params.shape[0]
    nfstate = npos + 2
    with np.errstate(divide="ignore"):
        move_pen, stay_pen = _penalties(params, rate, max(float(prob_back), 0.0))
    locs = jnp.asarray(params[:, 0])
    logscales = jnp.asarray(params[:, 1])
    final, _ = _dispatch_match(
        signal, locs, jnp.exp(logscales), logscales,
        move_pen, stay_pen,
        float(prob_back), float(local_pen), float(skip_pen), float(minscore), False,
    )
    final = np.asarray(final)
    return float(np.logaddexp(final[nfstate - 2], final[nfstate - 1]))


def _dispatch_match(signal, locs, scales, logscales, move_pen, stay_pen,
                    prob_back, local_pen, skip_pen, minscore, viterbi):
    """Pallas kernel on TPU (ops/dtw.py), lax.scan otherwise."""
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        from scrappie_tpu.ops.dtw import squiggle_match_tm

        return squiggle_match_tm(
            jnp.asarray(signal, jnp.float32), jnp.asarray(locs),
            jnp.asarray(scales), jnp.asarray(logscales),
            jnp.asarray(move_pen), jnp.asarray(stay_pen),
            float(prob_back), float(local_pen), float(skip_pen),
            float(minscore), viterbi=viterbi)
    return _squiggle_match(
        jnp.asarray(signal, jnp.float32), jnp.asarray(locs),
        jnp.asarray(scales), jnp.asarray(logscales),
        jnp.asarray(move_pen), jnp.asarray(stay_pen),
        prob_back, float(local_pen), float(skip_pen), float(minscore),
        viterbi)

"""Scalar numpy reference decoders.

These are the analogue of the reference's `sloika_viterbi`
(src/decode.c:725-834): simple, obviously-correct implementations used
to validate the vectorised on-device decoders (same paths, scores within
float tolerance).  Never used on the hot path.
"""

from __future__ import annotations

import numpy as np

BIG_FLOAT = 1.0e30


def viterbi_transducer_ref(logpost, stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                           use_slip=False):
    """Scalar transducer Viterbi; returns (score, path [T+1])."""
    logpost = np.asarray(logpost, dtype=np.float32)
    T, nstate = logpost.shape
    nhist = nstate - 1
    START, END = nhist, nhist + 1

    score = np.full(nhist + 2, -BIG_FLOAT, dtype=np.float32)
    score[START] = 0.0
    tb = np.zeros((T, nhist + 2), dtype=np.int32)

    n4 = nhist // 4
    n16 = nhist // 16
    n64 = nhist // 64

    for t in range(T):
        prev = score.copy()
        lp = logpost[t]
        stay = lp[nhist]

        hist = prev[:nhist]
        new = hist + (stay - stay_pen)
        tb_t = np.full(nhist, -1, dtype=np.int32)

        def contend(new, tb_t, cand, cand_tb):
            upd = cand > new
            new = np.where(upd, cand, new)
            tb_t = np.where(upd, cand_tb, tb_t)
            return new, tb_t

        m4 = hist.reshape(4, n4)
        pred4 = m4.argmax(0) * n4 + np.arange(n4)
        new, tb_t = contend(new, tb_t, lp[:nhist] + np.repeat(m4.max(0), 4),
                            np.repeat(pred4, 4))
        m16 = hist.reshape(16, n16)
        pred16 = m16.argmax(0) * n16 + np.arange(n16)
        new, tb_t = contend(new, tb_t, lp[:nhist] + np.repeat(m16.max(0), 16) - skip_pen,
                            np.repeat(pred16, 16))
        if use_slip:
            m64 = hist.reshape(64, n64)
            pred64 = m64.argmax(0) * n64 + np.arange(n64)
            new, tb_t = contend(new, tb_t,
                                lp[:nhist] + np.repeat(m64.max(0), 64) - 2 * skip_pen,
                                np.repeat(pred64, 64))
        new, tb_t = contend(new, tb_t, prev[START] + lp[:nhist],
                            np.full(nhist, START, dtype=np.int32))

        local_stay = max(-local_pen, stay - stay_pen)
        start_new = prev[START] + local_stay
        end_new = prev[END] + local_stay
        end_tb = END
        enter = hist.max() - local_pen
        if enter > end_new:
            end_new = enter
            end_tb = int(hist.argmax())

        score = np.concatenate([new, [start_new, end_new]]).astype(np.float32)
        tb[t, :nhist] = tb_t
        tb[t, START] = START
        tb[t, END] = end_tb

    # Local backtrace (ref src/decode.c:58-98)
    path = np.full(T + 1, -1, dtype=np.int32)
    last = int(score.argmax())
    logscore = float(score[last])
    for ri in range(T - 1, -1, -1):
        state = tb[ri, last]
        if state >= 0:
            path[ri + 1] = last
            last = state
    path[0] = last
    for i in range(T + 1):
        if path[i] == START:
            path[i] = -1
        else:
            break
    for i in range(T, -1, -1):
        if path[i] == END:
            path[i] = -1
        else:
            break
    return logscore, path


def viterbi_crf_ref(trans):
    """Scalar CRF Viterbi (ref decode_crf, src/decode.c:836-893).

    trans [T, nstate^2], entry [t, st1*ns + st2] = energy st2 -> st1.
    Returns (score, path [T+1]).
    """
    trans = np.asarray(trans, dtype=np.float32)
    T = trans.shape[0]
    ns = int(round(np.sqrt(trans.shape[1])))
    curr = np.zeros(ns, dtype=np.float32)
    tb = np.zeros((T, ns), dtype=np.int32)
    for t in range(T):
        prev = curr.copy()
        m = trans[t].reshape(ns, ns)  # [to, from]
        cand = m + prev[None, :]
        tb[t] = cand.argmax(1)
        curr = cand.max(1)
    path = np.zeros(T + 1, dtype=np.int32)
    path[T] = int(curr.argmax())
    score = float(curr.max())
    for t in range(T, 0, -1):
        path[t - 1] = tb[t - 1, path[t]]
    return score, path

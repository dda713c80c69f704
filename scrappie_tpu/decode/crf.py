"""CRF decoding: Viterbi and forward-backward posterior, on device.

Behavioural spec: ref src/decode.c:836-1012.  States are {-, A, C, G, T}
(5); transitions [T, 25] with entry [t, st1*5 + st2] = energy of moving
from st2 to st1 at block t (log-space, globally normalised upstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NBASE = 4


@jax.jit
def _crf_viterbi(trans):
    B, T, nsq = trans.shape
    ns = int(round(np.sqrt(nsq)))
    tmat = jnp.moveaxis(trans.reshape(B, T, ns, ns), 1, 0)  # [T, B, to, from]

    def fwd(prev, m):
        cand = m + prev[:, None, :]
        return cand.max(-1), cand.argmax(-1).astype(jnp.int8)

    init = jnp.zeros((B, ns), dtype=trans.dtype)
    final, tbs = jax.lax.scan(fwd, init, tmat)

    last = final.argmax(-1).astype(jnp.int32)
    score = final.max(-1)

    def back(last, tb_t):
        prev_state = jnp.take_along_axis(tb_t, last[:, None], axis=1)[:, 0].astype(jnp.int32)
        return prev_state, last

    first, emitted = jax.lax.scan(back, last, tbs, reverse=True)
    # emitted[t] = path[t+1]; prepend path[0]
    path = jnp.concatenate([first[:, None], jnp.moveaxis(emitted, 0, 1)], axis=1)
    return score, path


def decode_crf(trans):
    """Viterbi decode of CRF transitions (ref decode_crf, src/decode.c:836-893).

    trans [T, ns^2] or [B, T, ns^2] -> (score, path [.., T+1] int32).
    """
    squeeze = trans.ndim == 2
    t = jnp.asarray(trans, dtype=jnp.float32)
    if squeeze:
        t = t[None]
    score, path = _crf_viterbi(t)
    if squeeze:
        return float(score[0]), np.asarray(path[0])
    return np.asarray(score), np.asarray(path)


@jax.jit
def _crf_posterior(trans):
    B, T, nsq = trans.shape
    ns = int(round(np.sqrt(nsq)))
    tmat = jnp.moveaxis(trans.reshape(B, T, ns, ns), 1, 0)  # [T, B, to, from]

    def fwd(prev, m):
        curr = jax.nn.logsumexp(m + prev[:, None, :], axis=-1)
        return curr, curr

    init = jnp.zeros((B, ns), dtype=trans.dtype)
    _, fwds = jax.lax.scan(fwd, init, tmat)
    fwd_all = jnp.concatenate([init[None], fwds], axis=0)  # [T+1, B, ns]

    def bwd(nxt, m):
        # nxt [B, to]; curr[from] = logsumexp over to of (m[to, from] + nxt[to])
        curr = jax.nn.logsumexp(m + nxt[:, :, None], axis=-2)
        return curr, curr

    _, bwds = jax.lax.scan(bwd, init, tmat, reverse=True)
    bwd_all = jnp.concatenate([bwds, init[None]], axis=0)  # [T+1, B, ns]

    logpost = fwd_all + bwd_all
    post = jax.nn.softmax(logpost, axis=-1)
    return jnp.moveaxis(post, 0, 1)  # [B, T+1, ns]


def posterior_crf(trans):
    """Forward-backward state posterior (ref posterior_crf, src/decode.c:928-1012).

    trans [T, ns^2] or [B, T, ns^2] -> probabilities [.., T+1, ns], one row
    per block boundary.
    """
    squeeze = trans.ndim == 2
    t = jnp.asarray(trans, dtype=jnp.float32)
    if squeeze:
        t = t[None]
    post = _crf_posterior(t)
    return np.asarray(post[0]) if squeeze else np.asarray(post)


def crfpath_to_basecall(path, pos_out: np.ndarray | None = None) -> str:
    """Emit a base for every non-'-' state in the path.

    (ref crfpath_to_basecall, src/decode.c:895-918).  The reference's
    state order is (-, A, C, G, T)?  No: states < NBASE emit bases, the
    last state is the blank; base_lookup = ACGT.
    """
    path = np.asarray(path)
    bases = np.array(list("ACGT"))
    emit = path < NBASE
    seq = "".join(bases[path[emit]])
    if pos_out is not None:
        # pos[i] = index into basecall after block i (mirrors reference fill)
        np.cumsum(emit, out=pos_out[: len(path)])
        pos_out[: len(path)] -= 1
    return seq

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


@jax.jit
def _crf_viterbi_assoc(trans):
    """Parallel-in-time CRF Viterbi via max-plus matrix prefix products.

    The 5-state transition matrices form a (max, +) semiring;
    jax.lax.associative_scan composes them in O(log T) depth, so the
    decode parallelises across the whole time axis instead of a
    2000-step sequential scan — the associative-scan formulation from
    SURVEY.md §7.  Scores can differ from the sequential scan by float
    reassociation ulps; paths agree except on exact ties.
    """
    B, T, nsq = trans.shape
    ns = int(round(np.sqrt(nsq)))
    tmat = trans.reshape(B, T, ns, ns)  # [B, T, to, from]

    def compose(a, b):
        # (b after a)[to, from] = max_k b[to, k] + a[k, from]
        return (b[..., :, :, None] + a[..., None, :, :]).max(-2)

    prefix = jax.lax.associative_scan(compose, tmat, axis=1)
    alpha = jnp.concatenate(
        [jnp.zeros((B, 1, ns), trans.dtype), prefix.max(-1)], axis=1
    )  # [B, T+1, to]; init is the zero vector, so alpha_t = max_from P_t

    final = alpha[:, T]
    score = final.max(-1)
    last = final.argmax(-1).astype(jnp.int32)

    # Per-step backpointers from the alphas, computed for all t at once.
    bt = (tmat + alpha[:, :T, None, :]).argmax(-1).astype(jnp.int32)  # [B,T,to]

    # Backtrace by suffix composition of the pointer maps:
    # C_t = bt_t o bt_{t+1} o ... o bt_T, then path_{t-1} = C_t[last].
    # NB: with reverse=True, associative_scan passes combine(later, earlier),
    # so the composition is written operand-swapped.
    def compose_maps(g, f):
        return jnp.take_along_axis(f, g, axis=-1)

    C = jax.lax.associative_scan(compose_maps, bt, axis=1, reverse=True)
    idx = jnp.broadcast_to(last[:, None, None], (B, T, 1))
    body = jnp.take_along_axis(C, idx, axis=-1)[..., 0]  # path_0 .. path_{T-1}
    path = jnp.concatenate([body, last[:, None]], axis=1)
    return score, path


def decode_crf(trans, impl: str | None = None, emit_bias: float = 0.0):
    """Viterbi decode of CRF transitions (ref decode_crf, src/decode.c:836-893).

    trans [T, ns^2] or [B, T, ns^2] -> (score, path [.., T+1] int32).
    impl: 'scan' (sequential, reference semantics), 'assoc'
    (parallel-in-time associative scan), 'kernel' (Pallas streamed
    scan, ops/crf.py — identical paths incl. ties to 'scan'), or
    None = assoc on TPU for small batches, scan otherwise.

    emit_bias: additive decode-time calibration on every transition
    INTO an emitting state (entry [t, st1*ns+st2] with st1 < ns-1).
    Viterbi is invariant to multiplicative temperature on a CRF (all
    path scores scale together), so the calibration knob that actually
    moves the decode — the analogue of the transducer's stay_pen and of
    the reference's softmax-temperature rescaling
    (misc/alter_temperature.py) — is this additive emit/stay prior;
    negative values call fewer bases.  Default 0.0 = reference
    semantics.
    """
    from scrappie_tpu import ops

    squeeze = trans.ndim == 2
    t = jnp.asarray(trans, dtype=jnp.float32)
    if squeeze:
        t = t[None]
    if emit_bias:
        ns = int(round(np.sqrt(t.shape[-1])))
        t = t.at[..., : (ns - 1) * ns].add(jnp.float32(emit_bias))
    if impl is None:
        # On TPU the Pallas streamed scan wins at every batch size (and
        # matches 'scan' exactly, ties included); off-TPU the kernel
        # only runs in slow interpret mode, so use the lax.scan program.
        impl = "kernel" if ops.on_tpu() else "scan"
    if impl == "kernel":
        from scrappie_tpu.ops.crf import crf_viterbi_kernel

        score, path = crf_viterbi_kernel(t)
    else:
        score, path = (_crf_viterbi_assoc if impl == "assoc"
                       else _crf_viterbi)(t)
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


@jax.jit
def _crf_posterior_assoc(trans):
    """Parallel-in-time forward-backward via (logsumexp, +) semiring
    prefix/suffix matrix products (see _crf_viterbi_assoc)."""
    B, T, nsq = trans.shape
    ns = int(round(np.sqrt(nsq)))
    tmat = trans.reshape(B, T, ns, ns)  # [B, T, to, from]

    def compose(a, b):
        return jax.nn.logsumexp(b[..., :, :, None] + a[..., None, :, :],
                                axis=-2)

    def compose_rev(b, a):
        # reverse=True passes combine(later, earlier): swap back.
        return jax.nn.logsumexp(b[..., :, :, None] + a[..., None, :, :],
                                axis=-2)

    zero = jnp.zeros((B, 1, ns), trans.dtype)
    prefix = jax.lax.associative_scan(compose, tmat, axis=1)
    fwd_all = jnp.concatenate(
        [zero, jax.nn.logsumexp(prefix, axis=-1)], axis=1)      # [B, T+1, to]
    suffix = jax.lax.associative_scan(compose_rev, tmat, axis=1, reverse=True)
    bwd_all = jnp.concatenate(
        [jax.nn.logsumexp(suffix, axis=-2), zero], axis=1)      # [B, T+1, from]
    return jax.nn.softmax(fwd_all + bwd_all, axis=-1)


def posterior_crf(trans, impl: str | None = None):
    """Forward-backward state posterior (ref posterior_crf, src/decode.c:928-1012).

    trans [T, ns^2] or [B, T, ns^2] -> probabilities [.., T+1, ns], one row
    per block boundary.  impl as in decode_crf.
    """
    from scrappie_tpu import ops

    squeeze = trans.ndim == 2
    t = jnp.asarray(trans, dtype=jnp.float32)
    if squeeze:
        t = t[None]
    if impl is None:
        impl = "assoc" if ops.on_tpu() else "scan"
    post = (_crf_posterior_assoc if impl == "assoc" else _crf_posterior)(t)
    return np.asarray(post[0]) if squeeze else np.asarray(post)


def crfpath_to_basecall(path, pos_out: np.ndarray | None = None,
                        npos: int | None = None) -> str:
    """Emit a base for every emitting state in the path.

    (ref crfpath_to_basecall, src/decode.c:895-918).  States 0..3 emit
    A/C/G/T; the last state (4) is the blank and emits nothing.

    npos: number of leading path entries consumed; defaults to
    len(path) - 1 because the reference passes npos=nblock for the
    (nblock+1)-entry Viterbi path (ref src/scrappie_raw.c:306), i.e.
    the final entry never emits.
    """
    path = np.asarray(path)
    path = path[: len(path) - 1 if npos is None else npos]
    bases = np.array(list("ACGT"))
    emit = path < NBASE
    seq = "".join(bases[path[emit]])
    if pos_out is not None:
        # pos[i] = index into basecall after block i.  The reference
        # leaves the CRF pos array caller-zeroed (its int* pos argument
        # is shadowed by the loop variable and never written,
        # ref src/decode.c:895-918); filling it is our extension, so
        # fill it completely: trailing boundaries (the final path entry
        # never emits) carry the last emitted index.
        np.cumsum(emit, out=pos_out[: len(path)])
        pos_out[: len(path)] -= 1
        if len(path) and len(pos_out) > len(path):
            pos_out[len(path):] = pos_out[len(path) - 1]
    return seq

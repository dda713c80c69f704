"""Neural-net layer zoo as pure jnp functions over parameter pytrees.

Behavioural spec: ref src/layers.c.  Differences from the reference are
architectural, not semantic:
  * arrays are time-major [..., T, C] instead of column-major matrices;
  * everything is batched — a leading batch axis works throughout
    (the reference processes one read at a time);
  * convolutions use XLA's fused conv op instead of strided GEMM tricks.

All functions are jit-safe (static shapes, no Python control flow on
traced values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scrappie_tpu.nn.config import get_precision, pconv_operands, pdot
import numpy as np


def elu(x):
    """ELU activation (ref src/util.h:67-69).

    The untaken expm1 branch is clamped so its VJP stays finite: for
    x >= ~88.7 the raw form's gradient is 0 * exp(x) = NaN, which would
    poison training of the elu models after one outlier pre-activation.
    """
    return jnp.where(x >= 0, x, jnp.expm1(jnp.minimum(x, 0.0)))


def robustlog(x, min_prob: float):
    """log(min_prob/nrow + (1-min_prob)*x) applied along the last axis.

    (ref src/layers.c:79-94)
    """
    nrow = x.shape[-1]
    return jnp.log(min_prob / nrow + (1.0 - min_prob) * x)


def feedforward(x, W, b):
    """Affine map y = x @ W + b (ref affine_map, src/scrappie_matrix.c:323)."""
    return pdot(x, W) + b


def feedforward2_tanh(xf, xb, Wf, Wb, b):
    """tanh(xf @ Wf + xb @ Wb + b) — combine bidirectional RNN outputs.

    (ref affine_map2 + tanh, src/scrappie_matrix.c:353 / layers.c:359)
    """
    return jnp.tanh(
        pdot(xf, Wf)
        + pdot(xb, Wb)
        + b
    )


def embedding(seq, E):
    """Row lookup: seq [..., N] int -> [..., N, width] (ref src/layers.c:97)."""
    return jnp.take(E, seq, axis=0)


def conv_same_pad(T: int, winlen: int, stride: int) -> tuple[int, int]:
    """Padding that reproduces the reference convolution geometry.

    Output column c covers input [c*stride - padL, c*stride - padL + winlen)
    with padL = (winlen-1)//2, and there are exactly ceil(T/stride) output
    columns (ref src/layers.c:159-246).
    """
    padL = (winlen - 1) // 2
    ncol = -(-T // stride)
    padR = (ncol - 1) * stride + winlen - padL - T
    return padL, padR


def conv1d(x, W, b, stride: int):
    """1-D convolution, reference geometry; x [..., T, Cin] -> [..., ceil(T/s), Cout].

    W is [winlen, Cin, Cout].
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    winlen = W.shape[0]
    padL, padR = conv_same_pad(x.shape[-2], winlen, stride)
    x, W = pconv_operands(x, W)
    out = jax.lax.conv_general_dilated(
        x,
        W,
        window_strides=(stride,),
        padding=[(padL, padR)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=get_precision(),
    )
    out = out + b
    return out[0] if squeeze else out


def window(x, w: int, stride: int):
    """Stack w adjacent frames (zero padded), subsample by stride.

    x [..., T, C] -> [..., ceil(T/stride), w*C]; geometry per ref
    src/layers.c:119-146 (window centred with wh = (w+1)//2).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    T = x.shape[-2]
    C = x.shape[-1]
    wh = (w + 1) // 2
    ncol = -(-T // stride)
    cols = []
    for col_off in range(w):
        # Input index for output col c, slot i: c*stride - wh + 1 + i
        idx = jnp.arange(ncol) * stride - wh + 1 + col_off
        valid = (idx >= 0) & (idx < T)
        gathered = jnp.take(x, jnp.clip(idx, 0, T - 1), axis=-2)
        cols.append(jnp.where(valid[:, None], gathered, 0.0))
    out = jnp.concatenate(cols, axis=-1)
    return out[0] if squeeze else out


def softmax_with_temperature(x, W, b, tempW: float = 1.0, tempb: float = 1.0):
    """softmax(x @ W / tempW + b / tempb), computed exactly as the reference:
    softmax(((x * tempb/tempW) @ W + b) / tempb) (ref src/layers.c:333-357).
    """
    y = feedforward(x * (tempb / tempW), W, b) / tempb
    return jax.nn.softmax(y, axis=-1)


def crf_partition_function(trans):
    """Log partition function of the linear CRF (ref src/layers.c:835-871).

    trans [..., T, nstate*nstate]; entry [t, st1*nstate + st2] is the
    energy of moving st2 -> st1 at block t.  Returns scalar logZ (batched
    over leading axes).
    """
    nstate = int(np.sqrt(trans.shape[-1]))
    assert nstate * nstate == trans.shape[-1]
    squeeze = trans.ndim == 2
    if squeeze:
        trans = trans[None]
    B = trans.shape[0]
    tmat = trans.reshape(B, -1, nstate, nstate)  # [B, T, to, from]

    def step(prev, t):
        # prev [B, from]; logsumexp over the from-axis
        curr = jax.nn.logsumexp(t + prev[:, None, :], axis=-1)
        return curr, None

    init = jnp.zeros((B, nstate), dtype=trans.dtype)
    final, _ = jax.lax.scan(step, init, jnp.moveaxis(tmat, 1, 0))
    logZ = jax.nn.logsumexp(final, axis=-1)
    return logZ[0] if squeeze else logZ


def globalnorm(x, W, b):
    """Affine map followed by global CRF normalisation (ref src/layers.c:874-889)."""
    trans = feedforward(x, W, b)
    T = trans.shape[-2]
    logZ = crf_partition_function(trans) / T
    return trans - logZ[..., None, None] if trans.ndim == 3 else trans - logZ

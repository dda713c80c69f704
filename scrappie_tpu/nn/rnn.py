"""Recurrent layers as batched lax.scan programs.

Behavioural spec: ref src/layers.c:373-832.  Design notes (TPU-first):

  * The input projection iW·x + b for the whole sequence is one large
    GEMM done by the caller (`feedforward`), exactly as the reference
    splits `feedforward_linear` + `gru_*` — but here it is batched over
    reads/chunks, so the MXU sees [B*T, in] @ [in, 3S].
  * The recurrent step runs under lax.scan over time.  With a batch
    axis the per-step recurrences are [B, S] @ [S, kS] GEMMs — MXU work
    rather than the reference's per-step GEMVs.
  * Backward direction = flip time, scan, flip back.

Gate conventions (scrappie GRU, ref gru_step src/layers.c:472-527):
  x ........ precomputed iW·x + b, [.., 3S] blocks (z | r | hbar-input)
  z, r ..... logistic(x[:2S] + h @ sW), sW [S, 2S]
  hbar ..... tanh(x[2S:] + (r*h) @ sW2), sW2 [S, S]
  h' ....... z*h + (1-z)*hbar          (z gates the OLD state)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scrappie_tpu.nn.config import pdot


def _scan_time_major(step, x, h0, reverse: bool):
    """Scan over axis -2 of x (batched), returning stacked outputs."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    xt = jnp.moveaxis(x, 1, 0)  # [T, B, C]
    _, ys = jax.lax.scan(step, h0(x.shape[0]), xt, reverse=reverse)
    ys = jnp.moveaxis(ys, 0, 1)
    return ys[0] if squeeze else ys


def gru(x, sW, sW2, reverse: bool = False):
    """GRU over precomputed input projections x [..., T, 3S] -> [..., T, S]."""
    size = sW2.shape[1]

    def step(h, xt):
        zr = jax.nn.sigmoid(xt[..., : 2 * size] + pdot(h, sW))
        z = zr[..., :size]
        r = zr[..., size:]
        hbar = jnp.tanh(
            xt[..., 2 * size :] + pdot(r * h, sW2)
        )
        h_new = z * h + (1 - z) * hbar
        return h_new, h_new

    return _scan_time_major(step, x, lambda B: jnp.zeros((B, size), x.dtype), reverse)


def grumod(x, sW, reverse: bool = False):
    """Modified GRU (ref grumod_step src/layers.c:620-671).

    Single recurrent matrix sW [S, 3S]; r gates the recurrent part of the
    hbar pre-activation rather than the state:
        z, r   = logistic(x[:2S] + (h @ sW)[:2S])
        hbar   = tanh(r * (h @ sW)[2S:] + x[2S:])
        h'     = z*h + (1-z)*hbar
    """
    size = sW.shape[0]

    def step(h, xt):
        rec = pdot(h, sW)
        zr = jax.nn.sigmoid(xt[..., : 2 * size] + rec[..., : 2 * size])
        z = zr[..., :size]
        r = zr[..., size:]
        hbar = jnp.tanh(r * rec[..., 2 * size :] + xt[..., 2 * size :])
        h_new = z * h + (1 - z) * hbar
        return h_new, h_new

    return _scan_time_major(step, x, lambda B: jnp.zeros((B, size), x.dtype), reverse)


def lstm(x, sW, peep, reverse: bool = False):
    """Peephole LSTM over precomputed input projections x [..., T, 4S].

    Gate layout in the 4S axis (ref lstm_step src/layers.c:777-832):
    [cell-input (tanh) | input gate | forget gate | output gate]; peep
    [3S] = [input | forget | output] peephole weights on the cell state.
    """
    size = sW.shape[0]
    p_in = peep[:size]
    p_forget = peep[size : 2 * size]
    p_out = peep[2 * size :]

    def step(carry, xt):
        h, c = carry
        xF = xt + pdot(h, sW)
        forget = jax.nn.sigmoid(xF[..., 2 * size : 3 * size] + c * p_forget) * c
        update = jax.nn.sigmoid(xF[..., size : 2 * size] + c * p_in) * jnp.tanh(
            xF[..., :size]
        )
        c_new = forget + update
        h_new = jax.nn.sigmoid(xF[..., 3 * size :] + c_new * p_out) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    xt = jnp.moveaxis(x, 1, 0)
    B = x.shape[0]
    init = (jnp.zeros((B, size), x.dtype), jnp.zeros((B, size), x.dtype))
    _, ys = jax.lax.scan(step, init, xt, reverse=reverse)
    ys = jnp.moveaxis(ys, 0, 1)
    return ys[0] if squeeze else ys

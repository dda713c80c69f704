"""Pallas TPU kernel for the peephole-LSTM recurrence (events model).

Behavioural spec: ref lstm_step src/layers.c:777-832 and nn/rnn.py.
Same architecture as ops/gru.py: the input projection runs in-kernel
against VMEM-resident weights (one MXU call per CT-step block), the
(h, c) state lives in VMEM scratch, and x/y blocks stream through the
grid pipeline.  Gate layout in the 4S axis: [cell-input (tanh) | input
gate | forget gate | output gate]; peephole weights [3S] = [input |
forget | output] act on the cell state.

Zero padding is self-consistent: with zero weights/inputs/peepholes in
the pad lanes, c_pad' = sigmoid(0)*0 + sigmoid(0)*tanh(0) = 0 and
h_pad' = sigmoid(0)*tanh(0) = 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrappie_tpu.ops import interpret_mode
from scrappie_tpu.ops import resolve_precision as _resolve_precision
from scrappie_tpu.ops.gru import LANE, _pick_batch_tile, _round_up


def pad_lstm_params(iW, b, sW, peep, in_pad: int | None = None):
    """Pad LSTM weights to lane-aligned gate blocks (cf. pad_gru_params).

    iW [in, 4S], b [4S], sW [S, 4S], peep [3S] ->
    iWp [in_pad, 4Sp], bp [4Sp], sWp [Sp, 4Sp], peepp [3Sp]."""
    S = sW.shape[0]
    Sp = _round_up(S, LANE)
    dS = Sp - S

    def pad_gates(a, ngate):
        blocks = jnp.split(a, ngate, axis=-1)
        padw = [(0, 0)] * (a.ndim - 1) + [(0, dS)]
        return jnp.concatenate([jnp.pad(x, padw) for x in blocks], axis=-1)

    iWp = pad_gates(iW, 4)
    bp = pad_gates(b, 4)
    sWp = jnp.pad(pad_gates(sW, 4), ((0, dS), (0, 0)))
    peepp = pad_gates(peep, 3)
    if in_pad is not None and in_pad > iWp.shape[0]:
        iWp = jnp.pad(iWp, ((0, in_pad - iWp.shape[0]), (0, 0)))
    return iWp, bp, sWp, peepp


def _lstm_kernel(x_ref, iW_ref, b_ref, sW_ref, pin_ref, pforget_ref,
                 pout_ref, y_ref, h_ref, c_ref, *, S, CT, reverse, prec=None):
    # The peephole vector is passed as three separate (1, Sp) inputs:
    # Mosaic cannot broadcast a lane-slice of a (1, 3Sp) vector.
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]
    c = c_ref[:]
    bb = b_ref[:]
    sW = sW_ref[:]
    p_in = pin_ref[:]
    p_forget = pforget_ref[:]
    p_out = pout_ref[:]

    CTB = x_ref.shape[0] * x_ref.shape[1]
    xproj = jnp.dot(x_ref[:].reshape(CTB, x_ref.shape[2]), iW_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=prec or jax.lax.Precision.HIGHEST)
    xproj = xproj.reshape(x_ref.shape[0], x_ref.shape[1], 4 * S)

    steps = range(CT - 1, -1, -1) if reverse else range(CT)
    for i in steps:
        xF = xproj[i] + bb + jnp.dot(h, sW,
                                     preferred_element_type=jnp.float32,
                                     precision=prec or jax.lax.Precision.HIGHEST)
        forget = jax.nn.sigmoid(xF[:, 2 * S : 3 * S] + c * p_forget) * c
        update = jax.nn.sigmoid(xF[:, S : 2 * S] + c * p_in) * jnp.tanh(
            xF[:, :S])
        c = forget + update
        h = jax.nn.sigmoid(xF[:, 3 * S :] + c * p_out) * jnp.tanh(c)
        y_ref[i] = h
    h_ref[:] = h
    c_ref[:] = c


@functools.partial(jax.jit,
                   static_argnames=("reverse", "interpret", "ct", "prec_name"))
def lstm_layer_fused_tm(x_tm, iWp, bp, sWp, peepp, reverse: bool = False,
                        interpret: bool | None = None, ct: int = 8,
                        prec_name: str | None = None):
    """Fused peephole-LSTM layer on lane-padded time-major features.

    x_tm [T, B, C] (C a multiple of 128, pad lanes zero), iWp [C, 4Sp],
    bp [4Sp], sWp [Sp, 4Sp], peepp [3Sp] -> h [T, B, Sp].
    """
    if interpret is None:
        interpret = interpret_mode()
    T, B, C = x_tm.shape
    Sp = sWp.shape[0]
    assert C % LANE == 0 and Sp % LANE == 0 and B % 8 == 0
    assert iWp.shape == (C, 4 * Sp)
    if T == 0:
        return jnp.zeros((0, B, Sp), jnp.float32)
    Bt = _pick_batch_tile(B)
    nbt = B // Bt

    CT = min(ct, T)
    tpad = (-T) % CT
    if tpad:
        # Pad on the side visited last (in-kernel bias => pad steps
        # pollute the state; see gru_layer_fused_tm).
        if reverse:
            x_tm = jnp.pad(x_tm, ((tpad, 0), (0, 0), (0, 0)))
        else:
            x_tm = jnp.pad(x_tm, ((0, tpad), (0, 0), (0, 0)))
    Tp = T + tpad
    nt = Tp // CT

    if reverse:
        tidx = lambda b, t: (nt - 1 - t, b, 0)
    else:
        tidx = lambda b, t: (t, b, 0)
    cidx = lambda b, t: (0, 0)
    y = pl.pallas_call(
        functools.partial(_lstm_kernel, S=Sp, CT=CT, reverse=reverse,
                          prec=_resolve_precision(prec_name)),
        grid=(nbt, nt),
        in_specs=[
            pl.BlockSpec((CT, Bt, C), tidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 4 * Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, 4 * Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp), cidx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CT, Bt, Sp), tidx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, Sp), jnp.float32),
                        pltpu.VMEM((Bt, Sp), jnp.float32)],
        interpret=interpret,
    )(x_tm, iWp, bp.reshape(1, -1), sWp,
      peepp[:Sp].reshape(1, -1), peepp[Sp : 2 * Sp].reshape(1, -1),
      peepp[2 * Sp :].reshape(1, -1))
    if tpad:
        y = y[tpad:] if reverse else y[:T]
    return y


def lstm_layer_tm(x_tm, iW, b, sW, peep, reverse: bool = False):
    """Full LSTM layer on time-major features: pads weights and runs the
    fused kernel.  x_tm [T, B, C] (C may exceed iW rows with zero pad)."""
    C = x_tm.shape[-1]
    Cp = _round_up(C, LANE)
    if Cp != C:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, 0), (0, Cp - C)))
    iWp, bp, sWp, peepp = pad_lstm_params(iW, b, sW, peep, in_pad=Cp)
    from scrappie_tpu.ops import kernel_precision_name

    return lstm_layer_fused_tm(x_tm, iWp, bp, sWp, peepp, reverse=reverse,
                               prec_name=kernel_precision_name())

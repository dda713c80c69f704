"""Pallas TPU kernel for the GRU recurrence (hot loop of every raw model).

Behavioural spec: ref gru_step src/layers.c:472-527 and nn/rnn.py.
Two kernels: gru_tm_padded runs only the sequential part over
pre-projected inputs; gru_layer_fused_tm (the production path) also
performs the input projection in-kernel.  The recurrence:

    zr   = sigmoid(x[:, :2S] + h @ sW)
    hbar = tanh(x[:, 2S:] + ((r * h) @ sW2))
    h'   = z*h + (1-z)*hbar

over a time-major [T, B, 3S] input.  The hidden state h lives in a
VMEM scratch block for the whole scan; x/y blocks stream through the
grid pipeline.  A backward pass is the same kernel with a reversed
time index map.

Shapes are lane-padded: S (hidden) is padded to a multiple of 128 and
the three gate blocks of x sit at padded offsets, so every slice in the
kernel is tile-aligned.  Zero padding is self-consistent: with zero
weights/inputs in the pad, z_pad = 0.5, hbar_pad = tanh(0) = 0, so
h_pad stays exactly 0 for all t.  `pad_gru_params` prepares padded
weights from the registry layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scrappie_tpu.ops import LANE, interpret_mode
from scrappie_tpu.ops import pick_batch_tile as _pick_batch_tile
from scrappie_tpu.ops import resolve_precision as _resolve_precision
from scrappie_tpu.ops import round_up as _round_up


def pad_gru_params(iW, b, sW, sW2, in_pad: int | None = None):
    """Pad GRU weights to lane-aligned gate blocks.

    iW [in, 3S], b [3S], sW [S, 2S], sW2 [S, S] ->
    iWp [in_pad, 3Sp], bp [3Sp], sWp [Sp, 2Sp], sW2p [Sp, Sp]
    with Sp = round_up(S, 128) and each gate block zero-padded S -> Sp.
    in_pad pads the input-feature axis (for chaining padded layers).
    """
    S = sW2.shape[0]
    Sp = _round_up(S, LANE)
    dS = Sp - S

    def pad_gates(a, ngate):
        # split last axis into ngate blocks of S, pad each to Sp
        blocks = jnp.split(a, ngate, axis=-1)
        padw = [(0, 0)] * (a.ndim - 1) + [(0, dS)]
        return jnp.concatenate([jnp.pad(x, padw) for x in blocks], axis=-1)

    iWp = pad_gates(iW, 3)
    bp = pad_gates(b, 3)
    sWp = jnp.pad(pad_gates(sW, 2), ((0, dS), (0, 0)))
    sW2p = jnp.pad(sW2, ((0, dS), (0, dS)))
    if in_pad is not None and in_pad > iWp.shape[0]:
        iWp = jnp.pad(iWp, ((0, in_pad - iWp.shape[0]), (0, 0)))
    return iWp, bp, sWp, sW2p


def _gru_kernel(x_ref, sW_ref, sW2_ref, y_ref, h_ref, *, S, CT, reverse,
                prec=None):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    sW = sW_ref[:]
    sW2 = sW2_ref[:]
    steps = range(CT - 1, -1, -1) if reverse else range(CT)
    for i in steps:  # static unroll: CT sequential steps per grid step
        xt = x_ref[i]
        rec = jnp.dot(h, sW, preferred_element_type=jnp.float32,
                      precision=prec or jax.lax.Precision.HIGHEST)
        zr = jax.nn.sigmoid(xt[:, : 2 * S] + rec)
        z = zr[:, :S]
        r = zr[:, S:]
        hbar = jnp.tanh(xt[:, 2 * S :]
                        + jnp.dot(r * h, sW2,
                                  preferred_element_type=jnp.float32,
                                  precision=prec or jax.lax.Precision.HIGHEST))
        h = z * h + (1 - z) * hbar
        y_ref[i] = h
    h_ref[:] = h


@functools.partial(jax.jit,
                   static_argnames=("reverse", "interpret", "ct", "prec_name"))
def gru_tm_padded(x_tm, sWp, sW2p, reverse: bool = False,
                  interpret: bool | None = None, ct: int = 8,
                  prec_name: str | None = None):
    """GRU scan over padded time-major inputs.

    x_tm [T, B, 3Sp] (precomputed iWp.x + bp, lane-padded gate blocks),
    sWp [Sp, 2Sp], sW2p [Sp, Sp] -> h [T, B, Sp].  B must be a multiple
    of 8 (the caller batches/pads).

    ct time steps are processed per grid step (statically unrolled) to
    amortise grid/DMA overhead; the time axis is zero-padded up to a
    multiple (zero gate inputs keep h exactly unchanged at zero-state,
    and for the reverse direction the pad runs first from h = 0, which
    stays 0 for the same reason).
    """
    if interpret is None:
        interpret = interpret_mode()
    T, B, threeS = x_tm.shape
    Sp = sW2p.shape[0]
    assert threeS == 3 * Sp and Sp % LANE == 0 and B % 8 == 0
    if T == 0:
        return jnp.zeros((0, B, Sp), jnp.float32)
    Bt = _pick_batch_tile(B)
    nbt = B // Bt

    CT = min(ct, T)
    tpad = (-T) % CT
    if tpad:
        x_tm = jnp.pad(x_tm, ((0, tpad), (0, 0), (0, 0)))
    Tp = T + tpad
    nt = Tp // CT

    if reverse:
        tidx = lambda b, t: (nt - 1 - t, b, 0)
    else:
        tidx = lambda b, t: (t, b, 0)
    y = pl.pallas_call(
        functools.partial(_gru_kernel, S=Sp, CT=CT, reverse=reverse,
                          prec=_resolve_precision(prec_name)),
        grid=(nbt, nt),
        in_specs=[
            pl.BlockSpec((CT, Bt, 3 * Sp), tidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, 2 * Sp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Sp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CT, Bt, Sp), tidx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, Sp), jnp.float32)],
        interpret=interpret,
    )(x_tm, sWp, sW2p)
    return y[:T] if tpad else y


def _gru_fused_kernel(x_ref, iW_ref, b_ref, sW_ref, sW2_ref, y_ref, h_ref,
                      *, S, CT, reverse, prec=None):
    """GRU layer with the input projection fused into the scan: per step
    xin = x@iW + b runs on the MXU against the VMEM-resident weights,
    so the [T, B, 3S] projected activations never touch HBM (3x less
    traffic than projecting in XLA, and Mosaic's in-kernel HIGHEST
    matmuls are far faster than XLA's f32 GEMM lowering here)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    bb = b_ref[:]
    sW = sW_ref[:]
    sW2 = sW2_ref[:]
    # Project all CT steps in one MXU call (the projection does not
    # depend on h, so it needn't serialise with the recurrence).
    CTB = x_ref.shape[0] * x_ref.shape[1]
    xproj = jnp.dot(x_ref[:].reshape(CTB, x_ref.shape[2]), iW_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=prec or jax.lax.Precision.HIGHEST)
    xproj = xproj.reshape(x_ref.shape[0], x_ref.shape[1], 3 * S)
    steps = range(CT - 1, -1, -1) if reverse else range(CT)
    for i in steps:
        xt = xproj[i] + bb
        rec = jnp.dot(h, sW, preferred_element_type=jnp.float32,
                      precision=prec or jax.lax.Precision.HIGHEST)
        zr = jax.nn.sigmoid(xt[:, : 2 * S] + rec)
        z = zr[:, :S]
        r = zr[:, S:]
        hbar = jnp.tanh(xt[:, 2 * S :]
                        + jnp.dot(r * h, sW2,
                                  preferred_element_type=jnp.float32,
                                  precision=prec or jax.lax.Precision.HIGHEST))
        h = z * h + (1 - z) * hbar
        y_ref[i] = h
    h_ref[:] = h


@functools.partial(jax.jit,
                   static_argnames=("reverse", "interpret", "ct", "prec_name"))
def gru_layer_fused_tm(x_tm, iWp, bp, sWp, sW2p, reverse: bool = False,
                       interpret: bool | None = None, ct: int = 8,
                       prec_name: str | None = None):
    """Fused GRU layer on lane-padded time-major features.

    x_tm [T, B, C] (C a multiple of 128, pad lanes zero), iWp [C, 3Sp],
    bp [3Sp], sWp [Sp, 2Sp], sW2p [Sp, Sp] -> h [T, B, Sp].
    """
    if interpret is None:
        interpret = interpret_mode()
    T, B, C = x_tm.shape
    Sp = sW2p.shape[0]
    assert C % LANE == 0 and Sp % LANE == 0 and B % 8 == 0
    assert iWp.shape == (C, 3 * Sp)
    if T == 0:
        return jnp.zeros((0, B, Sp), jnp.float32)
    Bt = _pick_batch_tile(B)
    nbt = B // Bt

    CT = min(ct, T)
    tpad = (-T) % CT
    if tpad:
        # The in-kernel projection adds the bias, so padded time steps
        # do NOT keep h at zero — pad on the side that the scan visits
        # last (after every valid step), so only pad outputs see the
        # polluted state, and slice them off.
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
        functools.partial(_gru_fused_kernel, S=Sp, CT=CT, reverse=reverse,
                          prec=_resolve_precision(prec_name)),
        grid=(nbt, nt),
        in_specs=[
            pl.BlockSpec((CT, Bt, C), tidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, 2 * Sp), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, Sp), cidx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CT, Bt, Sp), tidx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, Sp), jnp.float32)],
        interpret=interpret,
    )(x_tm, iWp, bp.reshape(1, -1), sWp, sW2p)
    if tpad:
        y = y[tpad:] if reverse else y[:T]
    return y


def gru_layer_tm(x_tm, iW, b, sW, sW2, reverse: bool = False,
                 prec_name: str | None = None):
    """Full GRU layer on time-major features: projection GEMM + scan.

    x_tm [T, B, C] where C may already be lane-padded relative to
    iW.shape[0] (extra features must be zero); returns [T, B, Sp]
    (lane-padded hidden, pad lanes exactly zero).

    prec_name: kernel matmul precision; None reads the global policy AT
    TRACE TIME — callers that jit around this function must pass it as
    their own static argument or precision changes will not retrace.
    """
    C = x_tm.shape[-1]
    Cp = _round_up(C, LANE)
    if Cp != C:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, 0), (0, Cp - C)))
    iWp, bp, sWp, sW2p = pad_gru_params(iW, b, sW, sW2, in_pad=Cp)
    if prec_name is None:
        from scrappie_tpu.ops import kernel_precision_name

        prec_name = kernel_precision_name()
    return gru_layer_fused_tm(x_tm, iWp, bp, sWp, sW2p, reverse=reverse,
                              prec_name=prec_name)

"""Numeric-precision policy for the compute path.

TPU MXU natively multiplies in bf16 with f32 accumulation; JAX exposes
this as matmul precision.  The reference computes everything in exact
f32 (CBLAS sgemm), so the default here is HIGHEST, which gives
sequence-identical parity.

Modes (set_precision / SCRAPPIE_TPU_PRECISION env var):

  'highest'  exact f32 matmuls everywhere (default; reference parity).
  'default'  the backend's native fast path.  On TPU that is one bf16
             multiply pass with f32 accumulation; on CPU it is plain
             f32 (the flag changes nothing off-TPU).
  'bf16'     explicit MXU-DEFAULT numerics on EVERY backend: matmul and
             conv operands are rounded to bfloat16 before an
             f32-accumulated contraction.  On TPU this compiles to the
             same single-pass MXU op as 'default'; on CPU it reproduces
             those numerics bit-for-bit in the multiply (accumulation
             order may still differ), which is what makes bf16 accuracy
             studies possible without TPU hardware.

All matmuls in the scan compute path go through `pdot` below; the
Pallas kernels pick their in-kernel precision from the same policy via
ops.kernel_precision().

The scan path reads the policy at trace time, so set it before the
first forward of a jitted program (the env var and engine construction
order do this naturally); the fused Pallas wrappers instead pass the
policy through the jit boundary as a static argument and retrace.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_PRECISION = jax.lax.Precision.HIGHEST
_BF16_EMULATE = False


def get_precision() -> jax.lax.Precision:
    return _PRECISION


def bf16_emulation() -> bool:
    """Is the 'bf16' explicit-rounding mode active?"""
    return _BF16_EMULATE


def set_precision(p) -> None:
    """p: 'highest' | 'default' | 'bf16' | jax.lax.Precision."""
    global _PRECISION, _BF16_EMULATE
    if isinstance(p, str):
        name = p.strip().lower()
        if name == "bf16":
            # Kernels and non-pdot consumers see DEFAULT (the matching
            # single-pass MXU precision); pdot additionally rounds the
            # operands so the numerics survive on non-TPU backends.
            _PRECISION = jax.lax.Precision.DEFAULT
            _BF16_EMULATE = True
            return
        _PRECISION = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[name]
    else:
        _PRECISION = p
    _BF16_EMULATE = False


def _round_bf16(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def pdot(x, w):
    """x @ w with f32 accumulation under the global precision policy."""
    if _BF16_EMULATE:
        x, w = _round_bf16(x), _round_bf16(w)
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=_PRECISION)


def pconv_operands(x, w):
    """Apply the policy's operand rounding (bf16 mode) for a conv."""
    if _BF16_EMULATE:
        return _round_bf16(x), _round_bf16(w)
    return x, w


@contextlib.contextmanager
def precision(p):
    old, old_emulate = _PRECISION, _BF16_EMULATE
    set_precision(p)
    try:
        yield
    finally:
        globals()["_PRECISION"] = old
        globals()["_BF16_EMULATE"] = old_emulate


_env = os.environ.get("SCRAPPIE_TPU_PRECISION")
if _env:
    set_precision(_env)
del _env

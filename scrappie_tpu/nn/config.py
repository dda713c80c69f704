"""Numeric-precision policy for the compute path.

TPU MXU natively multiplies in bf16 with f32 accumulation; JAX exposes
this as matmul precision.  The reference computes everything in exact
f32 (CBLAS sgemm), so the default here is HIGHEST, which gives
sequence-identical parity.  Benchmarks may switch to DEFAULT (bf16
passes) for throughput after checking basecall identity.
"""

from __future__ import annotations

import contextlib

import jax

_PRECISION = jax.lax.Precision.HIGHEST


def get_precision() -> jax.lax.Precision:
    return _PRECISION


def set_precision(p) -> None:
    """p: 'highest' | 'default' | jax.lax.Precision."""
    global _PRECISION
    if isinstance(p, str):
        p = {"highest": jax.lax.Precision.HIGHEST, "default": jax.lax.Precision.DEFAULT}[p]
    _PRECISION = p


@contextlib.contextmanager
def precision(p):
    old = get_precision()
    set_precision(p)
    try:
        yield
    finally:
        set_precision(old)

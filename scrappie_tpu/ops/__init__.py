"""Pallas TPU kernels for the hot sequential loops.

The reference's two hot loops — the per-timestep GRU recurrence
(ref src/layers.c:472-527) and the per-block transducer Viterbi update
(ref src/decode.c:162-350) — are latency-bound sequential scans.  The
XLA `lax.scan` versions in nn/rnn.py and decode/transducer.py pay tens
of microseconds of loop machinery per step; these kernels stream
time-major blocks HBM->VMEM through the Pallas grid pipeline (auto
double-buffered) and carry the recurrent state in a VMEM-resident
block, cutting the per-step cost to roughly the DMA time.

Dispatch: `pallas_enabled()` is True on TPU backends (including the
tunnelled 'axon' platform) unless overridden with `set_pallas`.  On CPU
the kernels run only in interpreter mode (tests use tiny shapes).
"""

from __future__ import annotations

import contextlib
import os

import jax

_TPU_PLATFORMS = ("tpu", "axon")

_FORCE: bool | None = None
_env = os.environ.get("SCRAPPIE_TPU_PALLAS")
if _env is not None:
    _FORCE = _env.strip().lower() not in ("", "0", "false", "off", "no")


def on_tpu() -> bool:
    try:
        return jax.default_backend() in _TPU_PLATFORMS
    except RuntimeError:
        return False


def pallas_enabled() -> bool:
    """Should the compute path use the Pallas kernels?"""
    if _FORCE is not None:
        return _FORCE
    return on_tpu()


def set_pallas(value: bool | None) -> None:
    """Force Pallas kernels on/off; None restores auto (on iff TPU)."""
    global _FORCE
    _FORCE = value


@contextlib.contextmanager
def pallas(value: bool | None):
    old = _FORCE
    set_pallas(value)
    try:
        yield
    finally:
        set_pallas(old)


def interpret_mode() -> bool:
    """Pallas interpret=True is needed off-TPU (tests on CPU)."""
    return not on_tpu()


def kernel_precision():
    """Matmul precision for in-kernel dots, from the global policy.

    Mosaic supports only DEFAULT (one bf16 pass) and HIGHEST (six); the
    global HIGH maps to DEFAULT inside kernels.  Exactness-critical
    matmuls (the Viterbi one-hot expansions) ignore this and stay exact.
    """
    import jax

    from scrappie_tpu.nn.config import get_precision

    if get_precision() == jax.lax.Precision.HIGHEST:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def kernel_precision_name() -> str:
    """'highest' or 'default' — pass through jit boundaries as a static
    argument so changing the global policy retraces (a global read at
    trace time would be frozen into the jit cache)."""
    import jax

    return ("highest" if kernel_precision() == jax.lax.Precision.HIGHEST
            else "default")


def resolve_precision(prec_name):
    """None -> HIGHEST (exact).  Deliberately NOT the global policy:
    prec_name is a static jit argument, and resolving a global default
    at trace time would freeze the policy into the jit cache.  Wrappers
    that honour the policy pass kernel_precision_name() explicitly."""
    import jax

    return (jax.lax.Precision.DEFAULT if prec_name == "default"
            else jax.lax.Precision.HIGHEST)


_FAST_EXPAND = os.environ.get("SCRAPPIE_TPU_FAST_EXPAND", "").strip().lower() \
    in ("1", "true", "on", "yes")


def fast_expand_enabled() -> bool:
    """EXPERIMENTAL: 2-chunk (16-bit) Viterbi lane expansions.

    Trades the bit-exact decode-parity guarantee for ~1/3 less expansion
    MXU work (the dominant bf16-path cost, BASELINE.md roofline).  Off
    by default; enable with SCRAPPIE_TPU_FAST_EXPAND=1 or
    set_fast_expand(True) to measure.  See ops/viterbi._expand.
    """
    return _FAST_EXPAND


def set_fast_expand(value: bool) -> None:
    global _FAST_EXPAND
    _FAST_EXPAND = bool(value)


LANE = 128


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_batch_tile(B: int, limit: int = 256) -> int:
    """Largest multiple-of-8 batch tile <= limit that divides B."""
    bt = min(B, limit)
    while B % bt:
        bt -= 8
    return max(bt, 8)

"""SCRAPPIE_TPU_PLATFORM: env override for the JAX backend.

This environment's sitecustomize pins `jax_platforms` itself, so the
plain JAX_PLATFORMS env var is ignored; and a dead device tunnel makes
backend calls hang rather than fail.  Entry points (CLI, embed API,
training/eval scripts) call `apply_platform_override()` before the
first backend use so `SCRAPPIE_TPU_PLATFORM=cpu` reliably pins work to
the host.
"""

from __future__ import annotations

import os

_APPLIED = False


def apply_platform_override() -> None:
    """Apply SCRAPPIE_TPU_PLATFORM (if set) to jax_platforms.

    Must run before any JAX backend initialises; no-op afterwards and
    when the variable is unset.
    """
    global _APPLIED
    if _APPLIED:
        return
    platform = os.environ.get("SCRAPPIE_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    _APPLIED = True

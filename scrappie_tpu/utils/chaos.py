"""Chaos fault injection — the TPU-native analogue of scrappie's
CHAOSMONKEY build (ref src/scrappie_stdlib.h:10-27, CMakeLists.txt:89-99:
malloc returns NULL with probability p; errors propagate via
RETURN_NULL_IF and a failed read only warns, ref src/scrappie_raw.c:397-400).

Here the unreliable resource is not malloc but the ingest/compute
pipeline, so faults are injected at the same boundaries the production
error handling guards: fast5 reads and per-read results.  Enable with

    SCRAPPIE_TPU_CHAOS=0.1   (failure probability, like -DCHAOSMONKEY=p)

or programmatically via `set_chaos(p, seed)`.  `maybe_fail(site)`
raises ChaosError with probability p; callers that must never be
chaos-hit (the reference's BANANA opt-out) simply don't call it.
"""

from __future__ import annotations

import os

import numpy as np


class ChaosError(RuntimeError):
    """Injected failure (never raised unless chaos is enabled)."""


_P = 0.0
_RNG = np.random.default_rng(0)

_env = os.environ.get("SCRAPPIE_TPU_CHAOS")
if _env:
    try:
        _P = float(_env)
    except ValueError:
        import sys

        print(f"SCRAPPIE_TPU_CHAOS={_env!r} is not a number; "
              "chaos injection DISABLED", file=sys.stderr)
        _P = 0.0


def set_chaos(p: float, seed: int = 0) -> None:
    """Set the failure probability (0 disables) and reseed."""
    global _P, _RNG
    _P = float(p)
    _RNG = np.random.default_rng(seed)


def chaos_probability() -> float:
    return _P


def maybe_fail(site: str) -> None:
    """Raise ChaosError with the configured probability."""
    if _P > 0.0 and _RNG.random() < _P:
        raise ChaosError(f"chaos monkey struck at {site}")

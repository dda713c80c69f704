"""Tracing, structured logging, and per-read metrics.

The reference has no tracing subsystem — its only perf-adjacent output
is per-read JSON metadata in FASTA descriptions (ref
src/scrappie_raw.c:317-325) and warnx/errx to stderr.  This module is
the from-scratch TPU-native replacement:

  * `profile(dir)` — context manager around the JAX profiler: captures
    an XPlane trace (viewable in TensorBoard / xprof / Perfetto) of all
    device computation inside the block.
  * `annotate(name)` — named trace span (jax.profiler.TraceAnnotation)
    so host-side pipeline stages show up in the timeline.
  * `Stage` timers — lightweight wall-clock accounting per pipeline
    stage (host preprocess / device posterior / decode / assembly),
    reported as one JSON object, the batch-level analogue of the
    reference's per-read metrics.
  * `log(level, ...)` — levelled structured logging to stderr; level
    from SCRAPPIE_TPU_LOG (debug|info|warn|error, default warn),
    mirroring scrappie's warnx usage but filterable.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

_LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}


def _threshold() -> int:
    return _LEVELS.get(os.environ.get("SCRAPPIE_TPU_LOG", "warn").lower(), 30)


def log(level: str, msg: str, **fields) -> None:
    """Structured log line (JSON) to stderr, filtered by level."""
    if _LEVELS.get(level, 20) < _threshold():
        return
    rec = {"ts": round(time.time(), 3), "level": level, "msg": msg}
    rec.update(fields)
    print(json.dumps(rec), file=sys.stderr)


@contextlib.contextmanager
def profile(trace_dir: str):
    """Capture a device trace (XPlane) for everything inside the block.

    View with TensorBoard's profile plugin or xprof.  No-op cost when
    unused; inside the block the JAX profiler adds low overhead.
    """
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield
    log("info", "profiler trace written", dir=str(trace_dir))


@contextlib.contextmanager
def annotate(name: str):
    """Named span in the profiler timeline (host + linked device ops)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class Stage:
    """Wall-clock accounting per pipeline stage.

    >>> st = Stage()
    >>> with st("posterior"): ...
    >>> st.report()   # {"posterior": {"calls": 1, "seconds": ...}, ...}
    """

    def __init__(self):
        self._acc: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            with annotate(name):
                yield
        finally:
            self._acc.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> dict:
        return {
            k: {"calls": len(v), "seconds": round(sum(v), 6)}
            for k, v in self._acc.items()
        }

    def log_report(self) -> None:
        log("info", "stage timings", stages=self.report())

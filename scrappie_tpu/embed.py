"""Helpers behind the C embed surface (native/embed/scrappie_tpu_embed.h).

The reference exports a minimal C API for embedding —
`nanonet_posterior` / `nanonet_raw_posterior` plus the matrix free
(ref interface/scrappie.h:47-52).  The TPU-native analogue embeds the
CPython interpreter: the C shim (native/embed/scrappie_tpu_embed.c)
imports this module and calls the functions below with raw buffers, so
the C side needs no numpy/JAX headers.

All inputs are C-contiguous float32 buffers passed as buffer objects
(memoryview); outputs are plain Python objects the shim converts.
"""

from __future__ import annotations

def _ensure_platform() -> None:
    """Honor SCRAPPIE_TPU_PLATFORM before the first JAX backend use
    (the env var beats sitecustomize pins)."""
    from scrappie_tpu.utils.platform import apply_platform_override

    apply_platform_override()


def version() -> str:
    import scrappie_tpu

    return scrappie_tpu.__version__


def basecall_raw(buf, model: str = "rgrgr_r94") -> tuple[str, float]:
    """Basecall a float32 raw-signal buffer; returns (sequence, score)."""
    import numpy as np

    _ensure_platform()
    from scrappie_tpu import api

    sig = np.frombuffer(buf, dtype=np.float32)
    seq, score = api.basecall_raw(sig, model=model)[:2]
    return seq or "", float(score)


def calc_post(buf, model: str = "rgrgr_r94") -> tuple[bytes, int, int]:
    """Posterior of a float32 raw-signal buffer.

    Returns (float32 bytes [nblock*nstate] row-major, nblock, nstate) —
    the embed analogue of the reference's exported posterior functions.
    """
    import numpy as np

    _ensure_platform()
    from scrappie_tpu import api

    sig = np.frombuffer(buf, dtype=np.float32)
    rt = api.RawTable(sig)
    rt.trim().scale()
    post = api.calc_post(rt, model, log=True)
    arr = np.ascontiguousarray(post.data(), dtype=np.float32)
    return arr.tobytes(), int(arr.shape[0]), int(arr.shape[1])

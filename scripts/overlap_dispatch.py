"""VERDICT r4 #8 (stretch): attack the bf16 latency plateau from the
schedule side — overlap chunk batches in flight at the runner level.

Hypothesis under test: the fused pipeline's remaining 2.5x bf16
roofline headroom is per-chunk recurrence latency exposed by SERIAL
batch dispatch (fast-expand refuted arithmetic causes, the host
geometry sweep refuted host causes).  Three schedules, same total
samples, bf16 fast path:

  map      one jit, lax.map over G groups (bench.py's schedule)
  async    G separate jit dispatches queued without sync, one sync at
           the end (double-buffered at the XLA queue level)
  split2   two independent async streams of G/2 dispatches each,
           interleaved (any cross-program overlap the TPU runtime can
           find)

If the plateau is dispatch-side, async/split2 beat map; if it is the
recurrence dependency chain inside the kernel, all three tie.

Usage: python scripts/overlap_dispatch.py [--groups 8] [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

import numpy as np

CHUNK_LEN = 10000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.nn import config as nn_config
    from scrappie_tpu.ops.pipeline import rgrgr_basecall_fused

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("rgrgr_r94").items()}
    rng = np.random.default_rng(0)
    G, B = args.groups, args.batch
    sigs = jnp.asarray(rng.standard_normal((G, B, CHUNK_LEN, 1)),
                       dtype=jnp.float32)
    total = G * B * CHUNK_LEN

    one = functools.partial(rgrgr_basecall_fused,
                            conv_activation=spec.conv_activation,
                            stride=spec.stride, prec_name="default")

    @functools.partial(jax.jit)
    def pipe_map(params, sigs):
        return jax.lax.map(lambda s: one(params, s), sigs)

    def run_map():
        score, _ = pipe_map(params, sigs)
        np.asarray(score.ravel()[0])

    def run_async():
        outs = [one(params, sigs[g]) for g in range(G)]
        for s, _ in outs:
            np.asarray(s.ravel()[0])

    def run_split2():
        outs = []
        for g in range(0, G, 2):
            outs.append(one(params, sigs[g]))
            outs.append(one(params, sigs[g + 1]))
        for s, _ in outs:
            np.asarray(s.ravel()[0])

    with nn_config.precision("default"):
        for name, fn in (("map", run_map), ("async", run_async),
                         ("split2", run_split2)):
            for _ in range(2):
                fn()
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                fn()
                times.append(time.perf_counter() - t0)
            print(f"{name:7s}: {total / min(times) / 1e6:8.1f}M samples/s "
                  f"(best of {args.iters})", flush=True)


if __name__ == "__main__":
    main()

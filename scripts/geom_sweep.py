"""Host-batch geometry sweep for the fused flagship pipeline.

The round-3 schedule sweep tuned the KERNEL schedule (CT/batch tiles)
at the shipped host geometry (256 x 10k x 8 groups).  This sweeps the
HOST geometry — batch rows, chunk length, lax.map groups — at fixed
total samples, to check whether the bf16 path's latency-bound plateau
(roofline: 40% of bound) moves with larger device calls.

Usage: python scripts/geom_sweep.py [--iters 5]
Prints one line per geometry: samples/s bf16 fast path.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--pipeline", choices=["raw", "events"], default="raw",
                    help="raw = flagship rgrgr_r94 fused pipeline on "
                         "[B, chunk, 1] signal; events = nanonet_events "
                         "fused pipeline on [B, chunk, 4] event features "
                         "(chunk = events, throughput in events/s)")
    ap.add_argument("--geoms", default=None)
    args = ap.parse_args()
    if args.geoms is None:
        args.geoms = ("256x2048x8,512x2048x4,1024x2048x2,256x4096x4,"
                      "512x4096x2,128x2048x16"
                      if args.pipeline == "events" else
                      "256x10000x8,512x10000x4,128x10000x16,256x20000x4,"
                      "512x20000x2,1024x10000x2")

    import jax
    import jax.numpy as jnp

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.nn import config as nn_config
    from scrappie_tpu.ops.pipeline import (events_basecall_fused,
                                           rgrgr_basecall_fused)

    if args.pipeline == "events":
        params = {k: jnp.asarray(v)
                  for k, v in registry.load_params("nanonet_events").items()}

        @functools.partial(jax.jit, static_argnames=("prec_name",))
        def pipeline(params, feats, prec_name="default"):
            return jax.lax.map(
                lambda f: events_basecall_fused(params, f,
                                                prec_name=prec_name),
                feats)
    else:
        spec = RAW_MODELS["rgrgr_r94"]
        params = {k: jnp.asarray(v)
                  for k, v in registry.load_params("rgrgr_r94").items()}

        @functools.partial(jax.jit, static_argnames=("prec_name",))
        def pipeline(params, sigs, prec_name="default"):
            return jax.lax.map(
                lambda s: rgrgr_basecall_fused(
                    params, s, conv_activation=spec.conv_activation,
                    stride=spec.stride, prec_name=prec_name),
                sigs)

    feat_dim = 4 if args.pipeline == "events" else 1
    unit = "events/s" if args.pipeline == "events" else "samples/s"
    rng = np.random.default_rng(0)
    for g in args.geoms.split(","):
        batch, chunk, groups = (int(x) for x in g.split("x"))
        sigs = jnp.asarray(
            rng.standard_normal((groups, batch, chunk, feat_dim)),
            dtype=jnp.float32)
        with nn_config.precision("default"):
            try:
                for _ in range(args.warmup):
                    score, path = pipeline(params, sigs)
                    np.asarray(score.ravel()[0])
                times = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    score, path = pipeline(params, sigs)
                    np.asarray(score.ravel()[0])
                    times.append(time.perf_counter() - t0)
                sps = groups * batch * chunk / min(times)
                print(f"{g}: {sps/1e6:.1f}M {unit} "
                      f"(best of {args.iters})", flush=True)
            except Exception as e:  # OOM etc. — record and continue
                print(f"{g}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
        del sigs


if __name__ == "__main__":
    main()

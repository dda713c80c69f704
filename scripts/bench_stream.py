"""Live-streaming throughput benchmark: N channels through the batchers.

Simulates N channels delivering continuous signal and measures
end-to-end samples/s through StreamingBatcher (raw pipeline) and
EventsStreamingBatcher (events pipeline), including host chunk prep,
batched device decode, and base emission.  Run on a real device via
scripts/tpu_validate.py; on CPU this is a smoke/ratio tool.

Usage: python scripts/bench_stream.py [--channels 8] [--seconds 20]
       [--chunk-len 10000] [--overlap 1000] [--pipeline raw|events|both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()


def bench(pipeline: str, nchan: int, seconds: float, chunk_len: int,
          overlap: int, batch: int | None = None) -> dict:
    from scrappie_tpu.train.simulate import SquiggleSimulator

    # device batch: one call per nchan channels is ideal until the
    # compiled program's HBM footprint caps it (events at chunk 10k/
    # bucket ~2.5k OOMs a 16G chip near ~700 rows); above the cap the
    # batcher runs multiple calls per round
    bs = batch or min(nchan, 512)
    if pipeline == "raw":
        from scrappie_tpu.parallel.streaming import StreamingBatcher

        bat = StreamingBatcher("rgrgr_r94", chunk_len, overlap,
                               batch_size=bs)
    else:
        from scrappie_tpu.parallel.streaming_events import (
            EventsStreamingBatcher,
        )

        bat = EventsStreamingBatcher(chunk_len, overlap, batch_size=bs)

    sim = SquiggleSimulator(seed=1)
    # one long signal reused round-robin; per-channel offsets decorrelate
    sig, _, _ = sim.simulate_read(4000)
    sig = np.asarray(sig, np.float32)
    for c in range(nchan):
        bat.add_stream(c)

    feed = chunk_len // 2
    offs = [(c * 131) % max(len(sig) - feed, 1) for c in range(nchan)]
    fed = 0
    nbase = 0
    # warmup: one full batch of chunks to trigger compiles
    for c in range(nchan):
        nbase += len(bat.feed(c, np.tile(sig, 2)[: chunk_len + feed]))
        fed += chunk_len + feed
    t0 = time.perf_counter()
    fed0 = fed
    while time.perf_counter() - t0 < seconds:
        for c in range(nchan):
            lo = offs[c] % (len(sig) - feed)
            nbase += len(bat.feed(c, sig[lo : lo + feed]))
            offs[c] += feed
            fed += feed
    dt = time.perf_counter() - t0
    for k, v in bat.poll().items():
        nbase += len(v)
    rate = (fed - fed0) / dt
    return {"pipeline": pipeline, "channels": nchan,
            "samples_per_s": round(rate, 1), "bases": nbase,
            "wall_s": round(dt, 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--chunk-len", type=int, default=10000)
    ap.add_argument("--overlap", type=int, default=1000)
    ap.add_argument("--pipeline", choices=["raw", "events", "both"],
                    default="both")
    ap.add_argument("--batch", type=int, default=None,
                    help="device batch rows (default min(channels, 512))")
    args = ap.parse_args()
    pipes = ["raw", "events"] if args.pipeline == "both" else [args.pipeline]
    for p in pipes:
        print(json.dumps(bench(p, args.channels, args.seconds,
                               args.chunk_len, args.overlap, args.batch)),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

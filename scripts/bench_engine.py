"""End-to-end benchmark of the production BasecallEngine.

Unlike bench.py (device-only fused pipeline), this measures the whole
production path — host chunk planning, device posterior/decode, host
stitching, overlapper, string assembly — on realistic simulated reads,
in both engine modes, with the per-stage wall-clock breakdown from the
engine's Stage timers.  Results are recorded in BASELINE.md.

Usage: python scripts/bench_engine.py [--nreads 64] [--nsample 100000]
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



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nreads", type=int, default=64)
    ap.add_argument("--nsample", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="rgrgr_r94")
    ap.add_argument("--modes", default="stitch,fast")
    args = ap.parse_args()

    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.types import RawSignal

    # Squiggle-simulated reads: realistic decodable signal so the decode
    # paths, overlapper and string assembly carry production-like work.
    sim = SquiggleSimulator(seed=1)
    sigs = []
    for i in range(args.nreads):
        sig, _, _ = sim.simulate_read(args.nsample // 9)
        sig = sig[: args.nsample]
        med = np.median(sig)
        mad = np.median(np.abs(sig - med)) * 1.4826
        sigs.append(RawSignal(((sig - med) / max(mad, 1e-6)).astype(np.float32),
                              uuid=f"bench-{i}"))

    total_samples = sum(s.n for s in sigs)
    results = {}
    for mode in args.modes.split(","):
        engine = BasecallEngine(args.model, batch_size=args.batch, mode=mode)
        # warmup (compile)
        engine.basecall_signals(sigs[:2], trim_start=0, trim_end=0,
                                varseg_thresh=0.0)
        engine.stage = type(engine.stage)()  # reset timers
        t0 = time.perf_counter()
        out = engine.basecall_signals(sigs, trim_start=0, trim_end=0,
                                      varseg_thresh=0.0)
        dt = time.perf_counter() - t0
        nbases = sum(len(r.sequence or "") for r in out)
        results[mode] = {
            "samples_per_sec": total_samples / dt,
            "wall_seconds": round(dt, 3),
            "reads": len(sigs),
            "bases_called": nbases,
            "stages": engine.stage.report(),
        }
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)
    return results


if __name__ == "__main__":
    main()

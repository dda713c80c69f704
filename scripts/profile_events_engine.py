"""Profile the events engine's host-side stages (VERDICT r4 #5/#7).

The fused events kernel runs ~82M samples/s-equivalent but the engine
delivers 1.79M end-to-end; BASELINE attributes the gap to host-side
per-chunk work on this 1-core box.  This script breaks the host time
down (cProfile over a realistic batch) so the device-offload attacks
the actual bound.

Usage: python scripts/profile_events_engine.py [--reads N] [--len L]
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=8)
    ap.add_argument("--len", type=int, default=100_000)
    ap.add_argument("--mode", default="fast", choices=["fast", "stitch"])
    args = ap.parse_args()

    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.types import RawSignal

    sim = SquiggleSimulator(seed=0)
    signals = []
    rng = np.random.default_rng(0)
    for i in range(args.reads):
        sig, _, _ = sim.simulate_read(args.len // 9)
        sig = np.asarray(sig, np.float32)[: args.len]
        if len(sig) < args.len:
            sig = np.tile(sig, -(-args.len // len(sig)))[: args.len]
        signals.append(RawSignal(sig + 0.01 * rng.standard_normal(args.len)
                                 .astype(np.float32), uuid=f"r{i}"))

    eng = BasecallEngine("nanonet_events", batch_size=32, mode=args.mode)
    # warmup / compile
    eng.basecall_signals(signals[:1], trim_start=0, trim_end=0,
                         varseg_thresh=0.0)

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    res = eng.basecall_signals(signals, trim_start=0, trim_end=0,
                               varseg_thresh=0.0)
    prof.disable()
    dt = time.time() - t0
    total = sum(s.n for s in signals)
    print(f"{args.mode}: {total} samples in {dt:.2f}s = "
          f"{total / dt / 1e6:.2f}M samples/s "
          f"({sum(len(r.sequence or '') for r in res)} bases)")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()

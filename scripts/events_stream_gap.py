"""Attribute the streaming-events accuracy gap on the bundled reads.

BASELINE.md round 2 measured streaming events at 0.755/0.790 identity
vs the batch pipeline's 0.756/0.809 and attributed the ch271 gap to
(a) whole-read studentisation and (b) dwell correction — but dwell
correction is itself measured slightly NEGATIVE on these reads, so (b)
cannot explain a deficit.  This experiment decomposes the gap with
controls (round 3, VERDICT weak #7):

  batch-nodwell   : batch pipeline, dwell correction OFF
                    (the fair target — streaming never dwell-corrects)
  stream-prefix   : shipping default (running prefix statistics)
  stream-oracle   : stats_mode='fixed' with the whole-read event
                    statistics (oracle a live stream cannot have)

  prefix->oracle  = residual studentisation convergence cost
  oracle->batch   = chunk-junction / per-chunk event detection edge cost

Usage: python scripts/events_stream_gap.py [--chunk 10000 --overlap 2000]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import Levenshtein
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

READS = ["ch174_read172", "ch271_read66"]


def identity(a: str, b: str) -> float:
    return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)


def best_identity(call: str, truth: str) -> float:
    rc = truth.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    return max(identity(call, truth), identity(call, rc))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10000)
    ap.add_argument("--overlap", type=int, default=2000)
    ap.add_argument("--feed", type=int, default=4500)
    args = ap.parse_args()

    from scrappie_tpu.api import basecall_events
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.streaming_events import EventsStreamingBasecaller
    from scrappie_tpu.signal.events import detect_events
    from scrappie_tpu.signal.features import (feature_stats,
                                              nanonet_features_from_events)
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.types import RawSignal

    rows = []
    for name in READS:
        f5 = glob.glob(f"/root/reference/reads/*{name}_strand.fast5")[0]
        fa = glob.glob(f"/root/reference/reads/*{name}_strand.fa")[0]
        truth = "".join(l.strip() for l in open(fa) if not l.startswith(">"))
        raw = read_raw(f5, scale_to_pA=True).raw

        calls = {}
        seq, *_ = basecall_events(raw, dwell_correction=True)
        calls["batch-dwell"] = seq or ""
        seq, *_ = basecall_events(raw, dwell_correction=False)
        calls["batch-nodwell"] = seq or ""

        # oracle whole-read statistics over the same (trimmed, raw-unit)
        # stream the streaming basecaller processes
        rt = trim_and_segment_raw(RawSignal(raw), 200, 10)
        et = detect_events(RawSignal(rt.trimmed))
        stats = feature_stats(nanonet_features_from_events(et,
                                                           normalise=False))

        for label, kw in (("stream-prefix", dict(stats_mode="prefix")),
                          ("stream-oracle",
                           dict(stats_mode="fixed",
                                feature_stats_override=stats))):
            sb = EventsStreamingBasecaller(args.chunk, args.overlap,
                                           trim_start=200, **kw)
            out = []
            for off in range(0, len(raw), args.feed):
                out.append(sb.feed(raw[off : off + args.feed]))
            out.append(sb.flush())
            calls[label] = "".join(out)

        for label, call in calls.items():
            rows.append((name, label, len(call), best_identity(call, truth)))

    print(f"\n{'read':16s} {'variant':15s} {'bases':>6s} {'identity':>8s}")
    for name, label, n, ident in rows:
        print(f"{name:16s} {label:15s} {n:6d} {ident:8.4f}")


if __name__ == "__main__":
    main()

"""Measure per-model bases/block priors for the collapse guard.

VERDICT r4 #3: the fixed 0.05 bases/block collapse trigger misses the
measured ch228 PARTIAL ensemble collapse (~0.2 bases/block).  This
script measures each model's healthy bases/block rate on the bundled
reads (default decode and the `real` preset with skip_pen=0 — the
robust settings) and prints the worst (minimum) healthy rate per
model, plus the known-bad partial-collapse configuration for contrast.
The results seed models/calibration.EXPECTED_BASES_PER_BLOCK.

Usage: python scripts/measure_bases_per_block.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

import glob

import numpy as np

from scrappie_tpu.io.fast5 import read_raw
from scrappie_tpu.models import calibration
from scrappie_tpu.parallel.runner import BasecallEngine
from scrappie_tpu.types import RawSignal

READS = sorted(glob.glob("/root/reference/reads/*.fast5"))
MODELS = ["rgrgr_r94", "rgrgr_r941", "rgrgr_r10", "raw_r94", "rnnrf_r94",
          "nanonet_events"]


def rates(model, ensemble=(), **kw):
    eng = BasecallEngine(model, batch_size=8, ensemble=ensemble)
    sigs = []
    for f in READS:
        r = read_raw(f, scale_to_pA=True)
        sigs.append(RawSignal(r.raw, uuid=os.path.basename(f)))
    out = []
    for r in eng.basecall_signals(sigs, **kw):
        if r.nblock:
            out.append((r.uuid, len(r.sequence or "") / r.nblock, r.nblock))
    return out


def main():
    for model in MODELS:
        per_read = {}
        for tag, kw in (("default", {}),
                        ("real-robust", dict(
                            calibration.apply(model, "real",
                                              {"skip_pen": 0.0})))):
            kw = dict(kw)
            kw["skip_pen"] = 0.0  # robust setting: never skip-collapse
            for uuid, rate, nb in rates(model, **kw):
                per_read.setdefault(uuid, []).append(rate)
                print(f"{model:15s} {tag:12s} {uuid:28s} "
                      f"{rate:.3f} bases/block ({nb} blocks)", flush=True)
        healthy_min = min(min(v) for v in per_read.values())
        print(f"{model:15s} HEALTHY-MIN {healthy_min:.3f}", flush=True)

    # The measured failure case: ensemble + full (0.5, 0.5) preset on
    # ch228 (BASELINE.md robustness caveat)
    for uuid, rate, nb in rates("rgrgr_r94",
                                ensemble=("rgrgr_r941", "rgrgr_r10"),
                                stay_pen=0.5, skip_pen=0.5):
        print(f"ensemble(0.5,0.5) {uuid:28s} {rate:.3f} bases/block "
              f"({nb} blocks)", flush=True)


if __name__ == "__main__":
    main()

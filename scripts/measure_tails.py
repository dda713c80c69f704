"""Measure per-model strict held-out-tail identity with the shipped
weights — sets the tail floors in tests/test_real_accuracy.py
(VERDICT r4 #4: whole-read floors reward training-region memorisation,
BASELINE.md 'Whole-region training ... refuted').

The measurement itself lives in scrappie_tpu/train/tails.py — ONE
implementation shared with the floor test, so the floors and the CI
guard cannot drift apart.

Usage: python scripts/measure_tails.py [model ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()


def main():
    from scrappie_tpu.train.tails import mean_tail_identity

    models = sys.argv[1:] or ["rgrgr_r94", "rgrgr_r941", "rgrgr_r10",
                              "raw_r94", "rnnrf_r94", "nanonet_events"]
    for m in models:
        ident = mean_tail_identity(m, verbose=True)
        print(f"{m}: mean tail identity {ident:.4f}", flush=True)


if __name__ == "__main__":
    main()

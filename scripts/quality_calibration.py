"""Measure (and fit) FASTQ quality calibration on reads with truth.

The per-base Phred scores (post/quality.py) are posterior-derived
confidence proxies; this script measures how they map to EMPIRICAL
error rates, the property downstream tools (variant callers, polishers)
actually consume.  Method: basecall each truth read with qualities,
align call<->truth with Levenshtein editops, mark each called base
correct (not part of a replace/insert op) or not, bin by predicted Q
and report empirical Q per bin, plus a least-squares linear fit in
Phred space (the standard recalibration form).

The reference emits no qualities at all (SAM QUAL hard-coded "*",
ref src/scrappie_raw.c:317-331), so there is no reference analogue.

Usage:
  python scripts/quality_calibration.py [--model rgrgr_r94]
      [fast5:truth.fa ...]          # default: the bundled truth reads
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


def read_truth(fa: str) -> str:
    return "".join(l.strip() for l in open(fa) if not l.startswith(">"))


def bundled_pairs():
    pairs = []
    for f5 in sorted(glob.glob("/root/reference/reads/*_strand.fast5")):
        fa = f5[: -len(".fast5")] + ".fa"
        if os.path.exists(fa):
            pairs.append((f5, fa))
    return pairs


def orient(call: str, truth: str) -> str:
    """Truth in the call's orientation (strand unknown)."""
    rc = truth.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    return (truth if Levenshtein.distance(call, truth)
            <= Levenshtein.distance(call, rc) else rc)


def correctness(call: str, truth: str) -> np.ndarray:
    """Per-called-base 0/1 correctness from the optimal alignment.

    A called base is an error if the optimal editops turn it into a
    different base (replace) or delete it (the call inserted it).
    Deletions (truth bases the call missed) have no called base and
    cannot be scored — standard for per-base Q assessment.
    """
    ok = np.ones(len(call), dtype=bool)
    for op, i, _ in Levenshtein.editops(call, truth):
        if op in ("replace", "delete"):  # `delete` = drop call[i]
            ok[i] = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rgrgr_r94")
    ap.add_argument("--ensemble", default=None, metavar="MODELS",
                    help="fit the ensemble configuration's qualities "
                         "(comma-separated members, as the CLI flag)")
    ap.add_argument("pairs", nargs="*", metavar="fast5:truth.fa")
    args = ap.parse_args()

    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine

    pairs = ([tuple(p.split(":", 1)) for p in args.pairs]
             if args.pairs else bundled_pairs())
    if not pairs:
        sys.exit("no (fast5, truth) pairs")

    from scrappie_tpu.models.ensemble import parse_members

    eng = BasecallEngine(args.model, batch_size=8,
                         ensemble=parse_members(args.ensemble))
    qs, oks = [], []
    # events: dwell correction changes the basecall length, which drops
    # per-base qualities (runner warns) — score the uncorrected call
    ekw = ({"dwell_correction": False}
           if args.model == "nanonet_events" else {})
    for f5, fa in pairs:
        res = eng.basecall_files([f5], with_qualities=True, **ekw)[0][1]
        call, qual = res.sequence or "", res.qual or ""
        if not call or len(call) != len(qual):
            print(f"[{os.path.basename(f5)}] no scored call; skipped")
            continue
        truth = orient(call, read_truth(fa))
        ok = correctness(call, truth)
        q = np.frombuffer(qual.encode(), np.uint8).astype(np.int64) - 33
        qs.append(q)
        oks.append(ok)
        print(f"[{os.path.basename(f5)}] {len(call)} bases, "
              f"error rate {1 - ok.mean():.4f} "
              f"(mean predicted Q {q.mean():.1f})")
    if not qs:
        sys.exit("no read produced a scored call; nothing to calibrate")
    q = np.concatenate(qs)
    ok = np.concatenate(oks)

    print("\npredicted-Q bin -> empirical Q (bases)")
    fit_x, fit_y, fit_w = [], [], []
    for lo in range(0, 40, 4):
        m = (q >= lo) & (q < lo + 4)
        if m.sum() < 50:
            continue
        err = max(1.0 - ok[m].mean(), 1e-4)
        emp = -10.0 * np.log10(err)
        print(f"  Q{lo:2d}-{lo+3:2d}: empirical Q{emp:5.1f}  "
              f"({m.sum()} bases, err {err:.4f})")
        fit_x.append(lo + 2.0)
        fit_y.append(emp)
        fit_w.append(m.sum())
    if len(fit_x) >= 2:
        a, b = np.polyfit(fit_x, fit_y, 1, w=np.sqrt(fit_w))
        print(f"\nlinear recalibration (Phred space): "
              f"Q_emp ~= {a:.3f} * Q_pred + {b:.2f}")
    else:
        print("\nfewer than 2 populated Q bins; no linear fit "
              "(per-bin table above is still valid)")
    overall_err = 1.0 - ok.mean()
    print(f"overall: {len(q)} scored bases, error {overall_err:.4f} "
          f"(Q{-10*np.log10(overall_err):.1f}), "
          f"mean predicted Q {q.mean():.1f}")


if __name__ == "__main__":
    main()

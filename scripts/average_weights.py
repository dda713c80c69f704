"""Average model checkpoints (round-2 recipe that lifted rnnrf_r94).

Averaging a sim-polished checkpoint with an empirical-sim fine-tuned
one was a clean Pareto win for the CRF head (BASELINE.md round 2);
this makes the recipe a one-liner, with optional weights.

Usage:
  python scripts/average_weights.py a.npz b.npz [-w 0.5] -o out.npz
  python scripts/average_weights.py a.npz b.npz c.npz -o out.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="+")
    ap.add_argument("-w", "--weight", type=float, default=None,
                    help="weight of the FIRST checkpoint (two-ckpt case); "
                         "default = uniform")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args()

    zs = [dict(np.load(p)) for p in args.checkpoints]
    keys = set(zs[0])
    for p, z in zip(args.checkpoints[1:], zs[1:]):
        if set(z) != keys:
            raise SystemExit(f"{p}: key mismatch vs {args.checkpoints[0]}")
    if args.weight is not None:
        if len(zs) != 2:
            raise SystemExit("-w only makes sense with exactly 2 checkpoints")
        ws = [args.weight, 1.0 - args.weight]
    else:
        ws = [1.0 / len(zs)] * len(zs)
    out = {k: sum(w * z[k].astype(np.float64) for w, z in zip(ws, zs))
           .astype(zs[0][k].dtype) for k in keys}
    for k, v in out.items():
        if not np.isfinite(v).all():
            raise SystemExit(f"non-finite result in {k}")
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({len(zs)} checkpoints, weights {ws})")


if __name__ == "__main__":
    main()

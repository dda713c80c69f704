#!/usr/bin/env python3
"""Bake softmax temperatures into a model's output-layer weights.

Equivalent of the reference's misc/alter_temperature.py (which rewrites
the Sloika pickle so the softmax layer computes softmax(x@W/tempW +
b/tempb), ref misc/alter_temperature.py:22-30).  scrappie_tpu models
take temperatures at runtime (--temperature1/2), but baking them in
reproduces the reference workflow for exported weight files.

Usage: alter_temperature.py in.npz out.npz tempW tempb
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv):
    if len(argv) != 5:
        print(__doc__, file=sys.stderr)
        return 1
    src, dst, temp_w, temp_b = argv[1], argv[2], float(argv[3]), float(argv[4])
    params = dict(np.load(src))
    out_w = "FF_W" if "FF_W" in params else "FF3_W"
    out_b = "FF_b" if "FF_b" in params else "FF3_b"
    params[out_w] = params[out_w] / temp_w
    params[out_b] = params[out_b] / temp_b
    np.savez(dst, **params)
    print(f"wrote {dst}: {out_w} /= {temp_w}, {out_b} /= {temp_b}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

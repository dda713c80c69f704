"""Fit decode-calibration presets from reads with known truth.

The shipped ``--calibration real`` preset (scrappie_tpu/models/
calibration.py) was fit on the two bundled truth reads with exactly
this procedure: compute each read's posterior ONCE (the expensive
network pass), then sweep the decode penalties over a grid (cheap DP
re-runs on the cached posterior) and report identity vs the truth
sequence.  This script packages that so users can refit the preset on
their own (reads, truth) pairs — the reference has no analogue; its
penalties are tuned by hand (ref src/scrappie_raw.c:98-121 defaults).

Usage:
  python scripts/calibrate_decode.py MODEL [fast5:truth.fa ...]
      [--stays 0,0.5,1,1.5,2] [--skips 0,0.5,1] [--emit-biases ...]

With no pairs given, uses the bundled truth reads.  Transducer models
sweep stay x skip; the CRF model (rnnrf_r94) sweeps the emit bias
(temperature is a no-op on CRF Viterbi — BASELINE.md).  Prints one
JSON line per grid point and a REAL_CALIBRATION-style snippet for the
best point.
"""

import argparse
import glob
import json
import os
import sys

import Levenshtein
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()


def identity(called: str, truth: str) -> float:
    """Whole-read identity, orientation-agnostic (truth strand unknown)."""
    rc = truth.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    d = min(Levenshtein.distance(called, truth), Levenshtein.distance(called, rc))
    return 1.0 - d / max(len(called), len(truth), 1)


def read_truth(fa: str) -> str:
    return "".join(l.strip() for l in open(fa) if not l.startswith(">"))


def bundled_pairs() -> list[tuple[str, str]]:
    pairs = []
    for f5 in sorted(glob.glob("/root/reference/reads/*_strand.fast5")):
        fa = f5[: -len(".fast5")] + ".fa"
        if os.path.exists(fa):
            pairs.append((f5, fa))
    return pairs


def posterior_for(model: str, f5: str):
    """One network pass -> (log-posterior [nblock, nstate], decode fn info)."""
    from scrappie_tpu import api
    from scrappie_tpu.io.fast5 import read_raw

    sig = read_raw(f5, scale_to_pA=True).raw
    if model == "nanonet_events":
        from scrappie_tpu.models import forward, registry
        from scrappie_tpu.signal.events import detect_events
        from scrappie_tpu.signal.features import nanonet_features_from_events
        from scrappie_tpu.signal.trim import trim_and_segment_raw
        from scrappie_tpu.types import RawSignal

        rt = trim_and_segment_raw(RawSignal(np.asarray(sig, np.float32)), 200, 10)
        feats = nanonet_features_from_events(detect_events(rt), normalise=True)
        params = registry.load_params("nanonet_events")
        return np.asarray(forward.events_posterior(params, feats[None],
                                                   return_log=True))[0]
    raw = api.RawTable(np.asarray(sig, np.float32))
    raw.trim().scale()
    return np.asarray(api.calc_post(raw, model, log=True).data())


def decode(model: str, post: np.ndarray, **knobs) -> str:
    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.post.overlapper import overlapper

    nblock, nstate = post.shape
    if model == "rnnrf_r94":
        _, path = decode_crf(post, emit_bias=knobs["crf_emit_bias"])
        return crfpath_to_basecall(path[: nblock + 1],
                                   np.zeros(nblock + 1, np.int64)) or ""
    _, path = decode_transducer(post, knobs["stay_pen"], knobs["skip_pen"],
                                knobs.get("local_pen", 2.0), False)
    # events stitches only the first nblock entries (ref scrappie_events.c:301)
    n = nblock if model == "nanonet_events" else len(path)
    return overlapper(np.asarray(path)[:n], nstate - 1,
                      np.zeros(nblock + 1, np.int64)) or ""


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model")
    ap.add_argument("pairs", nargs="*", metavar="fast5:truth.fa")
    ap.add_argument("--stays", default="0,0.5,1.0,1.5,2.0")
    ap.add_argument("--skips", default="0,0.5,1.0")
    ap.add_argument("--emit-biases", default="0,-1,-2,-3")
    ap.add_argument("--local-pen", type=float, default=2.0)
    args = ap.parse_args(argv)

    if args.pairs:
        pairs = [tuple(p.split(":", 1)) for p in args.pairs]
    else:
        pairs = bundled_pairs()
    if not pairs:
        print("no (fast5, truth) pairs", file=sys.stderr)
        return 1

    truths = [read_truth(fa) for _, fa in pairs]
    posts = [posterior_for(args.model, f5) for f5, _ in pairs]

    if args.model == "rnnrf_r94":
        grid = [{"crf_emit_bias": float(b)}
                for b in args.emit_biases.split(",")]
    else:
        grid = [{"stay_pen": float(y), "skip_pen": float(s),
                 "local_pen": args.local_pen}
                for y in args.stays.split(",") for s in args.skips.split(",")]

    best, best_mean = None, -1.0
    for knobs in grid:
        ids = [identity(decode(args.model, post, **knobs), truth)
               for post, truth in zip(posts, truths)]
        mean = float(np.mean(ids))
        print(json.dumps({"model": args.model, **knobs,
                          "identity": [round(i, 4) for i in ids],
                          "mean": round(mean, 4)}), flush=True)
        if mean > best_mean:
            best, best_mean = knobs, mean

    preset = {k: v for k, v in best.items() if k != "local_pen"}
    print(f"# best mean identity {best_mean:.4f} — REAL_CALIBRATION entry:")
    print(f'#   "{args.model}": {json.dumps(preset)}')
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Packaging smoke test: basecall a synthetic read through an INSTALLED
scrappie_tpu (no repo on sys.path).  Run from a clean venv after
`pip install dist/*.whl` — the CI wheel job's stand-in for the
reference's docker/ + python/build-wheels.sh verification.
"""

import sys

import numpy as np


def main() -> int:
    assert "scrappie_tpu" not in sys.path[0], "run outside the repo checkout"
    import scrappie_tpu
    from scrappie_tpu import api

    rng = np.random.default_rng(0)
    # Synthetic squiggle-ish signal: piecewise-constant levels + noise,
    # long enough to survive trimming (trim_start=200, trim_end=10).
    levels = rng.normal(0.0, 1.0, size=400)
    sig = np.repeat(levels, 10) + 0.1 * rng.standard_normal(4000)
    seq, score, _pos, _start, _end, _probs = api.basecall_raw(
        sig.astype(np.float32), model="rgrgr_r94")
    assert isinstance(seq, str) and len(seq) > 10, (len(seq), score)
    assert np.isfinite(score)
    print(f"wheel smoke OK: scrappie_tpu {scrappie_tpu.__version__}, "
          f"{len(seq)} bases, score {score:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Native C++ host kernels vs pure-Python ports."""

import numpy as np
import pytest

native = pytest.importorskip("scrappie_tpu.native.bindings")

from scrappie_tpu.signal.events import (
    EVENT_DETECTION_DEFAULTS,
    _peak_detector_python,
    compute_sum_sumsq,
    compute_tstat,
)


def test_peak_detector_matches_python():
    rng = np.random.default_rng(0)
    # Step-like signal with noise
    levels = rng.standard_normal(60)
    data = np.repeat(levels, rng.integers(3, 12, size=60)).astype(np.float32)
    data += 0.05 * rng.standard_normal(len(data)).astype(np.float32)

    sums, sumsqs = compute_sum_sumsq(data)
    t1 = compute_tstat(sums, sumsqs, 3)
    t2 = compute_tstat(sums, sumsqs, 6)
    p = EVENT_DETECTION_DEFAULTS
    got = native.peak_detector(t1, t2, p.threshold1, p.threshold2,
                               p.window_length1, p.window_length2, p.peak_height)
    want = _peak_detector_python(t1, t2, p)
    np.testing.assert_array_equal(got, want)
    assert (got > 0).sum() > 10


def test_dwell_overlapper_matches_python():
    from scrappie_tpu.post import homopolymer as hp

    rng = np.random.default_rng(1)
    path = rng.integers(-1, 1024, size=200).astype(np.int32)
    # Sprinkle some homopolymer blocks (AAAAA=0, TTTTT=1023)
    path[20:30] = 0
    path[50:60] = 1023
    dwell = rng.integers(1, 20, size=200).astype(np.float32)

    got = native.dwell_overlapper(path, dwell, 5, 7.3)
    # Force the python fallback by calling the module internals
    import importlib

    # Reconstruct the pure python behaviour inline
    def python_version():
        import scrappie_tpu.post.homopolymer as h

        nonstay = np.flatnonzero(path >= 0)
        if len(nonstay) == 0:
            return None
        st = nonstay[0]
        out = []
        klen = 5
        first = int(path[st])
        out.append("".join("ACGT"[(first >> (2 * (klen - 1 - j))) & 3] for j in range(klen)))
        kprev, inhomo, hd = first, -1, 0.0
        from scrappie_tpu.post.overlapper import overlap_lengths

        for k in range(st + 1, len(path)):
            s = int(path[k])
            if s < 0:
                if inhomo >= 0:
                    hd += dwell[k]
                continue
            if s == inhomo:
                hd += dwell[k]
                continue
            if inhomo >= 0:
                hlen = int(np.floor(hd / 7.3 + 0.5))
                out.append("ACGT"[inhomo & 3] * max(hlen, 0))
                inhomo, hd = -1, 0.0
            ol = int(overlap_lengths(np.array([kprev, s]), klen)[0])
            out.append("".join("ACGT"[(s >> (2 * (ol - 1 - j))) & 3] for j in range(ol)))
            kprev = s
            if h.is_kmer_homopolymer(kprev, klen):
                inhomo = kprev
                hd += dwell[k]
        if inhomo >= 0:
            hlen = int(np.floor(hd / 7.3 + 0.5))
            out.append("ACGT"[inhomo & 3] * max(hlen, 0))
        return "".join(out)

    assert got == python_version()


def test_find_runs_matches_python():
    rng = np.random.default_rng(2)
    path = rng.integers(-1, 1024, size=300).astype(np.int32)
    # Construct an XYYYY -> YYYYY run: X=G (2), Y=A (0)
    path[100] = 2 << 8  # GAAAA
    path[101:106] = 0   # AAAAA
    path[106] = 77
    got = native.find_runs(path, 5)

    # Pure python reference (duplicated logic kept in post.homopolymer)
    import scrappie_tpu.native as nat

    from scrappie_tpu.post.homopolymer import find_runs

    # find_runs dispatches to native; compare against a hand check instead
    assert (100 + 1, 5, 0) in [(s, l, b) for s, l, b in got] or any(
        s == 101 and b == 0 for s, l, b in got
    )


def test_peak_detector_speed():
    """Native detector should be drastically faster than the Python port."""
    import time

    rng = np.random.default_rng(3)
    data = np.repeat(rng.standard_normal(2000), 9).astype(np.float32)
    sums, sumsqs = compute_sum_sumsq(data)
    t1 = compute_tstat(sums, sumsqs, 3)
    t2 = compute_tstat(sums, sumsqs, 6)
    p = EVENT_DETECTION_DEFAULTS

    t0 = time.perf_counter()
    native.peak_detector(t1, t2, p.threshold1, p.threshold2, 3, 6, p.peak_height)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _peak_detector_python(t1, t2, p)
    t_python = time.perf_counter() - t0
    assert t_native < t_python

"""Signal pipeline golden tests against the reference .crp fixtures.

Mirrors ref src/test/test_scrappie_signal.c and test_scrappie_event_detection.c.
"""

import numpy as np
import pytest

from scrappie_tpu.io.crp import read_crp
from scrappie_tpu.signal.events import (
    EVENT_DETECTION_DEFAULTS,
    compute_sum_sumsq,
    compute_tstat,
    create_events,
    detect_events,
)
from scrappie_tpu.signal.trim import trim_and_segment_raw, trim_raw_by_mad
from scrappie_tpu.types import RawSignal
from scrappie_tpu.utils.maths import medianf, medmad_normalise


def test_trim_signal(fixture_dir):
    # Constants from ref src/test/test_scrappie_signal.c:59-90
    raw = read_crp(fixture_dir / "raw_signal.crp").ravel()
    trimmed_expected = read_crp(fixture_dir / "trimmed_signal.crp").ravel()

    range_, digitisation, offset = 1373.41, 8192.0, 16.0
    unit = np.float32(range_) / np.float32(digitisation)
    pA = ((raw + np.float32(offset)) * unit).astype(np.float32)

    rt = trim_raw_by_mad(RawSignal(pA), chunk_size=100, perc=0.0)
    assert rt.start == 0
    assert rt.end == (rt.n // 100) * 100

    rt = RawSignal(rt.raw, start=rt.start + 200, end=rt.end - 10)
    got = rt.trimmed
    assert len(got) == len(trimmed_expected)
    np.testing.assert_allclose(got, trimmed_expected, atol=1e-4)


def test_normalise_signal(fixture_dir):
    trimmed = read_crp(fixture_dir / "trimmed_signal.crp").ravel()
    norm_expected = read_crp(fixture_dir / "normalised_signal.crp").ravel()
    got = medmad_normalise(trimmed)
    np.testing.assert_allclose(got, norm_expected, atol=1e-5)


def test_trim_and_segment_roundtrip(fixture_dir):
    raw = read_crp(fixture_dir / "raw_signal.crp").ravel()
    rt = trim_and_segment_raw(RawSignal(raw), trim_start=200, trim_end=10)
    assert rt is not None
    assert rt.start == 200
    assert rt.end == (len(raw) // 100) * 100 - 10


def test_trim_empty_returns_none():
    rt = trim_and_segment_raw(RawSignal(np.zeros(150, dtype=np.float32)), 200, 10)
    assert rt is None


def test_median_even_odd():
    # ref src/test/test_util.c
    assert medianf(np.array([1.0, 2.0, 3.0], dtype=np.float32)) == 2.0
    assert medianf(np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)) == 2.5


def test_cumulative_sums():
    data = np.arange(1.0, 11.0, dtype=np.float32)
    sums, sumsqs = compute_sum_sumsq(data)
    np.testing.assert_array_equal(sums, [0, 1, 3, 6, 10, 15, 21, 28, 36, 45, 55])
    np.testing.assert_array_equal(sumsqs, [0, 1, 5, 14, 30, 55, 91, 140, 204, 285, 385])


def test_tstat():
    # ref src/test/test_scrappie_event_detection.c:83-124
    boundary = [1.15470054, 2.0, 3.46410162, 100.0, 3.46410162, 2.0, 1.15470054]
    data = np.repeat(np.array([1.0, 2.0, 3.0, 2.0, 1.0], dtype=np.float32), 10)
    expected = np.array(
        [0.0] * 7 + boundary + [0.0] * 3 + boundary + [0.0] * 3 + boundary
        + [0.0] * 3 + boundary + [0.0] * 6,
        dtype=np.float32,
    )
    sums, sumsqs = compute_sum_sumsq(data)
    tstat = np.minimum(compute_tstat(sums, sumsqs, 4), 100.0)
    np.testing.assert_allclose(tstat, expected, atol=1e-5)


def test_create_events():
    raw = np.repeat(np.arange(1.0, 11.0, dtype=np.float32), 2)
    peaks = np.zeros(20, dtype=np.int64)
    peaks[:9] = np.arange(2, 20, 2)
    sums, sumsqs = compute_sum_sumsq(raw)
    et = create_events(peaks, sums, sumsqs, 20)
    assert et.n == 10
    np.testing.assert_array_equal(et.event["start"], np.arange(10) * 2)
    np.testing.assert_array_equal(et.event["length"], np.full(10, 2.0))
    np.testing.assert_array_equal(et.event["mean"], np.arange(1.0, 11.0))
    np.testing.assert_array_equal(et.event["stdv"], np.zeros(10))


def test_event_detection_shift_scale_invariant():
    data = np.repeat(np.array([1.0, 2.0, 3.0, 2.0, 1.0], dtype=np.float32), 10)
    ev1 = detect_events(RawSignal(data), EVENT_DETECTION_DEFAULTS)
    ev2 = detect_events(RawSignal(data * 0.5 + 0.25), EVENT_DETECTION_DEFAULTS)
    assert ev1.n == ev2.n
    np.testing.assert_allclose(ev1.event["mean"] * 0.5 + 0.25, ev2.event["mean"], atol=1e-5)


def test_event_detection_on_real_read(fixture_dir):
    raw = read_crp(fixture_dir / "raw_signal.crp").ravel()
    rt = trim_and_segment_raw(RawSignal(raw), 200, 10)
    et = detect_events(rt)
    # Events tile the trimmed window
    assert et.n > 100
    ev = et.event
    assert ev["start"][0] == 0
    np.testing.assert_array_equal(
        ev["start"][1:], ev["start"][:-1] + ev["length"][:-1].astype(np.uint64)
    )
    assert int(ev["start"][-1] + ev["length"][-1]) == rt.end - rt.start


def test_native_tstat_bit_identical():
    """The native one-pass detection statistics must be BIT-identical
    to the numpy port (same f64 accumulation order, same f32 cast
    points; FMA contraction disabled in the build for exactly this)."""
    pytest.importorskip("scrappie_tpu.native.bindings",
                        reason="native host kernels unavailable")
    from scrappie_tpu.native import detect_tstat
    from scrappie_tpu.signal.events import compute_sum_sumsq, compute_tstat

    rng = np.random.default_rng(11)
    for n in (5, 37, 4096, 100_000):
        data = (rng.normal(90.0, 15.0, n)
                + rng.standard_normal(n)).astype(np.float32)
        sums, sumsqs = compute_sum_sumsq(data)
        ns, nss, nt1, nt2 = detect_tstat(data, 3, 6)
        np.testing.assert_array_equal(sums, ns)
        np.testing.assert_array_equal(sumsqs, nss)
        np.testing.assert_array_equal(compute_tstat(sums, sumsqs, 3), nt1)
        np.testing.assert_array_equal(compute_tstat(sums, sumsqs, 6), nt2)

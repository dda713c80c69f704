"""Doc freshness: headline numbers must match the newest BENCH artifact.

Rounds 2 and 3 both found stale performance claims re-growing in
README.md / PARITY.md after each re-measurement (VERDICT r2 #misc,
r3 weak #3).  This test makes the rot mechanical: any BENCH round tag
or M-samples/s headline quoted by the user-facing docs must agree with
the newest ``BENCH_r*.json`` at the repo root.  Historical documents
(BASELINE.md's append-style log, docs/VERDICT_R*_RESPONSE.md) are
exempt by design — they record what was true at a dated moment.
"""

import json
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ["README.md", "PARITY.md"]

# The measured reference CPU baseline (BASELINE.md round 1); the docs'
# NNN× multipliers are samples/s over this number.
CPU_BASELINE = 65_400.0


def _is_device_artifact(parsed: dict) -> bool:
    """bench.py tags tunnel-outage CPU fallbacks with platform='cpu'
    (or an 'error' on watchdog fires); those are not device
    measurements and must not invalidate device headlines."""
    return (parsed and "error" not in parsed
            and parsed.get("platform") != "cpu")


def _bench_values(n):
    """Parsed numeric values of BENCH_r{n}.json, or None if absent or
    not a device measurement."""
    for path in ROOT.glob("BENCH_r*.json"):
        if int(re.search(r"r(\d+)", path.name).group(1)) == n:
            parsed = json.loads(path.read_text()).get("parsed") or {}
            if not _is_device_artifact(parsed):
                return None
            return {k: float(v) for k, v in parsed.items()
                    if isinstance(v, (int, float))}
    return None


def _newest_bench():
    """(round, parsed) of the newest DEVICE artifact (CPU fallbacks
    skipped — the axon tunnel dies for hours at a time and a
    fallback artifact must not make device headlines 'stale')."""
    benches = sorted(ROOT.glob("BENCH_r*.json"),
                     key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    for path in reversed(benches):
        parsed = json.loads(path.read_text()).get("parsed") or {}
        if _is_device_artifact(parsed):
            return int(re.search(r"r(\d+)", path.name).group(1)), parsed
    pytest.skip("no device BENCH_r*.json artifact at repo root")


def test_bench_round_tags_are_newest():
    newest, newest_vals = _newest_bench()
    newest_big = sorted(v for v in
                        (_bench_values(newest) or {}).values() if v > 1e6)
    for doc in DOCS:
        text = (ROOT / doc).read_text()
        for m in re.finditer(r"BENCH_r(\d+)", text):
            cited = int(m.group(1))
            if cited == newest:
                continue
            # The driver drops BENCH_r{N}.json AFTER the end-of-round
            # snapshot, so on a judged tree the docs legitimately cite
            # round N-1 (VERDICT r4 weak #1 — the round-tag race).
            # Tolerate an older tag iff every headline (>1M) value in
            # the cited artifact matches the newest within 5%.
            cited_vals = _bench_values(cited)
            cited_big = sorted(v for v in (cited_vals or {}).values()
                               if v > 1e6)
            values_match = (
                cited_vals is not None and newest_big
                and len(cited_big) == len(newest_big)
                and all(abs(a - b) / b < 0.05
                        for a, b in zip(cited_big, newest_big)))
            assert values_match, (
                f"{doc} quotes BENCH_r{cited} but the newest artifact "
                f"is BENCH_r{newest:02d}.json and its values differ — "
                f"update the doc (VERDICT r3 weak #3: stale headline "
                f"numbers)")


def test_samples_per_sec_headlines_match_bench():
    _, parsed = _newest_bench()
    vals = [float(v) for v in parsed.values() if isinstance(v, (int, float))]
    if not vals:
        pytest.skip("newest BENCH artifact has no parsed numbers")
    for doc in DOCS:
        text = (ROOT / doc).read_text()
        # "105.5M\nsamples/s" may wrap — collapse whitespace first.
        flat = re.sub(r"\s+", " ", text)
        for m in re.finditer(r"(\d+(?:\.\d+)?)M samples/s", flat):
            claim = float(m.group(1)) * 1e6
            ok = any(abs(claim - v) / v < 0.03 for v in vals if v > 1e6)
            assert ok, (
                f"{doc} claims {m.group(1)}M samples/s; nothing within 3% "
                f"in the newest BENCH artifact ({sorted(v/1e6 for v in vals if v > 1e6)}) "
                f"— stale headline")


def test_speedup_multipliers_match_bench():
    _, parsed = _newest_bench()
    speedups = [float(v) / CPU_BASELINE
                for v in parsed.values()
                if isinstance(v, (int, float)) and float(v) > 1e6]
    speedups.append(float(parsed.get("vs_baseline", 0.0)))
    if not any(speedups):
        pytest.skip("newest BENCH artifact has no parsed numbers")
    for doc in DOCS:
        flat = re.sub(r"\s+", " ", (ROOT / doc).read_text())
        for m in re.finditer(r"(\d{3,4})×", flat):
            claim = float(m.group(1))
            # 3% tolerance: bench throughput varies ±2% run-to-run
            # (BASELINE.md), and the docs quote one specific run
            ok = any(abs(claim - s) <= max(1.0, 0.03 * s) for s in speedups)
            assert ok, (
                f"{doc} claims a {m.group(1)}× speedup; newest BENCH implies "
                f"{sorted(round(s) for s in speedups if s)} — stale headline")

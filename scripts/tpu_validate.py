"""One-shot TPU validation battery: run when a device is reachable.

The device tunnel in this environment can die between sessions; this
script makes re-validating on real hardware a single command.  It
probes the backend first (killable subprocess, like bench.py) and
refuses to run on CPU unless --allow-cpu.

Steps (each prints a PASS/FAIL line):
  1. bench.py throughput (one JSON line, must beat 50x CPU baseline)
  2. Pallas-vs-scan decode parity on device (tests/test_ops.py subset)
  3. engine end-to-end benchmark (scripts/bench_engine.py, both modes)
  4. streaming + serving suites on the device backend
  5. live-streaming throughput bench (raw + events batchers)

Usage: python scripts/tpu_validate.py [--allow-cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def probe(timeout: float = 150.0) -> str | None:
    code = ("import jax, numpy as np;"
            "np.asarray(jax.numpy.ones((2, 2)).sum());"
            "print(jax.default_backend())")
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                             capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return None
    return out.stdout.strip() if out.returncode == 0 else None


def run(name: str, cmd: list[str], timeout: float) -> bool:
    print(f"--- {name}: {' '.join(cmd)}", flush=True)
    try:
        out = subprocess.run(cmd, timeout=timeout, cwd=REPO,
                             capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"FAIL {name}: timeout {timeout:.0f}s", flush=True)
        return False
    sys.stdout.write(out.stdout[-2000:])
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        print(f"FAIL {name}: rc={out.returncode}", flush=True)
        return False
    print(f"PASS {name}", flush=True)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()

    backend = probe()
    print(f"backend: {backend}")
    if backend not in ("tpu", "axon") and not args.allow_cpu:
        print("no TPU reachable (pass --allow-cpu to run anyway)")
        return 2

    ok = True
    ok &= run("bench", [sys.executable, "bench.py"], 900)
    ok &= run("kernel-parity",
              [sys.executable, "-m", "pytest", "-q",
               "tests/test_ops.py", "-k",
               "viterbi or gru or dtw or seqmap or tm_matches or crf or "
               "fused"],
              1800)
    ok &= run("crf-device-stitch",
              [sys.executable, "-m", "pytest", "-q",
               "tests/test_chunking.py", "-k",
               "crf_device_stitch or fast_mode_all_kinds"], 900)
    ok &= run("roofline", [sys.executable, "scripts/roofline.py"], 900)
    ok &= run("engine-bench",
              [sys.executable, "scripts/bench_engine.py"], 1200)
    ok &= run("engine-bench-rnnrf",
              [sys.executable, "scripts/bench_engine.py", "--model",
               "rnnrf_r94", "--nreads", "16"], 1200)
    ok &= run("engine-bench-raw",
              [sys.executable, "scripts/bench_engine.py", "--model",
               "raw_r94", "--nreads", "32", "--modes", "fast"], 1200)
    ok &= run("streaming-serving",
              [sys.executable, "-m", "pytest", "-q",
               "tests/test_streaming.py", "tests/test_streaming_events.py",
               "tests/test_serve.py"], 1800)
    ok &= run("stream-bench",
              [sys.executable, "scripts/bench_stream.py", "--seconds", "15"],
              900)
    print("ALL PASS" if ok else "FAILURES above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Build libscrappie_host.so with g++ (no external build deps).

Run `python -m scrappie_tpu.native.build`, or let bindings.py build
lazily on first import (cached by source mtime).
"""

from __future__ import annotations

import pathlib
import subprocess

SRC = pathlib.Path(__file__).parent / "src" / "host_kernels.cpp"
LIB = pathlib.Path(__file__).parent / "libscrappie_host.so"


def build(force: bool = False) -> pathlib.Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        # no FMA contraction: the t-stat kernel must round every
        # multiply-add exactly like the numpy reference port
        # (bit-identical parity, tests/test_signal.py)
        "-ffp-contract=off",
        str(SRC), "-o", str(LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))

"""Benchmark: raw-signal basecalling throughput (samples/s) on one chip.

Measures the fully-fused device pipeline on the flagship rgrgr_r94
model — conv -> 5 Pallas GRU kernels (input projection fused) -> fused
posterior-head + transducer-Viterbi Pallas kernel -> backtrace kernel —
the same work `scrappie raw` does per read (minus host string assembly,
which overlaps with device compute in production).  Viterbi paths are
bit-identical to the lax.scan reference programs (tests/test_ops.py).

GROUPS batches are processed inside one jitted call (lax.map) because
the tunnelled TPU in this environment adds ~30 ms of per-call latency
that real deployments do not have; grouping amortises it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is versus the measured scrappie CPU throughput recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# MEASURED scrappie CPU samples/s for rgrgr_r94: the reference compute
# path (nanonet_rgrgr_r94_posterior + decode_transducer + overlapper)
# built from source (gcc -O3 -march=native + OpenBLAS) with our exported
# weights, run on a bundled read.  65.4k samples/s on one Xeon 2.7GHz
# core; scrappie's parallelism is read-level across cores.  See
# BASELINE.md and scripts/build_baseline.sh.
BASELINE_CPU_SAMPLES_PER_SEC = 65_400.0

CHUNK_LEN = 10000
BATCH = 256
GROUPS = 8
WARMUP = 2
ITERS = 5


def _watchdog(seconds: float = 900.0):
    """Hard-exit with a JSON error line if the bench wedges.

    The tunnelled TPU's relay process can die mid-session, after which
    device calls hang forever instead of failing; a silent hang would
    stall the caller.  A daemon timer bounds the whole run.
    """
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "rgrgr_r94 raw samples/sec/chip",
            "value": 0.0,
            "unit": "samples/s",
            "vs_baseline": 0.0,
            "error": f"bench exceeded {seconds:.0f}s (device unreachable?)",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def main():
    import jax
    import jax.numpy as jnp

    _watchdog()

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.ops.pipeline import rgrgr_basecall_fused

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("rgrgr_r94").items()}

    rng = np.random.default_rng(0)
    sigs = jnp.asarray(
        rng.standard_normal((GROUPS, BATCH, CHUNK_LEN, 1)), dtype=jnp.float32
    )

    @jax.jit
    def pipeline(params, sigs):
        return jax.lax.map(
            lambda s: rgrgr_basecall_fused(
                params, s, conv_activation=spec.conv_activation,
                stride=spec.stride),
            sigs,
        )

    # Warmup / compile.  One tiny host transfer forces completion (the
    # tunneled TPU's block_until_ready is unreliable; every transfer is
    # one ~30ms round trip, so sync on a single element only).
    for _ in range(WARMUP):
        score, path = pipeline(params, sigs)
        np.asarray(score.ravel()[0])

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        score, path = pipeline(params, sigs)
        np.asarray(score.ravel()[0])
        times.append(time.perf_counter() - t0)

    best = min(times)
    samples = GROUPS * BATCH * CHUNK_LEN
    sps = samples / best
    print(
        json.dumps(
            {
                "metric": "rgrgr_r94 raw samples/sec/chip (fused conv+GRU+posterior+Viterbi decode)",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / BASELINE_CPU_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

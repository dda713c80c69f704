"""Benchmark: raw-signal basecalling throughput (samples/s) on one chip.

Measures the full device pipeline on the flagship rgrgr_r94 model —
chunked posterior network + on-device transducer Viterbi decode — the
same work `scrappie raw` does per read (minus host string assembly,
which overlaps with device compute in production).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is versus the estimated scrappie CPU throughput recorded in
BASELINE.md (the reference publishes no numbers and its raw-model weight
headers are missing, so the baseline is a measured-compute-path /
roofline estimate; see BASELINE.md).
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
BATCH = 32
WARMUP = 2
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from scrappie_tpu.decode.transducer import (
        viterbi_local_backtrace,
        viterbi_transducer_scores,
    )
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("rgrgr_r94").items()}

    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((BATCH, CHUNK_LEN, 1)), dtype=jnp.float32)

    @jax.jit
    def pipeline(params, sig):
        lp = forward.rgrgr_posterior(
            params, sig, conv_activation=spec.conv_activation, stride=spec.stride
        )
        final, tb = viterbi_transducer_scores(lp, 0.0, 0.0, 2.0, False)
        score, path = viterbi_local_backtrace(final, tb)
        return score, path

    # Warmup / compile.  The tunneled TPU platform's block_until_ready is
    # unreliable; a host transfer of the (tiny) outputs forces completion.
    for _ in range(WARMUP):
        score, path = pipeline(params, sig)
        np.asarray(score)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        score, path = pipeline(params, sig)
        np.asarray(score)
        np.asarray(path[:, -1])
        times.append(time.perf_counter() - t0)

    best = min(times)
    samples = BATCH * CHUNK_LEN
    sps = samples / best
    print(
        json.dumps(
            {
                "metric": "rgrgr_r94 raw samples/sec/chip (posterior + on-device Viterbi decode)",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / BASELINE_CPU_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

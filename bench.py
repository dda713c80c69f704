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

# CPU-fallback sizes (single core; used only when the TPU is unreachable).
CPU_BATCH = 8
CPU_GROUPS = 1
CPU_WARMUP = 1
CPU_ITERS = 3


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


def _device_alive(timeout: float = 150.0, attempts: int = 3) -> bool:
    """Probe the default JAX backend in a killable subprocess.

    The tunnelled TPU's relay process can die mid-session, after which
    device calls in *this* process would hang forever instead of
    failing.  Probing in a child converts that hang into a clean,
    bounded CPU fallback (the child is killed on timeout; the parent
    has not initialised any backend yet).  The probe retries: a single
    attempt was observed to fail transiently right after a tunnel
    restart while a retry seconds later succeeded, and a spurious CPU
    fallback costs a whole round's device measurement.
    """
    import subprocess

    code = ("import jax, numpy as np;"
            "np.asarray(jax.numpy.ones((2, 2)).sum());"
            "print(jax.default_backend())")
    for attempt in range(attempts):
        try:
            out = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                                 capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            continue
        if out.returncode == 0 and out.stdout.strip() in ("tpu", "axon"):
            return True
        time.sleep(min(10.0, 2.0 * (attempt + 1)))
    return False


def main():
    _watchdog()
    on_device = _device_alive()

    import jax

    if not on_device:
        # Must happen before any backend use; the env var alone is
        # overridden by this environment's sitecustomize.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("rgrgr_r94").items()}

    groups, batch = (GROUPS, BATCH) if on_device else (CPU_GROUPS, CPU_BATCH)
    warmup, iters = (WARMUP, ITERS) if on_device else (CPU_WARMUP, CPU_ITERS)

    rng = np.random.default_rng(0)
    sigs = jnp.asarray(
        rng.standard_normal((groups, batch, CHUNK_LEN, 1)), dtype=jnp.float32
    )

    if on_device:
        import functools

        from scrappie_tpu.ops.pipeline import rgrgr_basecall_fused

        @functools.partial(jax.jit, static_argnames=("prec_name",))
        def pipeline(params, sigs, prec_name="highest"):
            return jax.lax.map(
                lambda s: rgrgr_basecall_fused(
                    params, s, conv_activation=spec.conv_activation,
                    stride=spec.stride, prec_name=prec_name),
                sigs,
            )
    else:
        # Same compute, lax.scan path (the Pallas kernels only run in
        # slow interpret mode off-TPU).  Numbers are an honest CPU
        # measurement, flagged in the JSON below.
        from scrappie_tpu.decode.transducer import viterbi_decode_batch
        from scrappie_tpu.models.forward import rgrgr_posterior

        @jax.jit
        def pipeline(params, sigs):
            return jax.lax.map(
                lambda s: viterbi_decode_batch(
                    rgrgr_posterior(params, s,
                                    conv_activation=spec.conv_activation,
                                    stride=spec.stride)),
                sigs,
            )

    from scrappie_tpu.nn import config as nn_config

    def measure(prec_name=None):
        """Best-of-iters samples/s at the given kernel precision.

        Warmup compiles; one tiny host transfer forces completion (the
        tunneled TPU's block_until_ready is unreliable; every transfer
        is one ~30ms round trip, so sync on a single element only).
        """
        if on_device:
            call = lambda: pipeline(params, sigs, prec_name=prec_name)
        else:
            call = lambda: pipeline(params, sigs)
        for _ in range(warmup):
            score, path = call()
            np.asarray(score.ravel()[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            score, path = call()
            np.asarray(score.ravel()[0])
            times.append(time.perf_counter() - t0)
        return groups * batch * CHUNK_LEN / min(times)

    if on_device:
        # Headline: the bf16 production fast path (one MXU pass).  The
        # exactness-critical Viterbi expansion matmuls stay exact
        # regardless (ops/viterbi.py), and measured real-read basecall
        # identity is unchanged vs exact f32 (BASELINE.md: 0.751/0.799
        # bf16 vs 0.750/0.799 f32 on the bundled truth reads).
        with nn_config.precision("default"):
            sps = measure("default")
        with nn_config.precision("highest"):
            sps_exact = measure("highest")
    else:
        sps = measure()
        sps_exact = sps

    def measure_model(model: str, prec_name="default"):
        """Fused fast-path throughput for the other model kinds
        (round 3: raw_r94 biGRU and rnnrf CRF fast paths)."""
        import functools

        from scrappie_tpu.ops.pipeline import (raw_basecall_fused,
                                               rnnrf_basecall_fused)

        mspec = RAW_MODELS[model]
        mparams = {k: jnp.asarray(v)
                   for k, v in registry.load_params(model).items()}
        if mspec.kind == "raw":
            fused = functools.partial(raw_basecall_fused,
                                      stride=mspec.stride,
                                      prec_name=prec_name)
        else:
            fused = functools.partial(rnnrf_basecall_fused,
                                      conv_activation=mspec.conv_activation,
                                      stride=mspec.stride)

        @jax.jit
        def pipe(params, sigs):
            return jax.lax.map(lambda s: fused(params, s), sigs)

        for _ in range(warmup):
            score, _ = pipe(mparams, sigs)
            np.asarray(score.ravel()[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            score, _ = pipe(mparams, sigs)
            np.asarray(score.ravel()[0])
            times.append(time.perf_counter() - t0)
        return groups * batch * CHUNK_LEN / min(times)

    def measure_events(prec_name="default"):
        """Fused events fast path (round 4): window -> 2x biLSTM Pallas
        kernels -> fused head+Viterbi.  Blocks are EVENTS (stride 1);
        throughput is reported in events/s and converted to raw-signal
        samples/s with the bundled-read ratio (~5.0 samples/event on
        ch174, BASELINE.md) for comparability."""
        import functools

        from scrappie_tpu.ops.pipeline import events_basecall_fused

        T_EV = 2048
        eparams = {k: jnp.asarray(v)
                   for k, v in registry.load_params("nanonet_events").items()}
        feats = jnp.asarray(
            rng.standard_normal((groups, batch, T_EV, 4)), dtype=jnp.float32)
        fused = functools.partial(events_basecall_fused,
                                  prec_name=prec_name)

        @jax.jit
        def pipe(params, feats):
            return jax.lax.map(lambda f: fused(params, f), feats)

        for _ in range(warmup):
            score, _ = pipe(eparams, feats)
            np.asarray(score.ravel()[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            score, _ = pipe(eparams, feats)
            np.asarray(score.ravel()[0])
            times.append(time.perf_counter() - t0)
        return groups * batch * T_EV / min(times)

    def measure_ensemble(prec_name="default"):
        """Fused 3:1:1 rgrgr ensemble fast path (round 5): the K member
        stacks run in one device program, posteriors combine in VMEM
        before the fused head+Viterbi (ops/pipeline.ensemble_basecall_
        fused) — the production --ensemble --fast configuration."""
        import functools

        from scrappie_tpu.ops.pipeline import ensemble_basecall_fused

        models = ("rgrgr_r94", "rgrgr_r941", "rgrgr_r10")
        w = np.array([3.0, 1.0, 1.0], np.float32)
        w /= w.sum()
        plist = tuple({k: jnp.asarray(v)
                       for k, v in registry.load_params(m).items()}
                      for m in models)
        acts = tuple(RAW_MODELS[m].conv_activation for m in models)
        fused = functools.partial(ensemble_basecall_fused,
                                  kinds=("rgrgr",) * 3,
                                  conv_activations=acts, stride=5,
                                  prec_name=prec_name)

        @jax.jit
        def pipe(plist, sigs):
            return jax.lax.map(lambda s: fused(plist, w, s), sigs)

        for _ in range(warmup):
            score, _ = pipe(plist, sigs)
            np.asarray(score.ravel()[0])
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            score, _ = pipe(plist, sigs)
            np.asarray(score.ravel()[0])
            times.append(time.perf_counter() - t0)
        return groups * batch * CHUNK_LEN / min(times)

    result = {
        "metric": "rgrgr_r94 raw samples/sec/chip (fused conv+GRU+posterior+Viterbi decode, bf16 fast path)",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_CPU_SAMPLES_PER_SEC, 2),
        "exact_f32_samples_per_sec": round(sps_exact, 1),
        "precision": "bf16 matmuls, f32 accumulation; real-read identity unchanged vs f32 (BASELINE.md)",
    }
    if on_device:
        with nn_config.precision("default"):
            result["raw_r94_samples_per_sec"] = round(
                measure_model("raw_r94"), 1)
            result["rnnrf_r94_samples_per_sec"] = round(
                measure_model("rnnrf_r94"), 1)
            ev_per_sec = measure_events()
            result["nanonet_events_events_per_sec"] = round(ev_per_sec, 1)
            # samples/event measured on the bundled ch174 read (16,232
            # events over 80,790 trimmed samples — BASELINE.md round 4)
            result["nanonet_events_samples_per_sec"] = round(
                ev_per_sec * 5.0, 1)
            result["ensemble_3model_samples_per_sec"] = round(
                measure_ensemble(), 1)
    if not on_device:
        result["platform"] = "cpu"
        result["precision"] = "f32 (precision flags are no-ops on the CPU backend)"
        result["note"] = ("TPU tunnel unreachable at bench time; this is the "
                          "lax.scan path on one CPU core. Device-verified TPU "
                          "numbers (2026-08-21, this round's tree): 107.1M "
                          "samples/s bf16 / 66.8M exact f32 flagship, raw_r94 "
                          "54.9M, rnnrf_r94 64.8M, events 16.4M ev/s, "
                          "3-model fused ensemble 61.2M "
                          "(BENCH_r04.json + BASELINE.md round 5).")
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

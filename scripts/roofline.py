"""Roofline accounting for the fused rgrgr_r94 pipeline (SURVEY §7 step 7).

Computes the analytic FLOPs/sample of the flagship model, times every
stage of the fused device pipeline separately (conv, each GRU layer,
posterior-head+Viterbi, backtrace), and sweeps the kernel scheduling
knobs (CT time-unroll, batch tile).  Each timed region loops the stage
K times inside one jit so the tunnel's ~30 ms/call RPC latency
amortises away.

Output: a markdown-ready table of measured time per stage vs the
compute/memory bounds, and the implied speed-of-light for the whole
pipeline.  Results land in BASELINE.md's roofline section.

Behavioural anchor: the stage list mirrors ref calculate_post
(src/scrappie_raw.c:265-314); the recurrence being rooflined is the
per-step GEMV loop at src/layers.c:472-527.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
import time

import numpy as np

# v5e per-chip peaks (public: cloud.google.com/tpu/docs/v5e).
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0
# f32 "HIGHEST" runs 6 bf16 passes per matmul -> ~1/6 of bf16 peak.
PEAK_F32_TFLOPS = PEAK_BF16_TFLOPS / 6.0


def model_flops_per_sample(spec, S=96, Sp=128):
    """Analytic FLOPs/sample for conv + 5 GRUs + head + Viterbi.

    Uses the PADDED sizes the kernels actually compute (Sp=128 lanes),
    and the logical sizes for the XLA conv.  2 FLOPs per MAC.
    """
    st = spec.stride
    nstate = spec.nstate
    conv = 2 * spec.conv_winlen * 1 * spec.conv_nfilter / st  # per sample
    # per block, per GRU layer (padded): proj [*,Sp]x[Sp,3Sp],
    # rec h@sW [*,Sp]x[Sp,2Sp], (r*h)@sW2 [*,Sp]x[Sp,Sp]
    gru_blk = 2 * (Sp * 3 * Sp + Sp * 2 * Sp + Sp * Sp)
    gru = 5 * gru_blk / st
    # padded head GEMM (nstate lane-padded to 1152 in the fused kernel)
    nsp = -(-nstate // 128) * 128
    head = 2 * Sp * nsp / st
    nhist = nstate - 1
    # Viterbi MXU work per block: the one-hot lane expansions
    # (ops/viterbi.py _expand = 3 exact bf16 passes, + 1 pass for the
    # traceback smallint expansion), for the step (q=nhist/4) and skip
    # (q=nhist/16) moves.  The max/compare/select DP itself is VPU.
    vit = (4 * 2 * (nhist // 4) * nhist      # step: 3-pass expand + ptb
           + 4 * 2 * (nhist // 16) * nhist   # skip: 3-pass expand + ptb
           ) / st
    vit_vpu = nstate * 21 / st               # VPU compare/select ops
    return dict(conv=conv, gru=gru, head=head, viterbi_mxu=vit,
                viterbi_vpu_ops=vit_vpu,
                total=conv + gru + head + vit)


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def loop_jit(stage_fn, nrep):
    """jit(x -> stage applied nrep times), amortising RPC latency.

    The stage output feeds the next iteration (same shape), so XLA
    cannot elide the loop; reduces to one scalar to minimise transfer.
    """

    @jax.jit
    def run(x):
        def body(i, x):
            return stage_fn(x)

        return jax.lax.fori_loop(0, nrep, body, x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=10000)
    ap.add_argument("--nrep", type=int, default=8)
    ap.add_argument("--prec", default="default", choices=["default", "highest"])
    ap.add_argument("--sweep", action="store_true", help="CT/tile sweeps")
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.ops import LANE
    from scrappie_tpu.ops import round_up as _round_up
    from scrappie_tpu.ops.gru import gru_layer_fused_tm, pad_gru_params
    from scrappie_tpu.ops.viterbi import viterbi_backtrace_tm, viterbi_fused_tm
    from scrappie_tpu.nn.layers import conv1d, elu

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("rgrgr_r94").items()}
    B, T = args.batch, args.chunk
    nblock = T // spec.stride
    prec = args.prec
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((B, T, 1)), jnp.float32)

    fl = model_flops_per_sample(spec)
    print("== analytic FLOPs/sample (padded compute) ==")
    for k, v in fl.items():
        print(f"  {k:8s} {v:10.0f}")

    samples = B * T

    # ---- stage: conv (XLA) ----
    W = params["conv_W"]
    cpad = _round_up(W.shape[2], LANE) - W.shape[2]
    Wp = jnp.pad(W, ((0, 0), (0, 0), (0, cpad)))
    bp = jnp.pad(params["conv_b"], (0, cpad))

    conv_stage = lambda s: elu(conv1d(s, Wp, bp, spec.stride))
    t_conv = timeit(jax.jit(
        lambda s: jax.lax.fori_loop(
            0, args.nrep, lambda i, a: a + conv_stage(s)[0, 0, 0], 0.0)), sig)
    t_conv /= args.nrep

    # ---- stages: the 5 fused GRU layers ----
    x0 = jnp.moveaxis(conv_stage(sig), 0, 1)  # [nblock, B, 128]
    from scrappie_tpu.models.specs import GRU_DIRS

    gru_times = []
    for i, d in enumerate(GRU_DIRS, start=1):
        pre = f"gru{d.upper()}{i}"
        iWp, bgp, sWp, sW2p = pad_gru_params(
            params[f"{pre}_iW"], params[f"{pre}_b"], params[f"{pre}_sW"],
            params[f"{pre}_sW2"], in_pad=x0.shape[-1])
        stage = functools.partial(gru_layer_fused_tm, iWp=iWp, bp=bgp,
                                  sWp=sWp, sW2p=sW2p, reverse=(d == "b"),
                                  prec_name=prec)
        t = timeit(loop_jit(lambda x: stage(x), args.nrep), x0) / args.nrep
        gru_times.append(t)
        print(f"  gru{i}({d}) {t*1e3:8.2f} ms  "
              f"{samples/t/1e6:8.1f} M samples/s/layer")

    # ---- stage: fused head+Viterbi + backtrace ----
    x5 = x0
    ct = next(c for c in (4, 2, 1) if x5.shape[0] % c == 0)
    vit_stage = functools.partial(
        viterbi_fused_tm, W=params["FF_W"], bvec=params["FF_b"], ct=ct,
        prec_name=prec)

    @jax.jit
    def vit_loop(x):
        def body(i, acc):
            f, tb = vit_stage(x)
            return acc + f[0, 0]

        return jax.lax.fori_loop(0, args.nrep, body, 0.0)

    t_vit = timeit(vit_loop, x5) / args.nrep

    final, tb = jax.jit(vit_stage)(x5)

    @jax.jit
    def bt_loop(f, tb):
        def body(i, acc):
            s, p = viterbi_backtrace_tm(f, tb)
            return acc + s[0]

        return jax.lax.fori_loop(0, args.nrep, body, 0.0)

    t_bt = timeit(bt_loop, final, tb) / args.nrep

    t_total = t_conv + sum(gru_times) + t_vit + t_bt
    peak = PEAK_BF16_TFLOPS if prec == "default" else PEAK_F32_TFLOPS

    print(f"\n== stage times (B={B}, T={T}, prec={prec}) ==")
    rows = [("conv(XLA)", t_conv, fl["conv"]),
            ("5x GRU", sum(gru_times), fl["gru"]),
            ("head+viterbi", t_vit, fl["head"] + fl["viterbi_mxu"]),
            ("backtrace", t_bt, 0.0)]
    for name, t, f in rows:
        tf = f * samples / t / 1e12 if t else 0.0
        print(f"  {name:14s} {t*1e3:8.2f} ms  {samples/t/1e6:8.1f} Msamp/s"
              f"  {tf:6.2f} TFLOP/s ({100*tf/peak:5.1f}% of {prec} peak)")
    print(f"  {'TOTAL':14s} {t_total*1e3:8.2f} ms  "
          f"{samples/t_total/1e6:8.1f} Msamp/s  "
          f"{fl['total']*samples/t_total/1e12:6.2f} TFLOP/s")

    if args.sweep:
        print("\n== GRU CT / batch-tile sweep (layer 1 fwd) ==")
        import scrappie_tpu.ops.gru as grumod

        pre = "gruF2"
        iWp, bgp, sWp, sW2p = pad_gru_params(
            params[f"{pre}_iW"], params[f"{pre}_b"], params[f"{pre}_sW"],
            params[f"{pre}_sW2"], in_pad=x0.shape[-1])
        orig = grumod._pick_batch_tile
        try:
            for tile_limit in (128, 256, 512):
                grumod._pick_batch_tile = functools.partial(
                    orig, limit=tile_limit)
                for ct in (4, 8, 16, 32):
                    try:
                        stage = functools.partial(
                            gru_layer_fused_tm, iWp=iWp, bp=bgp, sWp=sWp,
                            sW2p=sW2p, ct=ct, prec_name=prec)
                        t = timeit(loop_jit(lambda x: stage(x), args.nrep),
                                   x0) / args.nrep
                        print(f"  tile<={tile_limit:4d} ct={ct:3d} "
                              f"{t*1e3:8.2f} ms  "
                              f"{samples/t/1e6:8.1f} Msamp/s")
                    except Exception as e:
                        print(f"  tile<={tile_limit:4d} ct={ct:3d} "
                              f"FAILED: {str(e)[:100]}")
        finally:
            grumod._pick_batch_tile = orig

        print("\n== Viterbi head ct / batch-tile sweep ==")
        import scrappie_tpu.ops.viterbi as vitmod

        origv = vitmod._pick_batch_tile
        try:
            for tile_limit in (128, 256):
                vitmod._pick_batch_tile = functools.partial(
                    origv, limit=tile_limit)
                for ct in (2, 4, 8, 16):
                    if x5.shape[0] % ct:
                        continue
                    try:
                        stage = functools.partial(
                            viterbi_fused_tm, W=params["FF_W"],
                            bvec=params["FF_b"], ct=ct, prec_name=prec)

                        @jax.jit
                        def vloop(x):
                            def body(i, acc):
                                f, tb = stage(x)
                                return acc + f[0, 0]

                            return jax.lax.fori_loop(0, args.nrep, body, 0.0)

                        t = timeit(vloop, x5) / args.nrep
                        print(f"  tile<={tile_limit:4d} ct={ct:3d} "
                              f"{t*1e3:8.2f} ms  "
                              f"{samples/t/1e6:8.1f} Msamp/s")
                    except Exception as e:
                        print(f"  tile<={tile_limit:4d} ct={ct:3d} "
                              f"FAILED: {str(e)[:120]}")
        finally:
            vitmod._pick_batch_tile = origv


if __name__ == "__main__":
    main()

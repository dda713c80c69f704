"""Train the raw basecall models on simulated squiggle data and save them.

The reference's raw-model weights are missing from the snapshot (broken
symlinks, SURVEY.md section 0); this script replaces the initial
synthetic weights with models actually fitted to reads simulated by the
real squiggle_r94 model, so basecalls recover the underlying sequence
and the end-to-end pipeline is exercised realistically.

Usage: python scripts/train_models.py [model ...] [--steps N] [--eval-only]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()



def evaluate_events(params, n_reads: int = 4, nevent: int = 1500, seed: int = 1234):
    """Basecall simulated event tables; mean identity vs the labelled truth."""
    import numpy as np
    import Levenshtein

    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.models import forward
    from scrappie_tpu.models.specs import KMER_LEN, NSTATE_TRANSDUCER
    from scrappie_tpu.post.overlapper import overlapper
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sim = SquiggleSimulator(seed=seed)
    feats, labels, truths = sim.detected_events_batch(n_reads, nevent,
                                                      return_truth=True)
    lp = np.asarray(forward.events_posterior(params, feats))
    idents = []
    for b in range(n_reads):
        score, path = decode_transducer(lp[b], 0.0, 0.0, 2.0)
        call = overlapper(path, NSTATE_TRANSDUCER - 1) or ""
        truth = truths[b]
        if not truth:
            continue
        idents.append(1.0 - Levenshtein.distance(call, truth)
                      / max(len(truth), len(call), 1))
    return float(np.mean(idents)) if idents else 0.0


def evaluate(model: str, params, n_reads: int = 6, nsample: int = 12_000, seed: int = 1234):
    """Basecall simulated reads; return mean identity vs the true sequence."""
    if model == "nanonet_events":
        return evaluate_events(params, n_reads=max(3, n_reads // 2), seed=seed)
    import jax.numpy as jnp
    import Levenshtein

    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.models import forward
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.post.overlapper import overlapper
    from scrappie_tpu.train.simulate import SquiggleSimulator

    spec = RAW_MODELS[model]
    sim = SquiggleSimulator(seed=seed)
    idents = []
    for _ in range(n_reads):
        seqlen = nsample // 9
        sig, bases, base_at = sim.simulate_read(seqlen)
        sig = sig[: nsample]
        med = np.median(sig)
        mad = np.median(np.abs(sig - med)) * 1.4826
        norm = ((sig - med) / mad).astype(np.float32)
        true_seq = "".join("ACGT"[b] for b in bases[: base_at[len(sig) - 1] + 1])

        kwargs = dict(stride=spec.stride)
        if spec.kind == "rgrgr":
            lp = forward.rgrgr_posterior(params, norm.reshape(1, -1, 1),
                                         conv_activation=spec.conv_activation, **kwargs)
        elif spec.kind == "rnnrf":
            lp = forward.rnnrf_transitions(params, norm.reshape(1, -1, 1),
                                           conv_activation=spec.conv_activation,
                                           stride=spec.stride)
        else:
            lp = forward.raw_posterior(params, norm.reshape(1, -1, 1), **kwargs)
        lp = np.asarray(lp)[0]
        if spec.kind == "rnnrf":
            from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf

            score, path = decode_crf(lp)
            call = crfpath_to_basecall(path) or ""
        else:
            score, path = decode_transducer(lp, 0.0, 0.0, 2.0)
            call = overlapper(path, lp.shape[1] - 1) or ""
        ident = 1.0 - Levenshtein.distance(call, true_seq) / max(len(true_seq), len(call), 1)
        idents.append(ident)
    return float(np.mean(idents))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nsample", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    from scrappie_tpu.models import registry
    from scrappie_tpu.train.trainer import train

    models = args.models or ["rgrgr_r94"]
    for model in models:
        params = registry.load_params(model)
        if not args.eval_only:
            ident0 = evaluate(model, params, n_reads=3)
            print(f"[{model}] identity before training: {ident0:.3f}", flush=True)
            t0 = time.time()
            params, losses = train(model, steps=args.steps, batch=args.batch,
                                   nsample=args.nsample, lr=args.lr, params=params,
                                   log_every=50)
            print(f"[{model}] {args.steps} steps in {time.time()-t0:.0f}s, "
                  f"final loss {losses[-1]:.3f}", flush=True)
            if not all(np.isfinite(v).all() for v in params.values()):
                print(f"[{model}] training diverged (non-finite params); "
                      "NOT saving", flush=True)
                continue
            npz = registry.PARAMS_DIR / f"{model}.npz"
            np.savez(npz, **params)
            registry._cache.pop(model, None)
            print(f"[{model}] saved to {npz}", flush=True)
        ident = evaluate(model, params)
        print(f"[{model}] identity vs simulated truth: {ident:.3f}", flush=True)


if __name__ == "__main__":
    main()

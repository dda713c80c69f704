"""Measure per-model strict held-out-tail identity with the shipped
weights — sets the tail floors in tests/test_real_accuracy.py
(VERDICT r4 #4: whole-read floors reward training-region memorisation,
BASELINE.md 'Whole-region training ... refuted').

Usage: python scripts/measure_tails.py [model ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

import Levenshtein
import numpy as np


def identity(a, b):
    return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)


def tail_identity(model: str) -> float:
    import jax.numpy as jnp

    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import NSTATE_TRANSDUCER, RAW_MODELS
    from scrappie_tpu.post.overlapper import overlapper
    from scrappie_tpu.train.realdata import (RealReadSampler,
                                             load_labelled_reads)

    params = {k: jnp.asarray(v) for k, v in registry.load_params(model).items()}
    reads = load_labelled_reads("rgrgr_r94")
    if model == "nanonet_events":
        from scrappie_tpu.train.realdata import RealEventSampler

        sampler = RealEventSampler(reads, seed=0)
    else:
        sampler = RealReadSampler(reads, seed=0)
    idents = []
    for ridx in range(len(sampler.reads)):
        if model == "nanonet_events":
            feats, truth = sampler.eval_events(ridx, whole=False)
            if not truth:
                continue
            lp = np.asarray(forward.events_posterior(
                params, jnp.asarray(feats)[None], return_log=True))[0]
            _, path = decode_transducer(lp, 0.0, 0.0, 2.0)
            call = overlapper(path[: lp.shape[0]], NSTATE_TRANSDUCER - 1) or ""
        else:
            spec = RAW_MODELS[model]
            sig, truth = sampler.eval_segment(ridx)
            if not truth:
                continue
            n = (len(sig) // spec.stride) * spec.stride
            x = jnp.asarray(sig[:n], jnp.float32)[None, :, None]
            if spec.kind == "rnnrf":
                trans = np.asarray(forward.rnnrf_transitions(
                    params, x, conv_activation=spec.conv_activation,
                    stride=spec.stride))[0]
                _, path = decode_crf(trans[None])
                call = crfpath_to_basecall(np.asarray(path)[0]) or ""
            else:
                if spec.kind == "rgrgr":
                    lp = np.asarray(forward.rgrgr_posterior(
                        params, x, conv_activation=spec.conv_activation,
                        stride=spec.stride, return_log=True))[0]
                else:
                    lp = np.asarray(forward.raw_posterior(
                        params, x, stride=spec.stride, return_log=True))[0]
                _, path = decode_transducer(lp, 0.0, 0.0, 2.0)
                call = overlapper(path, lp.shape[1] - 1) or ""
        ident = identity(call, truth)
        print(f"  {model} read {ridx}: called {len(call)} truth "
              f"{len(truth)} identity {ident:.4f}", flush=True)
        idents.append(ident)
    return float(np.mean(idents))


def main():
    models = sys.argv[1:] or ["rgrgr_r94", "rgrgr_r941", "rgrgr_r10",
                              "raw_r94", "rnnrf_r94", "nanonet_events"]
    for m in models:
        print(f"{m}: mean tail identity {tail_identity(m):.4f}", flush=True)


if __name__ == "__main__":
    main()

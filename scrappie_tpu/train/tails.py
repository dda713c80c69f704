"""Strict held-out-tail identity of the shipped weights.

ONE implementation of the tail measurement, shared by the floor test
(tests/test_real_accuracy.py::test_tail_identity_floor) and the
measurement script (scripts/measure_tails.py) so the measured floors
and the CI guard can never drift apart (round-5 review finding).

Protocol: the tail 25% of each bundled truth read — the region no
training window or region ever touched (BASELINE.md "Whole-region
training ... refuted on strict held-out tails") — basecalled with the
plain per-model forward + default decode.  Emission layouts match the
production pipelines: transducers emit the whole (nblock+1)-entry
path through the overlapper; the events model emits the first nev
path entries (api.basecall_events / ref src/scrappie_events.c:301).
"""

from __future__ import annotations

import numpy as np


def identity(a: str, b: str) -> float:
    import Levenshtein

    return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)


def tail_identities(model: str, params=None) -> list[tuple[str, str]]:
    """[(call, truth)] over the bundled reads' strict held-out tails."""
    import jax.numpy as jnp

    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import NSTATE_TRANSDUCER, RAW_MODELS
    from scrappie_tpu.post.overlapper import overlapper
    from scrappie_tpu.train.realdata import (RealEventSampler,
                                             RealReadSampler,
                                             load_labelled_reads)

    if params is None:
        params = registry.load_params(model)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    reads = load_labelled_reads("rgrgr_r94")
    sampler = (RealEventSampler(reads, seed=0)
               if model == "nanonet_events" else
               RealReadSampler(reads, seed=0))
    out = []
    for ridx in range(len(sampler.reads)):
        if model == "nanonet_events":
            feats, truth = sampler.eval_events(ridx, whole=False)
            if not truth:
                continue
            lp = np.asarray(forward.events_posterior(
                params, jnp.asarray(feats)[None], return_log=True))[0]
            _, path = decode_transducer(lp, 0.0, 0.0, 2.0)
            call = overlapper(path[: lp.shape[0]],
                              NSTATE_TRANSDUCER - 1) or ""
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
        out.append((call, truth))
    return out


def mean_tail_identity(model: str, params=None,
                       verbose: bool = False) -> float:
    pairs = tail_identities(model, params)
    idents = []
    for i, (call, truth) in enumerate(pairs):
        ident = identity(call, truth)
        if verbose:
            print(f"  {model} read {i}: called {len(call)} truth "
                  f"{len(truth)} identity {ident:.4f}", flush=True)
        idents.append(ident)
    return float(np.mean(idents)) if idents else float("nan")

"""Evaluate CRF (rnnrf) deep-ensembles on the strict held-out tails.

VERDICT r4 #2: train independently-seeded rnnrf members under the
proven whole-region + ch228 protocol, combine their 25 transition
energies log-domain (models/ensemble.py), measure on the strictly
held-out tails.  Ship if >= 0.66 (from the solo 0.6449), else record
the numbers-backed refutation.

Usage:
  python scripts/eval_rnnrf_ensemble.py .cache/rnnrf_seedA.npz \
      .cache/rnnrf_seedB.npz
"""

from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()

import Levenshtein
import numpy as np


def identity(a, b):
    return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)


def main():
    import jax.numpy as jnp

    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.train.realdata import (RealReadSampler,
                                             load_labelled_reads)

    spec = RAW_MODELS["rnnrf_r94"]
    members = {"shipped": registry.load_params("rnnrf_r94")}
    for path in sys.argv[1:]:
        members[os.path.basename(path).replace(".npz", "")] = dict(
            np.load(path))
    members = {k: {n: jnp.asarray(v) for n, v in p.items()}
               for k, p in members.items()}

    sampler = RealReadSampler(load_labelled_reads("rgrgr_r94"), seed=0)
    tails = []
    for ridx in range(len(sampler.reads)):
        sig, truth = sampler.eval_segment(ridx)
        if truth:
            n = (len(sig) // spec.stride) * spec.stride
            tails.append((jnp.asarray(sig[:n], jnp.float32)[None, :, None],
                          truth))

    # one transition matrix per member per tail
    trans = {k: [np.asarray(forward.rnnrf_transitions(
                     p, x, conv_activation=spec.conv_activation,
                     stride=spec.stride))[0] for x, _ in tails]
             for k, p in members.items()}

    def ens_ident(names, weights):
        w = np.asarray(weights, np.float64)
        w = w / w.sum()
        idents = []
        for ti, (_, truth) in enumerate(tails):
            t = sum(wi * trans[nm][ti] for wi, nm in zip(w, names))
            _, path = decode_crf(t[None].astype(np.float32))
            call = crfpath_to_basecall(np.asarray(path)[0]) or ""
            idents.append(identity(call, truth))
        return idents

    names = list(members)
    print(f"tails: {[len(t) for _, t in tails]} truth bases")
    for nm in names:
        idents = ens_ident([nm], [1.0])
        print(f"solo {nm:14s}: {np.mean(idents):.4f} "
              f"({'/'.join(f'{i:.4f}' for i in idents)})", flush=True)
    for r in range(2, len(names) + 1):
        for combo in itertools.combinations(names, r):
            wsets = [(1.0,) * r]
            if combo[0] == "shipped":
                wsets.append((2.0,) + (1.0,) * (r - 1))
            for weights in wsets:
                idents = ens_ident(combo, weights)
                wtag = ":".join(f"{w:g}" for w in weights)
                print(f"ens {'+'.join(combo)} ({wtag}): "
                      f"{np.mean(idents):.4f} "
                      f"({'/'.join(f'{i:.4f}' for i in idents)})", flush=True)


if __name__ == "__main__":
    main()

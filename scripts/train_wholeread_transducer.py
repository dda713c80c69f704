"""Whole-region transducer fine-tuning on the bundled real reads.

The round-4 rnnrf result (BASELINE.md): whole-region lattice training —
one long region per read, alignment marginalised over the full span,
endpoint noise reduced to two ends per ~15k blocks — beat every
window-based protocol for the CRF head.  This applies the same
protocol to the per-block-normalised transducer models (rgrgr_*, raw;
the loss needs no partition term, train/wholeread.py).

Protocol matches train_wholeread_crf.py: training regions are the head
75% of each truth read (plus optionally the pseudo-labelled ch228 read,
self-training); eval basecalls whole reads vs truth.

Also serves nanonet_events: regions are whole-region event tables
(blocks = events, the detector + whole-read studentisation of the
shipping pipeline) with the same lattice loss — see
train/wholeread.region_event_seqstates.

Usage:
  python scripts/train_wholeread_transducer.py --model rgrgr_r94 \
      --steps 120 --sim-every 4 --pseudo-ch228
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rgrgr_r94",
                    choices=["rgrgr_r94", "rgrgr_r941", "rgrgr_r10",
                             "raw_r94", "nanonet_events"])
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--stay-pen", type=float, default=0.0)
    ap.add_argument("--skip-pen", type=float, default=4.0)
    ap.add_argument("--local-pen", type=float, default=4.0)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--train-reads", type=int, nargs="*", default=None)
    ap.add_argument("--eval-reads", type=int, nargs="*", default=None)
    ap.add_argument("--eval-every", type=int, default=30)
    ap.add_argument("--eval-tails", action="store_true", default=False,
                    help="select checkpoints on the strictly-held-out "
                         "read tails instead of whole reads (whole-read "
                         "eval includes the 75%% training region, so "
                         "checkpoint selection on it rewards "
                         "memorisation — measured round 4)")
    ap.add_argument("--sim-every", type=int, default=4,
                    help="every N steps add one simulated window lattice "
                         "step (0 = off)")
    ap.add_argument("--pseudo-ch228", action="store_true", default=False)
    ap.add_argument("--augment", action="store_true", default=False,
                    help="shape-preserving per-step region augmentation "
                         "(raw models only): random gain/offset/noise on "
                         "the region signal, plus random stride-aligned "
                         "crops with -1-padded kmer states.  Fights "
                         "3-region memorisation (round-4 tail probes) "
                         "without retracing jit shapes")
    ap.add_argument("--crop-frac", type=float, default=0.75,
                    help="crop length as a fraction of the full region "
                         "(with --augment)")
    ap.add_argument("--init", default=None)
    ap.add_argument("--save", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp
    import optax

    from finetune_real import eval_real, load_pseudo_ch228, load_reads

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.train import wholeread
    from scrappie_tpu.train.realdata import RealEventSampler, RealReadSampler

    is_events = args.model == "nanonet_events"
    if args.augment and is_events:
        ap.error("--augment is for the raw models; event-feature "
                 "augmentation is not implemented")
    spec = None if is_events else RAW_MODELS[args.model]
    reads = load_reads()
    train_idxs = (args.train_reads if args.train_reads is not None
                  else list(range(len(reads))))
    eval_idxs = (args.eval_reads if args.eval_reads is not None
                 else list(range(len(reads))))
    sampler_cls = RealEventSampler if is_events else RealReadSampler
    eval_sampler = sampler_cls(reads, seed=args.seed)

    if args.init:
        params = dict(np.load(args.init))
    else:
        params = registry.load_params(args.model)
    params = {k: jnp.asarray(v) for k, v in params.items()}

    train_pool = [reads[i] for i in train_idxs]
    if args.pseudo_ch228:
        train_pool.append(load_pseudo_ch228())
    regions = []
    if is_events:
        # Regions are event tables: blocks = events, stride 1; the
        # event sampler holds per-read detector output + kmer maps.
        # The pseudo read has no truth to hold out — train on all of
        # its events, matching the raw branch's frac=1.0.
        train_sampler = RealEventSampler(
            train_pool, seed=args.seed,
            full_train_names=frozenset({"ch228_pseudo"}))
        for i, r in enumerate(train_pool):
            feats, states = wholeread.region_event_seqstates(
                train_sampler, i, args.chunk)
            print(f"[{r.name}] region {len(feats)} events, "
                  f"{len(states)} kmer states", flush=True)
            regions.append((feats[None], states[None, :]))
    elif not args.augment:
        for r in train_pool:
            frac = 1.0 if r.name == "ch228_pseudo" else 0.75
            sig, states = wholeread.region_seqstates(
                r, int(r.nsample * frac), spec.stride, args.chunk)
            print(f"[{r.name}] region {len(sig)} samples -> "
                  f"{len(sig)//spec.stride} blocks, {len(states)} kmer states",
                  flush=True)
            regions.append((sig[None, :, None], states[None, :]))

    aug = None
    if args.augment and not is_events:
        # Per-step crops + gain/offset/noise, fixed jit shapes per read:
        # crop length tc is constant, kmer states pad to the full
        # region's span (lattice masks -1).  Crop starts need no stride
        # alignment — the states are alignment-free.
        from scrappie_tpu.train.realdata import _rolling_kmers
        from scrappie_tpu.models.specs import KMER_LEN

        rng_aug = np.random.default_rng(args.seed + 7)
        aug = []
        for r in train_pool:
            frac = 1.0 if r.name == "ch228_pseudo" else 0.75
            train_end = int(r.nsample * frac)
            unit = spec.stride * args.chunk
            tc = int(train_end * args.crop_frac) // unit * unit
            if not tc:
                raise ValueError(f"{r.name}: region too short to crop")
            ba_all = r.base_at[:train_end]
            v = ba_all[ba_all >= 0]
            lmax = max(int(v.max()) - int(v.min()) - (KMER_LEN - 2), 1)
            aug.append(dict(norm=r.norm, base_at=r.base_at,
                            kmers=_rolling_kmers(r.bases),
                            train_end=train_end, tc=tc, lmax=lmax))
            print(f"[{r.name}] augmented crops: {tc} samples "
                  f"({tc//spec.stride} blocks) from {train_end}, "
                  f"states pad {lmax}", flush=True)

        def aug_region(d):
            hi0 = d["train_end"] - d["tc"]
            s0 = int(rng_aug.integers(hi0 + 1)) if hi0 > 0 else 0
            sig = d["norm"][s0 : s0 + d["tc"]].astype(np.float32)
            sig = sig * (1.0 + 0.06 * rng_aug.standard_normal())
            sig = sig + 0.08 * rng_aug.standard_normal()
            sig = sig + (0.12 * rng_aug.standard_normal(len(sig))
                         ).astype(np.float32)
            ba = d["base_at"][s0 : s0 + d["tc"]]
            v = ba[ba >= 0]
            states = np.full(d["lmax"], -1, np.int32)
            if len(v):
                lo, hi_b = int(v.min()), int(v.max())
                # kmers END at lo+KMER_LEN-1 .. hi_b
                ks = d["kmers"][lo + KMER_LEN - 1 : hi_b + 1]
                ks = ks[: d["lmax"]]
                states[: len(ks)] = ks
            return sig[None, :, None], states[None]

    optimizer = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr)),
        max_consecutive_errors=25)
    opt_state = optimizer.init(params)
    step_fn = wholeread.make_wholeread_transducer_step(
        args.model, optimizer, args.stay_pen, args.skip_pen,
        args.local_pen, args.chunk)

    sim_step = None
    if args.sim_every:
        from scrappie_tpu.train.lattice import make_lattice_train_step
        from scrappie_tpu.train.simulate import SquiggleSimulator

        sim = SquiggleSimulator(seed=args.seed + 1)
        sim_step = make_lattice_train_step(args.model, optimizer,
                                           stay_pen=args.stay_pen,
                                           skip_pen=args.skip_pen,
                                           local_pen=args.local_pen)
        # generous kmer-state cap per window (events: ~1 base/event)
        sim_L = 600 if is_events else 4000 // spec.stride

        def sim_events_seq(b, nevent, L):
            """Detector-sim event batch with kmer seqstates (the
            events analogue of sim.seq_batch, as in finetune_real)."""
            from scrappie_tpu.api import encode_bases
            from scrappie_tpu.models.specs import KMER_LEN

            feats, _, truths = sim.detected_events_batch(
                b, nevent, return_truth=True)
            seqs = np.full((b, L), -1, np.int32)
            for j, t in enumerate(truths):
                if len(t) >= KMER_LEN:
                    st = np.asarray(encode_bases(t, KMER_LEN), np.int32)
                    seqs[j, : min(len(st), L)] = st[:L]
            return feats, seqs

    def run_eval(tag):
        ident = eval_real(args.model, params, eval_sampler, eval_idxs,
                          whole=not args.eval_tails)
        print(f"[{tag}] held-out identity {ident:.4f}", flush=True)
        return ident

    save = args.save or os.path.join(
        os.path.dirname(__file__), "..", ".cache",
        f"wholeread_{args.model}.npz")

    best = (-1.0, None)
    t0 = time.time()
    for i in range(args.steps):
        if aug is not None:
            sig, states = aug_region(aug[i % len(aug)])
        else:
            sig, states = regions[i % len(regions)]
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(sig),
                                          jnp.asarray(states))
        if sim_step is not None and args.sim_every and \
                i % args.sim_every == args.sim_every - 1:
            if is_events:
                sigs, seqs = sim_events_seq(8, 600, sim_L)
            else:
                sigs, seqs = sim.seq_batch(8, 4000, sim_L)
            params, opt_state, _ = sim_step(params, opt_state, sigs, seqs)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: nll/block {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if args.eval_every and (i + 1) % args.eval_every == 0:
            ident = run_eval(f"step {i}")
            if np.isfinite(ident) and ident > best[0]:
                best = (ident, {k: np.asarray(v) for k, v in params.items()})
                # Checkpoint immediately: long CPU runs have been lost to
                # session interrupts; the best-so-far must survive them.
                np.savez_compressed(save, **best[1])
                print(f"checkpointed best ({ident:.4f}) -> {save}",
                      flush=True)

    ident = run_eval("final")
    if np.isfinite(ident) and ident > best[0]:
        best = (ident, {k: np.asarray(v) for k, v in params.items()})

    if best[1] is not None:
        from train_models import evaluate as eval_sim

        simid = eval_sim(args.model, {k: jnp.asarray(v)
                                      for k, v in best[1].items()})
        print(f"best held-out {best[0]:.4f}, sim identity {simid:.4f}",
              flush=True)
        np.savez_compressed(save, **best[1])
        print(f"saved -> {save}", flush=True)


if __name__ == "__main__":
    main()

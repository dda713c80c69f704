"""Fine-tune raw basecall models on the bundled REAL reads.

Labels come from aligning each read's posterior to its truth FASTA
(scrappie_tpu/train/realdata.py).  Training mixes real-read windows with
simulated squiggle batches (train/simulate.py) so the models don't
forget the simulated distribution; eval basecalls the held-out tail of
each read and reports identity vs the truth substring.

Resumable: weights are saved to the registry dir after every run; pass
--steps in slices.

Usage:
  python scripts/finetune_real.py --model rgrgr_r94 --steps 300
  python scripts/finetune_real.py --model rgrgr_r94 --eval-only
  python scripts/finetune_real.py --model rgrgr_r94 --train-reads 0 --eval-reads 1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scrappie_tpu.utils.platform import apply_platform_override

apply_platform_override()


CACHE = os.path.join(os.path.dirname(__file__), "..", ".cache")


def load_reads(label_model: str = "rgrgr_r94", refresh: bool = False):
    """Labelled bundled reads, cached to .cache/realreads.npz."""
    from scrappie_tpu.train.realdata import LabelledRead, load_labelled_reads

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "realreads.npz")
    if os.path.exists(path) and not refresh:
        z = np.load(path, allow_pickle=False)
        names = str(z["names"]).split(",")
        return [
            LabelledRead(n, z[f"norm{i}"], z[f"bases{i}"], z[f"base_at{i}"],
                         float(z[f"score{i}"]))
            for i, n in enumerate(names)
        ]
    reads = load_labelled_reads(label_model)
    arrs = {"names": ",".join(r.name for r in reads)}
    for i, r in enumerate(reads):
        arrs[f"norm{i}"] = r.norm
        arrs[f"bases{i}"] = r.bases
        arrs[f"base_at{i}"] = r.base_at
        arrs[f"score{i}"] = r.map_score
    np.savez_compressed(path, **arrs)
    return reads


def load_pseudo_ch228(refresh: bool = False):
    """The truth-less third bundled read as a pseudo-labelled
    LabelledRead (self-training, round 4): basecalled by the 3:1:1
    posterior ensemble at (stay 0.5, skip 0) — the best teacher that
    is also ROBUST on this out-of-distribution read (held-out tails
    0.7157 vs 0.7110 for the calibrated single model; the full
    (0.5, 0.5) preset partially collapses the ensemble's ch228 call to
    1168 bases vs 1932 single-model, BASELINE.md "Posterior
    ensembling" robustness note) and label-aligned to its own call
    with the standard labelling pipeline.  Train-only — never
    evaluated (no truth exists)."""
    from scrappie_tpu.train.realdata import LabelledRead, label_read

    # Cache is keyed by the teacher configuration: a stale cache from
    # an older teacher would silently diverge from the documented
    # protocol (round-4 review finding).
    teacher = "ens311_stay0.5_skip0"
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "pseudo_ch228.npz")
    if os.path.exists(path) and not refresh:
        z = np.load(path, allow_pickle=False)
        if "teacher" in z and str(z["teacher"]) == teacher:
            return LabelledRead(str(z["name"]), z["norm"], z["bases"],
                                z["base_at"], float(z["score"]))
        print(f"[pseudo-ch228] cache from a different teacher "
              f"({str(z['teacher']) if 'teacher' in z else 'pre-tag'}); "
              f"regenerating with {teacher}", flush=True)
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.types import RawSignal
    from scrappie_tpu.utils.maths import medmad_normalise

    raw = read_raw("/root/reference/reads/read_ch228_file118.fast5",
                   scale_to_pA=True)
    rt = trim_and_segment_raw(RawSignal(raw.raw, uuid=raw.uuid),
                              200, 10, 100, 0.0)
    norm = medmad_normalise(rt.trimmed).astype(np.float32)
    eng = BasecallEngine("rgrgr_r94", batch_size=8,
                         ensemble=("rgrgr_r941", "rgrgr_r10"))
    res = eng.basecall_signals([RawSignal(raw.raw, uuid=raw.uuid)],
                               stay_pen=0.5, skip_pen=0.0)[0]
    if not res.sequence:
        raise RuntimeError("pseudo-labelling basecall failed on ch228")
    r = label_read(norm, res.sequence, name="ch228_pseudo")
    np.savez_compressed(path, name=r.name, norm=r.norm, bases=r.bases,
                        base_at=r.base_at, score=r.map_score,
                        teacher=teacher)
    return r


def eval_real(model: str, params, sampler, read_idxs, whole: bool = False):
    """Basecall held-out tails (or whole reads); mean identity vs truth."""
    import functools

    import jax.numpy as jnp
    import Levenshtein

    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf
    from scrappie_tpu.models import forward
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.post.overlapper import overlapper

    if model == "nanonet_events":
        from scrappie_tpu.models.specs import NSTATE_TRANSDUCER

        idents = []
        for ridx in read_idxs:
            feats, truth = sampler.eval_events(ridx, whole=whole)
            if not truth:
                continue
            lp = np.asarray(forward.events_posterior(
                params, jnp.asarray(feats)[None], return_log=True))[0]
            score, path = decode_transducer(lp, 0.0, 0.0, 2.0)
            # Match the shipping pipeline: only the first nev entries
            # are stitched (api.basecall_events, ref src/scrappie_events.c:301)
            call = overlapper(path[: lp.shape[0]], NSTATE_TRANSDUCER - 1) or ""
            ident = 1.0 - Levenshtein.distance(call, truth) / max(
                len(truth), len(call), 1)
            idents.append(ident)
            print(f"  read {ridx}: called {len(call)} truth {len(truth)} "
                  f"identity {ident:.4f}", flush=True)
        return float(np.mean(idents)) if idents else float("nan")

    spec = RAW_MODELS[model]
    idents = []
    for ridx in read_idxs:
        if whole:
            r = sampler.reads[ridx]
            sig = r.norm
            valid = r.base_at[r.base_at >= 0]
            truth = "".join("ACGT"[b]
                            for b in r.bases[int(valid.min()): int(valid.max()) + 1])
        else:
            sig, truth = sampler.eval_segment(ridx)
        if not truth:
            continue
        nuse = (len(sig) // spec.stride) * spec.stride
        x = jnp.asarray(sig[:nuse], jnp.float32)[None, :, None]
        if spec.kind == "rgrgr":
            fn = functools.partial(forward.rgrgr_posterior,
                                   conv_activation=spec.conv_activation,
                                   stride=spec.stride, return_log=True)
        elif spec.kind == "raw":
            fn = functools.partial(forward.raw_posterior, stride=spec.stride,
                                   return_log=True)
        else:
            fn = functools.partial(forward.rnnrf_transitions,
                                   conv_activation=spec.conv_activation,
                                   stride=spec.stride)
        out = np.asarray(fn(params, x))[0]
        if spec.kind == "rnnrf":
            score, path = decode_crf(out[None])
            call = crfpath_to_basecall(np.asarray(path)[0]) or ""
        else:
            score, path = decode_transducer(out, 0.0, 0.0, 2.0)
            call = overlapper(path, spec.nstate - 1) or ""
        ident = 1.0 - Levenshtein.distance(call, truth) / max(
            len(truth), len(call), 1)
        idents.append(ident)
        print(f"  read {ridx}: called {len(call)} truth {len(truth)} "
              f"identity {ident:.4f}", flush=True)
    return float(np.mean(idents)) if idents else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="rgrgr_r94")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nsample", type=int, default=4000)
    ap.add_argument("--nevent", type=int, default=600,
                    help="events per window (nanonet_events only)")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--mix", default="0.45,0.35,0.20",
                    help="batch source probabilities: augmented-real,"
                         "empirical-sim,squiggle-sim")
    ap.add_argument("--local-pen", type=float, default=None,
                    help="lattice START/END per-block penalty; 1e30 "
                         "disables the local states (pure CTC marginal). "
                         "Default: 4.0 for per-block-normalised transducer "
                         "models, 1e30 for CRF models (finite local states "
                         "are unsound for globally-normalised energies, "
                         "see train/lattice.py)")
    ap.add_argument("--loss", choices=["lattice", "ce"], default="lattice",
                    help="lattice = alignment-free CTC-style (transducer "
                         "models); ce = per-block cross-entropy")
    ap.add_argument("--train-reads", type=int, nargs="*", default=None)
    ap.add_argument("--eval-reads", type=int, nargs="*", default=None)
    ap.add_argument("--eval-whole", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="save + eval every N steps during training")
    ap.add_argument("--save", default=None,
                    help="npz path to save fine-tuned params (default: "
                         "registry weights dir <model>.npz)")
    ap.add_argument("--init", default=None, help="npz params to start from")
    ap.add_argument("--refresh-labels", action="store_true")
    ap.add_argument("--pseudo-ch228", action="store_true", default=False,
                    help="self-training: add the truth-less third bundled "
                         "read, pseudo-labelled by the 3:1:1 posterior "
                         "ensemble at (stay 0.5, skip 0) — see "
                         "load_pseudo_ch228 — to the training pool "
                         "(train-only)")
    args = ap.parse_args()

    import jax.numpy as jnp
    import optax

    from scrappie_tpu.models import registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.train.realdata import RealReadSampler
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.train.trainer import make_train_step

    model = args.model
    is_events = model == "nanonet_events"
    spec = None if is_events else RAW_MODELS[model]
    reads = load_reads(refresh=args.refresh_labels)
    train_idxs = (args.train_reads if args.train_reads is not None
                  else list(range(len(reads))))
    eval_idxs = (args.eval_reads if args.eval_reads is not None
                 else list(range(len(reads))))
    train_pool = [reads[i] for i in train_idxs]
    if args.pseudo_ch228:
        train_pool.append(load_pseudo_ch228(refresh=args.refresh_labels))
    if is_events:
        from scrappie_tpu.train.realdata import RealEventSampler

        sampler = RealEventSampler(train_pool, seed=args.seed)
        eval_sampler = RealEventSampler(reads, seed=args.seed)
    else:
        sampler = RealReadSampler(train_pool, seed=args.seed)
        eval_sampler = RealReadSampler(reads, seed=args.seed)

    if args.init:
        params = dict(np.load(args.init))
    else:
        params = registry.load_params(model)
    params = {k: jnp.asarray(v) for k, v in params.items()}

    if args.eval_only:
        ident = eval_real(model, params, eval_sampler, eval_idxs,
                          whole=args.eval_whole)
        print(f"[{model}] held-out identity: {ident:.4f}")
        return

    sim = SquiggleSimulator(seed=args.seed + 1)
    if is_events:
        # No empirical-simulator analogue for event tables: fold the emp
        # probability into detector-sim batches (already real-detector
        # statistics, BASELINE.md round-1 events note).
        emp = None
        kind = "events"
    else:
        from scrappie_tpu.train.realsim import EmpiricalModel, \
            RealisticSimulator

        kind = "crf" if spec.kind == "rnnrf" else "transducer"
        emp = RealisticSimulator(
            EmpiricalModel.fit(sampler.train_region_reads()),
            seed=args.seed + 3)

    def sim_batch(b, n, s):
        fn = (sim.crf_labelled_batch if spec.kind == "rnnrf"
              else sim.labelled_batch)
        return fn(b, n, s)

    def emp_batch(b, n, s):
        fn = (emp.crf_labelled_batch if spec.kind == "rnnrf"
              else emp.labelled_batch)
        return fn(b, n, s)

    def sim_events_seq(b, nevent, L):
        """Detector-sim event batch with kmer seqstates for the lattice."""
        from scrappie_tpu.api import encode_bases
        from scrappie_tpu.models.specs import KMER_LEN

        feats, _, truths = sim.detected_events_batch(b, nevent,
                                                     return_truth=True)
        seqs = np.full((b, L), -1, np.int32)
        for i, t in enumerate(truths):
            if len(t) >= KMER_LEN:
                st = np.asarray(encode_bases(t, KMER_LEN), np.int32)
                seqs[i, : min(len(st), L)] = st[:L]
        return feats, seqs

    mix = np.array([float(x) for x in args.mix.split(",")])
    mix = mix / mix.sum()

    use_lattice = args.loss == "lattice"
    optimizer = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr)),
        max_consecutive_errors=25)
    opt_state = optimizer.init(params)
    if use_lattice:
        from scrappie_tpu.train.lattice import make_lattice_train_step

        local_pen = args.local_pen
        if local_pen is None:
            local_pen = 1.0e30 if (spec is not None
                                   and spec.kind == "rnnrf") else 4.0
        step_fn = make_lattice_train_step(model, optimizer,
                                          local_pen=local_pen)
        if is_events:
            L = args.nevent  # worst case one base per event
        else:
            # worst case ~1 base per 1.4 blocks; round to one compile size
            L = ((args.nsample // spec.stride) * 3 // 4 + 127) // 128 * 128
    else:
        step_fn = make_train_step(model, optimizer)
    rng = np.random.default_rng(args.seed + 2)

    t0 = time.time()
    for i in range(args.steps):
        src = rng.choice(3, p=mix)
        if is_events:
            if use_lattice:
                if src == 0:
                    sigs, labels = sampler.seq_batch(args.batch, args.nevent,
                                                     L)
                else:
                    sigs, labels = sim_events_seq(args.batch, args.nevent, L)
            elif src == 0:
                sigs, labels = sampler.batch(args.batch, args.nevent)
            else:
                sigs, labels = sim.detected_events_batch(args.batch,
                                                         args.nevent)
        elif use_lattice:
            if src == 0:
                sigs, labels = sampler.seq_batch(args.batch, args.nsample, L,
                                                 augment=True)
            elif src == 1:
                sigs, labels = emp.seq_batch(args.batch, args.nsample, L)
            else:
                sigs, labels = sim.seq_batch(args.batch, args.nsample, L)
        elif src == 0:
            sigs, labels = sampler.batch(args.batch, args.nsample, spec.stride,
                                         kind, augment=True)
        elif src == 1:
            sigs, labels = emp_batch(args.batch, args.nsample, spec.stride)
        else:
            sigs, labels = sim_batch(args.batch, args.nsample, spec.stride)
        params, opt_state, loss = step_fn(params, opt_state, sigs, labels)
        if i % 25 == 0 or i == args.steps - 1:
            print(f"[{model}] step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if args.eval_every and i and i % args.eval_every == 0:
            pnp = {k: np.asarray(v) for k, v in params.items()}
            if all(np.isfinite(v).all() for v in pnp.values()):
                np.savez_compressed(args.save or registry.weights_path(model),
                                    **pnp)
            ident = eval_real(model, params, eval_sampler, eval_idxs,
                              whole=args.eval_whole)
            print(f"[{model}] step {i}: held-out identity {ident:.4f}",
                  flush=True)

    params_np = {k: np.asarray(v) for k, v in params.items()}
    if any(not np.isfinite(v).all() for v in params_np.values()):
        print("NON-FINITE params; refusing to save", file=sys.stderr)
        sys.exit(1)
    save = args.save or registry.weights_path(model)
    np.savez_compressed(save, **params_np)
    print(f"saved {save}")

    ident = eval_real(model, params, eval_sampler, eval_idxs,
                      whole=args.eval_whole)
    print(f"[{model}] held-out identity after fine-tune: {ident:.4f}")


if __name__ == "__main__":
    main()

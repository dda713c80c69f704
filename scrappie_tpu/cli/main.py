"""Command-line interface, mirroring the reference's subcommands/flags.

Subcommands (ref src/scrappie.c:21-52 and src/scrappie_subcommands.c):
  raw          basecall from raw signal (flags: src/scrappie_raw.c:40-69)
  events       basecall via event detection (src/scrappie_events.c:47-80)
  squiggle     sequence -> predicted squiggle TSV (src/scrappie_squiggle.c)
  mappy        align raw signal to predicted squiggle (src/scrappie_mappy.c)
  seqmappy     map basecall posterior to a sequence (src/scrappie_seqmappy.c)
  event_table  dump detected events as TSV (src/scrappie_event_table.c)
  help / version / licence

TPU-native extras on `raw`: --chunk-len/--overlap/--batch control the
chunked batched engine; --threads is accepted for compatibility.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

LICENCE = """scrappie_tpu is an original TPU-native implementation providing the
capabilities of ONT's scrappie basecaller.  See LICENSE in the repository."""


def _trim_pair(s: str) -> tuple[int, int]:
    parts = s.split(":")
    start = int(parts[0])
    end = int(parts[1]) if len(parts) > 1 else start
    return start, end


def _seg_pair(s: str) -> tuple[int, float]:
    parts = s.split(":")
    chunk = int(parts[0])
    perc = float(parts[1]) / 100.0 if len(parts) > 1 else 0.0
    return chunk, perc


def _out(args):
    return open(args.output, "w") if args.output else sys.stdout


def _add_common(p, trim_default="200:10"):
    p.add_argument("--output", "-o", default=None, help="Write to file rather than stdout")
    p.add_argument("--prefix", "-p", default="", help="Prefix to append to name of each read")
    p.add_argument("--trim", "-t", type=_trim_pair, default=_trim_pair(trim_default),
                   metavar="start:end", help="Number of samples to trim, as start:end")
    p.add_argument("--segmentation", type=_seg_pair, default=(100, 0.0),
                   metavar="chunk:percentile",
                   help="Chunk size and percentile for variance based segmentation")
    p.add_argument("--licence", "--license", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--precision", choices=["highest", "default", "bf16"],
                   default=None,
                   help="Matmul precision policy: 'highest' (exact f32, "
                        "reference parity — the default), 'default' (the "
                        "backend's fast path: one bf16 MXU pass on TPU), "
                        "'bf16' (explicit bf16 operand rounding on any "
                        "backend). Real-read accuracy is unchanged at bf16 "
                        "(BASELINE.md). Also settable as "
                        "SCRAPPIE_TPU_PRECISION.")


def _add_basecall_common(p):
    p.add_argument("--format", "-f", choices=["fasta", "sam", "fastq"],
                   default="fasta", type=str.lower,
                   help="Format to output reads (FASTA or SAM as in the "
                        "reference; FASTQ adds per-base Phred qualities "
                        "from the block posteriors — all models; events "
                        "needs --no-dwell)")
    p.add_argument("--limit", "-l", type=int, default=0,
                   help="Maximum number of reads to call (0 is unlimited)")
    p.add_argument("--min_prob", "-m", type=float, default=1e-5,
                   help="Minimum bound on probability of match")
    p.add_argument("--skip", "-s", dest="skip_pen", type=float, default=0.0,
                   help="Penalty for skipping a base")
    p.add_argument("--stay", "-y", dest="stay_pen", type=float, default=0.0,
                   help="Penalty for staying")
    p.add_argument("--local", dest="local_pen", type=float, default=2.0,
                   help="Penalty for local basecalling")
    p.add_argument("--temperature1", type=float, default=1.0,
                   help="Temperature for softmax weights")
    p.add_argument("--temperature2", type=float, default=1.0,
                   help="Temperature for softmax bias")
    p.add_argument("--slip", dest="use_slip", action="store_true", default=False,
                   help="Use slipping")
    p.add_argument("--no-slip", dest="use_slip", action="store_false")
    p.add_argument("--uuid", dest="uuid", action="store_true", default=False,
                   help="Output UUID as read name")
    p.add_argument("--no-uuid", dest="uuid", action="store_false")
    p.add_argument("--threads", "-#", type=int, default=None,
                   help="(compatibility) parallelism hint; maps to device batch")
    p.add_argument("--calibration", choices=["reference", "real"],
                   default="reference",
                   help="Decode calibration preset: 'reference' keeps the "
                        "reference's zero penalties; 'real' applies the "
                        "per-model stay/skip (or CRF emit-bias) optimum "
                        "measured on the bundled real reads (BASELINE.md). "
                        "Explicit --stay/--skip/--crf-emit-bias flags win.")


def build_parser():
    top = argparse.ArgumentParser(prog="scrappie_tpu",
                                  description="TPU-native scrappie-compatible basecaller")
    sub = top.add_subparsers(dest="command", required=True)

    # ---- raw
    raw = sub.add_parser("raw", help="basecall from raw signal")
    _add_common(raw)
    _add_basecall_common(raw)
    raw.add_argument("--model", default="rgrgr_r94",
                     choices=["raw_r94", "rgrgr_r94", "rgrgr_r941", "rgrgr_r10", "rnnrf_r94"],
                     help="Raw model to use")
    raw.add_argument("--homopolymer", "-H", default="mean",
                     choices=["nochange", "mean"],
                     help="Homopolymer run calc. (not implemented for CRF)")
    raw.add_argument("--crf-emit-bias", type=float, default=0.0,
                     help="CRF decode calibration: additive bias on "
                          "transitions into emitting states (rnnrf only; "
                          "negative = fewer calls). Temperature has no "
                          "effect on CRF Viterbi, so this is the knob.")
    raw.add_argument("--chunk-len", type=int, default=10000,
                     help="Chunk length in samples (TPU batching)")
    raw.add_argument("--overlap", type=int, default=1000,
                     help="Chunk overlap in samples")
    raw.add_argument("--batch", type=int, default=8, help="Device batch size")
    raw.add_argument("--watch", type=float, default=None, metavar="SECONDS",
                     help="Poll inputs every SECONDS for new fast5 files and "
                          "basecall them as they appear (live run directory); "
                          "with --limit N, exit after N reads")
    raw.add_argument("--fast", action="store_true", default=False,
                     help="Fused per-chunk decode + path stitching (TPU). "
                          "FASTQ qualities come from the fused device "
                          "quality stream; posterior-mean homopolymer "
                          "correction (+0.0003 identity, BASELINE.md) is "
                          "stitch-mode only")
    raw.add_argument("--qual-calibration", default="raw",
                     choices=["raw", "real"],
                     help="FASTQ qualities: 'raw' = posterior-derived "
                          "proxy; 'real' = measured linear Phred "
                          "recalibration so Q values match empirical "
                          "error rates (BASELINE.md 'Quality "
                          "calibration')")
    raw.add_argument("--ensemble", default=None, metavar="MODELS",
                     help="Comma-separated extra same-family models whose "
                          "posteriors (transducers) or CRF transition "
                          "energies (rnnrf) are combined with --model's "
                          "before decoding (strides must match; works "
                          "with --fast via the fused multi-model VMEM "
                          "kernel).  Measured on the bundled reads' "
                          "held-out tails: rgrgr_r941,rgrgr_r10 lifts "
                          "identity +0.008 at ~2x device cost "
                          "(BASELINE.md 'Posterior ensembling')")
    raw.add_argument("--ensemble-weights", default=None, metavar="W,W,...",
                     help="Per-model ensemble weights, --model first "
                          "(default 3:1:...:1)")
    raw.add_argument("--profile", default=None, metavar="DIR",
                     help="Capture a JAX profiler (XPlane) trace to DIR")
    raw.add_argument("--stage-report", action="store_true", default=False,
                     help="Log per-stage wall-clock timings (JSON, stderr)")
    raw.add_argument("files", nargs="+", help="fast5 files or directories")

    # ---- events
    ev = sub.add_parser("events", help="basecall via event detection")
    _add_common(ev)
    _add_basecall_common(ev)
    ev.add_argument("--dwell", dest="dwell_correction", action="store_true", default=True,
                    help="Perform dwell correction of homopolymer lengths")
    ev.add_argument("--no-dwell", dest="dwell_correction", action="store_false")
    ev.add_argument("--dump", default=None, help="Dump annotated events to HDF5 file")
    ev.add_argument("--hdf5-compression", type=int, default=1)
    ev.add_argument("--hdf5-chunk", type=int, default=200)
    ev.add_argument("--chunk-len", type=int, default=2048,
                    help="Chunk length in EVENTS (TPU batching)")
    ev.add_argument("--overlap", type=int, default=256,
                    help="Chunk overlap in events")
    ev.add_argument("--batch", type=int, default=8, help="Device batch size")
    ev.add_argument("--qual-calibration", default="raw",
                    choices=["raw", "real"],
                    help="FASTQ qualities: 'raw' proxy or the measured "
                         "'real' Phred recalibration (BASELINE.md)")
    ev.add_argument("--fast", action="store_true", default=False,
                    help="Fused per-chunk decode + path stitching (TPU; "
                         "dwell correction still applies)")
    ev.add_argument("--profile", default=None, metavar="DIR",
                    help="Capture a JAX profiler (XPlane) trace to DIR")
    ev.add_argument("--stage-report", action="store_true", default=False,
                    help="Log per-stage wall-clock timings (JSON, stderr)")
    ev.add_argument("files", nargs="+", help="fast5 files or directories")

    # ---- squiggle
    sq = sub.add_parser("squiggle", help="sequence -> predicted squiggle")
    sq.add_argument("--model", "-m", default="squiggle_r94",
                    choices=["squiggle_r94", "squiggle_r94_rna", "squiggle_r10"])
    sq.add_argument("--limit", "-l", type=int, default=0)
    sq.add_argument("--output", "-o", default=None)
    sq.add_argument("--prefix", "-p", default="")
    sq.add_argument("--rescale", dest="rescale", action="store_true", default=False,
                    help="Rescale network output")
    sq.add_argument("--no-rescale", dest="rescale", action="store_false")
    sq.add_argument("files", nargs="+", help="FASTA files")

    # ---- mappy
    mp = sub.add_parser("mappy", help="align raw signal to predicted squiggle")
    _add_common(mp)
    mp.add_argument("--model", default="squiggle_r94",
                    choices=["squiggle_r94", "squiggle_r94_rna", "squiggle_r10"])
    mp.add_argument("--backprob", "-b", type=float, default=0.0,
                    help="Probability of backwards movement")
    mp.add_argument("--skippen", "-k", type=float, default=5000.0,
                    help="Penalty for skipping position")
    mp.add_argument("--localpen", type=float, default=2.0, help="Penalty for local matching")
    mp.add_argument("--minscore", type=float, default=5.0,
                    help="Minimum possible score for matching emission")
    mp.add_argument("--rate", "-r", type=float, default=1.0,
                    help="Translocation rate relative to standard squiggle")
    mp.add_argument("fasta", help="FASTA file")
    mp.add_argument("fast5", help="fast5 file")

    # ---- seqmappy
    sm = sub.add_parser("seqmappy", help="map basecall posterior to a sequence")
    _add_common(sm)
    sm.add_argument("--localpen", type=float, default=4.0, help="Penalty for local matching")
    sm.add_argument("--min_prob", "-m", type=float, default=1e-5)
    sm.add_argument("--skip", "-s", dest="skip_pen", type=float, default=0.0)
    sm.add_argument("--stay", "-y", dest="stay_pen", type=float, default=0.0)
    sm.add_argument("--temperature1", type=float, default=1.0)
    sm.add_argument("--temperature2", type=float, default=1.0)
    sm.add_argument("fasta", help="FASTA file")
    sm.add_argument("fast5", help="fast5 file")

    # ---- event_table
    et = sub.add_parser("event_table", help="dump detected events as TSV")
    _add_common(et)
    et.add_argument("files", nargs="+", help="fast5 files or directories")

    # ---- serve (TPU-native extra: no reference analogue — its serving
    # story is a shell fan-out, ref README.md:81)
    sv = sub.add_parser("serve", help="TCP basecall server (dynamic batching)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=7777)
    sv.add_argument("--model", default="rgrgr_r94",
                    choices=["raw_r94", "rgrgr_r94", "rgrgr_r941",
                             "rgrgr_r10", "rnnrf_r94", "nanonet_events"])
    sv.add_argument("--batch", type=int, default=8, help="Device batch size")
    sv.add_argument("--chunk-len", type=int, default=10000)
    sv.add_argument("--overlap", type=int, default=1000)
    sv.add_argument("--max-batch-reads", type=int, default=16,
                    help="Max reads coalesced into one engine call")
    sv.add_argument("--max-wait-ms", type=float, default=25.0,
                    help="Max wait for co-batched requests")
    sv.add_argument("--ensemble", default=None, metavar="MODELS",
                    help="Posterior-ensemble members for the DEFAULT "
                         "model's service (see `raw --ensemble`); "
                         "requests routed to other models use those "
                         "models alone")
    sv.add_argument("--qual-calibration", default="raw",
                    choices=["raw", "real"],
                    help="FASTQ qualities for every service: 'raw' "
                         "proxy or the measured 'real' Phred "
                         "recalibration (BASELINE.md)")
    sv.add_argument("--fast", action="store_true", default=False,
                    help="Serve the fused per-chunk fast path (incl. "
                         "the fused multi-model ensemble) instead of "
                         "exact stitch decode; see `raw --fast`")

    sub.add_parser("version", help="print version")
    sub.add_parser("licence", help="print licensing information")
    sub.add_parser("license", help="print licensing information")
    hp = sub.add_parser("help", help="print help")
    hp.add_argument("topic", nargs="?", default=None)
    return top


def main_raw(args) -> int:
    from scrappie_tpu.io.fasta import format_fasta, format_fastq, format_sam
    from scrappie_tpu.parallel.runner import BasecallEngine

    if args.format == "fastq" and args.fast and args.model == "rnnrf_r94":
        print("--format fastq for the CRF model needs whole-read "
              "forward-backward posteriors; incompatible with --fast",
              file=sys.stderr)
        return 1

    import contextlib

    from scrappie_tpu.utils.tracing import profile

    batch = max(args.batch, args.threads or 0)  # --threads ~ read-level parallelism
    from scrappie_tpu.models.ensemble import parse_members

    ensemble = parse_members(args.ensemble)
    ens_weights = (tuple(float(w) for w in args.ensemble_weights.split(","))
                   if args.ensemble_weights else None)
    if ens_weights and not ensemble:
        print("--ensemble-weights needs --ensemble", file=sys.stderr)
        return 1
    try:
        engine = BasecallEngine(args.model, chunk_len=args.chunk_len, overlap=args.overlap,
                                batch_size=batch, min_prob=args.min_prob,
                                tempW=args.temperature1, tempb=args.temperature2,
                                mode="fast" if args.fast else "stitch",
                                ensemble=ensemble, ensemble_weights=ens_weights,
                                qual_calibration=args.qual_calibration)
    except ValueError as e:  # bad ensemble/mode combos get a clean message
        print(str(e), file=sys.stderr)
        return 1
    call_kwargs = dict(
        trim_start=args.trim[0], trim_end=args.trim[1],
        varseg_chunk=args.segmentation[0], varseg_thresh=args.segmentation[1],
        stay_pen=args.stay_pen, skip_pen=args.skip_pen, local_pen=args.local_pen,
        use_slip=args.use_slip,
        homopolymer=None if args.model == "rnnrf_r94" else args.homopolymer,
        crf_emit_bias=args.crf_emit_bias,
        with_qualities=args.format == "fastq",
    )
    from scrappie_tpu.models import calibration

    calibration.apply(args.model, args.calibration, call_kwargs,
                      ensemble=ensemble)
    fh = _out(args)
    nread = 0

    def write_results(results) -> int:
        n = 0
        for name, r in results:
            if r.sequence is None:
                print(f"No basecall for {name}", file=sys.stderr)
                continue
            n += 1
            primary = (r.uuid or name) if args.uuid else name
            if args.format == "fasta":
                fh.write(format_fasta(primary, r.sequence, filename=name,
                                      uuid=r.uuid or "", score=r.score,
                                      nblock=r.nblock, nsample=r.nsample,
                                      trim=(r.trim_start, r.trim_end),
                                      prefix=args.prefix))
            elif args.format == "fastq":
                fh.write(format_fastq(primary, r.sequence, r.qual or "",
                                      filename=name, uuid=r.uuid or "",
                                      score=r.score, nblock=r.nblock,
                                      nsample=r.nsample,
                                      trim=(r.trim_start, r.trim_end),
                                      prefix=args.prefix))
            else:
                fh.write(format_sam(primary, r.sequence, prefix=args.prefix,
                                    qual=r.qual))
        fh.flush()
        return n

    prof = profile(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
        if args.watch is None:
            nread += write_results(engine.basecall_files(
                args.files, limit=args.limit, **call_kwargs))
        else:
            # live run directory: poll for new fast5s and basecall them
            # as they appear (MinKNOW-style output watching; no
            # reference analogue — it only does one-shot globs)
            import time as _time

            from scrappie_tpu.io.fast5 import iterate_fast5

            seen: set = set()
            fails: dict = {}
            try:
                while True:
                    new = [f for f in iterate_fast5(args.files)
                           if str(f) not in seen]
                    if args.limit:
                        new = new[: args.limit - nread]
                    if new:
                        results = engine.basecall_files(new, **call_kwargs)
                        nread += write_results(results)
                        # A file that failed to READ (still being
                        # written by the sequencer) is absent from
                        # results: retry it on later polls, giving up
                        # after 5 consecutive failures.
                        done = {name for name, _ in results}
                        seen.update(done)
                        for f in new:
                            f = str(f)
                            if f in done:
                                fails.pop(f, None)
                                continue
                            fails[f] = fails.get(f, 0) + 1
                            if fails[f] >= 5:
                                print(f"Giving up on {f} after "
                                      f"{fails[f]} failed reads",
                                      file=sys.stderr)
                                seen.add(f)
                    if args.limit and nread >= args.limit:
                        break
                    _time.sleep(args.watch)
            except KeyboardInterrupt:
                pass
    if args.stage_report:
        import json as _json

        print(_json.dumps({"stages": engine.stage.report()}), file=sys.stderr)
    if fh is not sys.stdout:
        fh.close()
    print(f"Basecalled {nread} reads", file=sys.stderr)
    return 0


def main_events(args) -> int:
    """Events basecall driver, batched through the BasecallEngine
    (round 4): reads fan into bucketed [B, chunk_ev, 4] device calls —
    the TPU-shaped replacement for the reference's OpenMP per-read
    fan-out (ref src/scrappie_events.c:376-416)."""
    import contextlib
    import json

    from scrappie_tpu.io.fasta import format_sam
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.utils.tracing import profile

    if args.format == "fastq":
        if args.dwell_correction:
            print("--format fastq for events requires --no-dwell: dwell "
                  "correction rewrites homopolymer run lengths after the "
                  "qualities are derived from the block posteriors",
                  file=sys.stderr)
            return 1

    batch = max(args.batch, args.threads or 0)
    engine = BasecallEngine("nanonet_events", chunk_len=args.chunk_len,
                            overlap=args.overlap, batch_size=batch,
                            min_prob=args.min_prob, tempW=args.temperature1,
                            tempb=args.temperature2,
                            mode="fast" if args.fast else "stitch",
                            qual_calibration=args.qual_calibration)
    call_kwargs = dict(
        trim_start=args.trim[0], trim_end=args.trim[1],
        varseg_chunk=args.segmentation[0], varseg_thresh=args.segmentation[1],
        stay_pen=args.stay_pen, skip_pen=args.skip_pen,
        local_pen=args.local_pen, use_slip=args.use_slip,
        dwell_correction=args.dwell_correction,
        with_qualities=args.format == "fastq",
    )
    from scrappie_tpu.models import calibration

    calibration.apply("nanonet_events", args.calibration, call_kwargs)

    fh = _out(args)
    nread = 0
    prof = profile(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
        results = engine.basecall_files(args.files, limit=args.limit,
                                        **call_kwargs)
    for name, r in results:
        if r.sequence is None:
            print(f"No basecall for {name}", file=sys.stderr)
            continue
        nread += 1
        primary = (r.uuid or name) if args.uuid else name
        nev = r.nblock
        if args.format == "sam":
            fh.write(format_sam(primary, r.sequence, prefix=args.prefix,
                                qual=r.qual))
        else:
            meta = {"filename": name, "uuid": r.uuid or "",
                    "normalised_score": -r.score / max(nev, 1),
                    "nevent": nev, "sequence_length": len(r.sequence),
                    "events_per_base": nev / len(r.sequence),
                    "nsample": r.nsample,
                    "trim": [r.trim_start, r.trim_end]}
            if args.format == "fasta":
                fh.write(f">{args.prefix}{primary}  {json.dumps(meta)}\n"
                         f"{r.sequence}\n")
            else:
                fh.write(f"@{args.prefix}{primary}  {json.dumps(meta)}\n"
                         f"{r.sequence}\n+\n{r.qual or ''}\n")
        if args.dump and r.events is not None:
            from scrappie_tpu.io.fast5 import write_annotated_events

            write_annotated_events(args.dump, name.replace("/", "_"),
                                   r.events, args.hdf5_chunk,
                                   args.hdf5_compression)
    if args.stage_report:
        import json as _json

        print(_json.dumps({"stages": engine.stage.report()}), file=sys.stderr)
    if fh is not sys.stdout:
        fh.close()
    print(f"Basecalled {nread} reads", file=sys.stderr)
    return 0


def main_squiggle(args) -> int:
    from scrappie_tpu.api import sequence_to_squiggle
    from scrappie_tpu.io.fasta import read_fasta

    fh = _out(args)
    count = 0
    for f in args.files:
        if args.limit and count >= args.limit:
            break
        for rec in read_fasta(f):
            if args.limit and count >= args.limit:
                break
            count += 1
            try:
                sq = sequence_to_squiggle(rec.seq, model=args.model,
                                          rescale=args.rescale)
            except ValueError as e:
                print(f"Skipping {rec.name!r}: {e}", file=sys.stderr)
                continue
            fh.write(f"#{args.prefix}{rec.name}\n")
            fh.write("pos\tbase\tcurrent\tsd\tdwell\n")
            for i, base in enumerate(rec.seq):
                fh.write(f"{i}\t{base}\t{sq[i,0]:3.6f}\t{sq[i,1]:3.6f}\t{sq[i,2]:3.6f}\n")
    if fh is not sys.stdout:
        fh.close()
    return 0


def main_mappy(args) -> int:
    from scrappie_tpu.api import sequence_to_squiggle
    from scrappie_tpu.decode.dtw import squiggle_match_viterbi
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.io.fasta import read_first_sequence
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.utils.maths import medmad_normalise

    rec = read_first_sequence(args.fasta)
    if rec is None:
        print(f"Failed to open {args.fasta!r} for input.", file=sys.stderr)
        return 1
    rs = read_raw(args.fast5)
    rt = trim_and_segment_raw(rs, args.trim[0], args.trim[1],
                              args.segmentation[0], args.segmentation[1])
    if rt is None:
        print(f"Failed to trim signal from {args.fast5!r}.", file=sys.stderr)
        return 1
    norm = medmad_normalise(rt.trimmed)

    try:
        squiggle = sequence_to_squiggle(rec.seq, model=args.model, rescale=False)
    except ValueError as e:
        print(f"Could not encode {args.fasta!r}: {e}", file=sys.stderr)
        return 1
    score, path = squiggle_match_viterbi(
        norm, squiggle, rate=args.rate, prob_back=args.backprob,
        local_pen=args.localpen, skip_pen=args.skippen, minscore=args.minscore,
    )
    full = np.full(rt.n, -1, dtype=np.int64)
    full[rt.start : rt.end] = path
    # Print the normalised signal the DTW actually aligned (the reference
    # normalises rt.raw in place, so its TSV is in normalised units too).
    raw = np.full(rt.n, np.nan, dtype=np.float64)
    raw[rt.start : rt.end] = norm

    fh = _out(args)
    fh.write(f"# {args.fast5} to {args.fasta}  (score = {score:f})\n")
    fh.write("idx\tsignal\tpos\tbase\tcurrent\tsd\tdwell\n")
    for i in range(rt.n):
        pos = full[i]
        if pos >= 0:
            fh.write(
                f"{i}\t{raw[i]:3.6f}\t{pos}\t{rec.seq[pos]}\t{squiggle[pos,0]:3.6f}"
                f"\t{np.exp(squiggle[pos,1]):3.6f}\t{np.exp(-squiggle[pos,2]):3.6f}\n"
            )
        else:
            sig = raw[i] if rt.start <= i < rt.end else float("nan")
            fh.write(f"{i}\t{sig:3.6f}\t{pos}\tN\tnan\tnan\tnan\n")
    if fh is not sys.stdout:
        fh.close()
    return 0


def main_seqmappy(args) -> int:
    from scrappie_tpu.api import RawTable, calc_post, encode_bases
    from scrappie_tpu.decode.mapping import map_to_sequence_viterbi
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.io.fasta import read_first_sequence

    rec = read_first_sequence(args.fasta)
    if rec is None:
        print(f"Failed to open {args.fasta!r} for input.", file=sys.stderr)
        return 1
    rs = read_raw(args.fast5)
    rt = RawTable(rs.raw).trim(args.trim[0], args.trim[1],
                               args.segmentation[0], args.segmentation[1])
    if rt.end <= rt.start:
        print(f"Failed to trim signal from {args.fast5!r}.", file=sys.stderr)
        return 1
    rt = rt.scale()
    post = calc_post(rt, "rgrgr_r94", min_prob=args.min_prob,
                     tempW=args.temperature1, tempb=args.temperature2)
    try:
        states = encode_bases(rec.seq, 5)
    except ValueError as e:
        print(f"Could not encode {args.fasta!r}: {e}", file=sys.stderr)
        return 1
    score, path = map_to_sequence_viterbi(
        post.data(), states, args.stay_pen, args.skip_pen, args.localpen,
        want_path=True,
    )
    nblock = len(post)
    fh = _out(args)
    fh.write(f"# {args.fast5} to {args.fasta} -- score {-score:f} over {nblock} blocks"
             f" ({-score / nblock:f} per block)\n")
    fh.write("block\tpos\n")
    for i in range(nblock):
        fh.write(f"{i}\t{path[i]}\n")
    if fh is not sys.stdout:
        fh.close()
    return 0


def main_event_table(args) -> int:
    from scrappie_tpu.io.fast5 import iterate_fast5, read_raw_all
    from scrappie_tpu.signal.events import detect_events
    from scrappie_tpu.signal.trim import trim_and_segment_raw

    fh = _out(args)
    reads: list = []
    for f in iterate_fast5(args.files):
        try:
            sigs = read_raw_all(f)
        except Exception as e:
            print(f"Failed to read {f}: {e}", file=sys.stderr)
            continue
        reads.extend((f if len(sigs) == 1 else f"{f}:{rs.uuid}", rs)
                     for rs in sigs)
    for f, rs in reads:
        rt = trim_and_segment_raw(rs, args.trim[0], args.trim[1],
                                  args.segmentation[0], args.segmentation[1])
        if rt is None:
            print(f"No events returned for {f}", file=sys.stderr)
            continue
        et = detect_events(rt)
        fh.write(f"# {f}\n")
        fh.write("#event\tstart\tmean\tstdv\tdwell\n")
        for i, ev in enumerate(et.event):
            fh.write(f"{i}\t{ev['start']}\t{ev['mean']:f}\t{ev['stdv']:f}\t{int(ev['length'])}\n")
    if fh is not sys.stdout:
        fh.close()
    return 0


def main_serve(args) -> int:
    from scrappie_tpu.models.ensemble import parse_members
    from scrappie_tpu.serve import serve

    serve(args.host, args.port, model=args.model,
          max_batch_reads=args.max_batch_reads, max_wait_ms=args.max_wait_ms,
          batch_size=args.batch, chunk_len=args.chunk_len,
          overlap=args.overlap, ensemble=parse_members(args.ensemble),
          qual_calibration=args.qual_calibration,
          mode="fast" if args.fast else "stitch")
    return 0


def main(argv=None) -> int:
    from scrappie_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()
    args = parser.parse_args(argv)

    if getattr(args, "precision", None):
        from scrappie_tpu.nn.config import set_precision

        set_precision(args.precision)

    if getattr(args, "licence", False) or args.command in ("licence", "license"):
        print(LICENCE)
        return 0
    if args.command == "version":
        import scrappie_tpu

        print(f"scrappie_tpu {scrappie_tpu.__version__}")
        return 0
    if args.command == "help":
        if args.topic:
            parser.parse_args([args.topic, "--help"])
        else:
            parser.print_help()
        return 0

    return {
        "raw": main_raw,
        "events": main_events,
        "squiggle": main_squiggle,
        "mappy": main_mappy,
        "seqmappy": main_seqmappy,
        "event_table": main_event_table,
        "serve": main_serve,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())

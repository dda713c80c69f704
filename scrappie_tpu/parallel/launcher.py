"""Multi-host launch: one process per host, hosts embarrassingly parallel.

The reference's only multi-machine story is shell-level fan-out
(`find ... | parallel -P N scrappie raw`, ref README.md:81).  The
TPU-native replacement: every host runs this program.  On a pod slice
jax.distributed.initialize brings up the runtime, then each host
basecalls its own round-robin shard of the input files on a mesh over
its LOCAL chips (weights replicated, chunk batch data-parallel).
Inference needs no cross-host communication — per-host-different file
counts over a global mesh would deadlock collectives — so hosts stay
independent and write independent FASTA shards, exactly like the
reference's per-read outputs.  (Cross-host meshes belong to training,
where every host steps the same global batch: train/trainer.py +
parallel/sharding.py.)

Usage (one invocation per host, e.g. under a pod launcher):

    python -m scrappie_tpu.parallel.launcher \
        --coordinator host0:8476 --num-processes N --process-id i \
        --model rgrgr_r94 --output calls.$i.fa  reads/

Single-process invocation (no --coordinator) runs on the local devices
only, which is also how the unit tests exercise the file-sharding and
mesh plumbing on the virtual CPU mesh.
"""

from __future__ import annotations

import argparse
import sys


def shard_files(files, process_id: int, num_processes: int):
    """Deterministic round-robin file shard for this host."""
    return [f for i, f in enumerate(files) if i % num_processes == process_id]


def initialize(coordinator: str | None, num_processes: int, process_id: int):
    """Bring up jax.distributed when running multi-host; no-op otherwise."""
    import jax

    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax


def run(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit for single-process)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--model", default="rgrgr_r94")
    ap.add_argument("--chunk-len", type=int, default=10000)
    ap.add_argument("--overlap", type=int, default=1000)
    ap.add_argument("--batch-per-device", type=int, default=32)
    ap.add_argument("--fast", action="store_true", default=False)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--output", "-o", default=None)
    ap.add_argument("files", nargs="+")
    args = ap.parse_args(argv)

    jax = initialize(args.coordinator, args.num_processes, args.process_id)

    from scrappie_tpu.io.fast5 import iterate_fast5
    from scrappie_tpu.io.fasta import format_fasta
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.parallel.sharding import make_mesh
    from scrappie_tpu.utils.tracing import log

    files = shard_files(sorted(str(f) for f in iterate_fast5(args.files)),
                        args.process_id, args.num_processes)
    if args.limit:
        files = files[: args.limit]
    log("info", "host shard", process=args.process_id,
        nfiles=len(files), ndevices=len(jax.devices()),
        local=len(jax.local_devices()))

    mesh = make_mesh(devices=jax.local_devices())  # hosts independent
    engine = BasecallEngine(
        args.model, chunk_len=args.chunk_len, overlap=args.overlap,
        batch_size=args.batch_per_device * mesh.shape["data"], mesh=mesh,
        mode="fast" if args.fast else "stitch")
    results = engine.basecall_files(files)

    out = open(args.output, "w") if args.output else sys.stdout
    n = 0
    for name, r in results:
        if r.sequence is None:
            continue
        n += 1
        out.write(format_fasta(name, r.sequence, filename=name,
                               uuid=r.uuid or "", score=r.score,
                               nblock=r.nblock, nsample=r.nsample,
                               trim=(r.trim_start, r.trim_end)))
    if out is not sys.stdout:
        out.close()
    log("info", "host done", process=args.process_id, basecalled=n)
    return 0


if __name__ == "__main__":
    sys.exit(run())

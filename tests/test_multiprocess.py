"""Multi-process (multi-host) execution of the basecall launcher.

The reference's multi-machine story is shell fan-out
(ref README.md:81: `find ... | parallel -P N scrappie raw`).  Ours is
parallel/launcher.py with jax.distributed.  This test actually EXECUTES
that path: two OS processes initialise a distributed JAX runtime over a
localhost coordinator (CPU backend, 2 virtual devices per process),
each basecalls its round-robin file shard, and the merged FASTA must
equal a single-process run over all files.
"""

import os
import pathlib
import subprocess
import socket
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow  # heavy end-to-end tier (see pyproject)

STUB = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from scrappie_tpu.parallel.launcher import run

sys.exit(run(sys.argv[1:]))
"""


def _write_fast5(path, counts: np.ndarray, read_id: str):
    import h5py

    with h5py.File(path, "w") as h:
        g = h.create_group("Raw/Reads/Read_7")
        g.attrs["read_id"] = read_id
        g.create_dataset("Signal", data=counts.astype(np.int16))
        ch = h.create_group("UniqueGlobalKey/channel_id")
        ch.attrs["digitisation"] = 8192.0
        ch.attrs["offset"] = 10.0
        ch.attrs["range"] = 1400.0
        ch.attrs["sampling_rate"] = 4000.0


@pytest.fixture(scope="module")
def fast5_dir(tmp_path_factory):
    from scrappie_tpu.train.simulate import SquiggleSimulator

    d = tmp_path_factory.mktemp("mp_reads")
    sim = SquiggleSimulator(seed=11)
    for i in range(3):
        sig, _, _ = sim.simulate_read(300)
        counts = np.round(sig * 40.0 + 300.0).astype(np.int16)
        _write_fast5(d / f"read{i}.fast5", counts, f"uuid-{i}")
    return d


def _parse_fasta(text: str) -> dict[str, str]:
    seqs = {}
    name = None
    for line in text.splitlines():
        if line.startswith(">"):
            name = pathlib.Path(line[1:].split()[0]).name
            seqs[name] = ""
        elif name:
            seqs[name] += line.strip()
    return seqs


def _launch(args, env, timeout=900):
    return subprocess.Popen(
        [sys.executable, "-c", STUB] + args, env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def test_two_process_distributed_matches_single(fast5_dir, tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    coord = f"localhost:{port.getsockname()[1]}"
    port.close()

    base_env = {**os.environ,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "JAX_PLATFORMS": "cpu"}
    common = ["--model", "rgrgr_r94", "--chunk-len", "2000", "--overlap",
              "500", "--batch-per-device", "2", str(fast5_dir)]

    procs = []
    for pid in range(2):
        out = tmp_path / f"calls.{pid}.fa"
        procs.append((out, _launch(
            ["--coordinator", coord, "--num-processes", "2",
             "--process-id", str(pid), "-o", str(out)] + common, base_env)))
    for out, p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"launcher failed:\n{err[-3000:]}"

    merged = {}
    for out, _ in procs:
        merged.update(_parse_fasta(out.read_text()))
    assert len(merged) == 3

    # Single-process run over all files (same code path, no coordinator)
    single = tmp_path / "single.fa"
    p = _launch(["--num-processes", "1", "-o", str(single)] + common, base_env)
    _, err = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process launcher failed:\n{err[-3000:]}"
    expect = _parse_fasta(single.read_text())

    assert merged == expect


def test_shard_files_round_robin():
    from scrappie_tpu.parallel.launcher import shard_files

    files = [f"f{i}" for i in range(7)]
    s0 = shard_files(files, 0, 2)
    s1 = shard_files(files, 1, 2)
    assert s0 == ["f0", "f2", "f4", "f6"]
    assert s1 == ["f1", "f3", "f5"]
    assert sorted(s0 + s1) == sorted(files)

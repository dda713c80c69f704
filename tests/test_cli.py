"""End-to-end CLI tests on bundled reads.

Mirrors the reference ctest suite (CMakeLists.txt:141-160): every
subcommand runs on the bundled data and exits 0; here we additionally
check output structure.

Most tests drive cli.main.main() IN-PROCESS (sharing this process's
JAX runtime and jit caches — a fresh subprocess pays ~20 s of JAX
import plus cold compiles per test, which made this file alone take
>9 min); test_version_subprocess still exercises the real
`python -m scrappie_tpu` entry.
"""

import contextlib
import dataclasses
import io
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier (see pyproject)

ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
SMALL_FAST5 = "/root/reference/reads/read_ch228_file118.fast5"


@dataclasses.dataclass
class CliResult:
    returncode: int
    stdout: str
    stderr: str


def run_cli(*args, timeout=600):
    """Run the CLI in-process; mirrors subprocess.run's result shape."""
    from scrappie_tpu.cli.main import main

    out, err = io.StringIO(), io.StringIO()
    code = 0
    try:
        with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
            code = main(list(args))
    except SystemExit as e:  # argparse --help/errors
        code = int(e.code or 0)
    return CliResult(code, out.getvalue(), err.getvalue())


def test_version():
    r = run_cli("version")
    assert r.returncode == 0
    assert "scrappie_tpu" in r.stdout


def test_help():
    r = run_cli("help")
    assert r.returncode == 0
    for cmd in ("raw", "events", "squiggle", "mappy", "seqmappy",
                "event_table", "serve"):
        assert cmd in r.stdout


def test_serve_parser():
    """`serve` subcommand parses with defaults (the server itself is
    exercised in tests/test_serve.py via make_server)."""
    from scrappie_tpu.cli.main import build_parser

    args = build_parser().parse_args(["serve", "--port", "0",
                                      "--model", "rgrgr_r94"])
    assert args.command == "serve" and args.port == 0
    assert args.max_batch_reads == 16 and args.max_wait_ms == 25.0


def test_licence():
    r = run_cli("licence")
    assert r.returncode == 0 and "scrappie" in r.stdout.lower()


def test_event_table(reads_dir):
    r = run_cli("event_table", SMALL_FAST5)
    assert r.returncode == 0
    lines = r.stdout.splitlines()
    assert lines[1].startswith("#event")
    first = lines[2].split("\t")
    assert first[0] == "0" and first[1] == "0"
    assert len(lines) > 1000


def test_squiggle(reads_dir):
    r = run_cli("squiggle", "--limit", "1", str(reads_dir / "test_squiggles.fa"))
    assert r.returncode == 0
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#")
    assert lines[1] == "pos\tbase\tcurrent\tsd\tdwell"
    assert len(lines[2].split("\t")) == 5


def test_raw_fasta(reads_dir):
    r = run_cli("raw", "--local", "20", "--uuid", SMALL_FAST5)
    assert r.returncode == 0, r.stderr
    header = r.stdout.splitlines()[0]
    assert header.startswith(">")
    meta = json.loads(header.split(None, 1)[1])
    for key in ("filename", "uuid", "normalised_score", "nblock",
                "sequence_length", "blocks_per_base", "nsample", "trim"):
        assert key in meta
    seq = r.stdout.splitlines()[1]
    assert set(seq) <= set("ACGT") and len(seq) == meta["sequence_length"]


def test_raw_calibration_preset(reads_dir):
    """--calibration real == the explicit measured knobs (BASELINE.md),
    and both differ from the reference-default call."""
    cal = run_cli("raw", "--calibration", "real", SMALL_FAST5)
    explicit = run_cli("raw", "--stay", "0.5", "--skip", "0.5", SMALL_FAST5)
    default = run_cli("raw", SMALL_FAST5)
    assert cal.returncode == explicit.returncode == default.returncode == 0
    assert cal.stdout.splitlines()[1:] == explicit.stdout.splitlines()[1:]
    assert cal.stdout.splitlines()[1] != default.stdout.splitlines()[1]


def test_raw_fastq(reads_dir):
    r = run_cli("raw", "-f", "fastq", SMALL_FAST5)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert len(lines) == 4 and lines[0].startswith("@") and lines[2] == "+"
    assert len(lines[3]) == len(lines[1]) and set(lines[1]) <= set("ACGT")
    # same basecall as FASTA (qualities must not change decoding)
    fa = run_cli("raw", SMALL_FAST5)
    assert lines[1] == fa.stdout.splitlines()[1]


def test_raw_fastq_incompatible_modes(reads_dir):
    """Round 4: fastq now works WITH --fast for transducer models (the
    fused device quality stream); the remaining incompatibilities are
    the CRF model's forward-backward (needs whole-read transitions) and
    events dwell correction (rewrites runs after quality derivation)."""
    assert run_cli("raw", "--model", "rnnrf_r94", "-f", "fastq", "--fast",
                   SMALL_FAST5).returncode == 1
    assert run_cli("events", "-f", "fastq", SMALL_FAST5).returncode == 1

    r = run_cli("raw", "-f", "fastq", "--fast", SMALL_FAST5)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("@") and len(lines[3]) == len(lines[1])


def test_raw_sam_crf(reads_dir):
    r = run_cli("raw", "--model", "rnnrf_r94", "-f", "sam", SMALL_FAST5)
    assert r.returncode == 0, r.stderr
    fields = r.stdout.splitlines()[0].split("\t")
    assert fields[1] == "4" and set(fields[9]) <= set("ACGT")


def test_events_with_dump(reads_dir, tmp_path):
    dump = tmp_path / "ev.h5"
    r = run_cli("events", "--local", "20", "--dump", str(dump), SMALL_FAST5)
    assert r.returncode == 0, r.stderr
    header = r.stdout.splitlines()[0]
    meta = json.loads(header.split(None, 1)[1])
    assert "nevent" in meta and "events_per_base" in meta

    import h5py
    import numpy as np

    with h5py.File(dump) as h:
        key = list(h.keys())[0]
        ev = h[key][()]
        assert ev.dtype.names == ("start", "length", "mean", "stdv", "pos", "state")
        # Decoded annotations present
        assert (ev["pos"] >= 0).any()


def test_seqmappy(reads_dir):
    fa = reads_dir / "MINICOL228_20161012_FNFAB42578_MN17976_mux_scan_HG_52221_ch174_read172_strand.fa"
    f5 = reads_dir / "MINICOL228_20161012_FNFAB42578_MN17976_mux_scan_HG_52221_ch174_read172_strand.fast5"
    r = run_cli("seqmappy", str(fa), str(f5))
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#") and "score" in lines[0]
    assert lines[1] == "block\tpos"


def test_mappy_short(reads_dir, tmp_path):
    # Short sequence keeps the O(nsample x npos) DP small
    fa = tmp_path / "short.fa"
    rec = (reads_dir / "test_squiggles.fa").read_text().splitlines()
    fa.write_text(rec[0] + "\n" + rec[1][:300] + "\n")
    r = run_cli("mappy", str(fa), SMALL_FAST5)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert "score" in lines[0]
    assert lines[1].startswith("idx")
    # Some samples mapped to positions
    mapped = [l for l in lines[2:] if "\tN\t" not in l]
    assert len(mapped) > 100


def test_squiggle_skips_non_acgt(tmp_path):
    """FASTA records with N/IUPAC bases are skipped with a warning, and a
    bare '>' header does not crash the parser."""
    import subprocess
    import sys

    fa = tmp_path / "mixed.fa"
    fa.write_text(">\n>has_n\nACGTNACGT\n>good\n" + "ACGT" * 30 + "\n")
    out = tmp_path / "out.tsv"
    import os

    env = dict(os.environ, SCRAPPIE_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "scrappie_tpu", "squiggle", str(fa),
         "-o", str(out)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "Skipping" in r.stderr
    assert "#good" in out.read_text()


def test_encode_bases_rejects_non_acgt():
    import pytest as _pytest

    from scrappie_tpu.api import encode_bases

    with _pytest.raises(ValueError, match="non-ACGT"):
        encode_bases("ACGNT", 1)


def test_version_subprocess():
    """The real `python -m scrappie_tpu` entry (everything else runs
    in-process for speed)."""
    r = subprocess.run(
        [sys.executable, "-m", "scrappie_tpu", "version"],
        capture_output=True, text=True, env=ENV, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0
    assert "scrappie_tpu" in r.stdout


def test_raw_watch_mode(tmp_path):
    """--watch basecalls fast5s as they appear and exits at --limit."""
    import threading
    import time as _time

    import h5py
    import numpy as np

    from scrappie_tpu.train.simulate import SquiggleSimulator

    def write_fast5(path, sig, read_id):
        counts = np.round(sig * 40.0 + 300.0).astype(np.int16)
        with h5py.File(path, "w") as h:
            g = h.create_group("Raw/Reads/Read_1")
            g.attrs["read_id"] = read_id
            g.create_dataset("Signal", data=counts)
            ch = h.create_group("UniqueGlobalKey/channel_id")
            ch.attrs["digitisation"] = 8192.0
            ch.attrs["offset"] = 10.0
            ch.attrs["range"] = 1400.0
            ch.attrs["sampling_rate"] = 4000.0

    sim = SquiggleSimulator(seed=33)
    sigs = [sim.simulate_read(250)[0] for _ in range(2)]
    watch = tmp_path / "run"
    watch.mkdir()
    outfa = tmp_path / "out.fa"
    write_fast5(watch / "r0.fast5", sigs[0], "uuid-0")

    res = {}
    t = threading.Thread(target=lambda: res.update(r=run_cli(
        "raw", str(watch), "--watch", "0.2", "--limit", "2",
        "--model", "rgrgr_r94", "--trim", "0:0", "-o", str(outfa))))
    t.start()
    _time.sleep(2.0)  # first poll picks up r0; r1 arrives later
    write_fast5(watch / "r1.fast5", sigs[1], "uuid-1")
    t.join(timeout=600)
    assert not t.is_alive(), "--watch did not exit at --limit"
    assert res["r"].returncode == 0
    text = outfa.read_text()
    names = [l[1:].split()[0] for l in text.splitlines() if l.startswith(">")]
    assert len(names) == 2
    assert any("r0" in n for n in names) and any("r1" in n for n in names)


def test_raw_fast_ensemble_robust_preset(reads_dir):
    """--ensemble composes with --fast (round 5: fused multi-model
    VMEM combination), and --calibration real resolves to the
    OOD-robust (stay 0.5, skip 0) when an ensemble is active —
    identical to passing those knobs explicitly."""
    ens = ("--ensemble", "rgrgr_r941,rgrgr_r10", "--fast")
    cal = run_cli("raw", *ens, "--calibration", "real", SMALL_FAST5)
    explicit = run_cli("raw", *ens, "--stay", "0.5", "--skip", "0.0",
                       SMALL_FAST5)
    solo_fast = run_cli("raw", "--fast", "--calibration", "real",
                        SMALL_FAST5)
    assert cal.returncode == explicit.returncode == 0, cal.stderr
    assert cal.stdout.splitlines()[1:] == explicit.stdout.splitlines()[1:]
    # the ensemble is live: the call differs from the solo fast call
    assert cal.stdout.splitlines()[1] != solo_fast.stdout.splitlines()[1]

"""Multi-read fast5 ingestion (io/fast5.py read_raw_all).

The reference only reads single-read files (ref
src/fast5_interface.c:130-217); MinKNOW's post-2018 bulk format packs
many ``read_<uuid>`` top-level groups with per-read channel metadata
into one file.  Contracts: both layouts parse, pA scaling uses the
per-read metadata, and the engine/CLI emit one record per contained
read.
"""

import numpy as np
import pytest

from scrappie_tpu.io.fast5 import read_raw, read_raw_all

SINGLE_FAST5 = "/root/reference/reads/read_ch228_file118.fast5"


def _make_multi_fast5(path, sigs_pA, digitisation=8192.0, offset=3.0,
                      rng=512.0):
    """Write a multi-read fast5 holding the given pA signals."""
    import h5py

    unit = rng / digitisation
    with h5py.File(path, "w") as h:
        for i, sig in enumerate(sigs_pA):
            g = h.create_group(f"read_{i:04d}-beef")
            raw = g.create_group("Raw")
            raw.attrs["read_id"] = f"{i:04d}-beef"
            adc = np.round(np.asarray(sig, np.float64) / unit - offset)
            raw.create_dataset("Signal", data=adc.astype(np.int16))
            ch = g.create_group("channel_id")
            ch.attrs["digitisation"] = digitisation
            ch.attrs["offset"] = offset
            ch.attrs["range"] = rng
            ch.attrs["sampling_rate"] = 4000.0
    return path


def _sim_signals(lengths, seed=7):
    from scrappie_tpu.train.simulate import SquiggleSimulator

    out = []
    for i, n in enumerate(lengths):
        sig, _, _ = SquiggleSimulator(seed=seed + i).simulate_read(n)
        # shift into a plausible pA range so ADC quantisation is benign
        out.append(np.asarray(sig, np.float32) * 10.0 + 90.0)
    return out


def test_read_raw_all_single_read_layout():
    sigs = read_raw_all(SINGLE_FAST5)
    assert len(sigs) == 1
    ref = read_raw(SINGLE_FAST5)
    np.testing.assert_array_equal(sigs[0].raw, ref.raw)
    assert sigs[0].uuid == ref.uuid


def test_read_raw_all_multi(tmp_path):
    pA = _sim_signals([300, 420])
    f = _make_multi_fast5(tmp_path / "multi.fast5", pA)
    sigs = read_raw_all(f)
    assert [s.uuid for s in sigs] == ["0000-beef", "0001-beef"]
    for got, want in zip(sigs, pA):
        assert got.raw.shape == want.shape
        # ADC round-trip is exact to half a quantisation step
        assert float(np.abs(got.raw - want).max()) <= 0.5 * 512.0 / 8192.0
    # unscaled: raw ADC counts
    counts = read_raw_all(f, scale_to_pA=False)
    assert float(np.abs(counts[0].raw).max()) > 500  # ADC-scale numbers
    assert len(read_raw_all(f, limit=1)) == 1


def test_read_raw_all_empty_file(tmp_path):
    import h5py

    f = tmp_path / "empty.fast5"
    with h5py.File(f, "w"):
        pass
    with pytest.raises(ValueError, match="no reads"):
        read_raw_all(f)


def test_engine_multi_read_file(tmp_path):
    from scrappie_tpu.parallel.runner import BasecallEngine

    pA = _sim_signals([900, 700], seed=21)
    f = _make_multi_fast5(tmp_path / "multi.fast5", pA)
    eng = BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=400,
                         batch_size=4)
    results = eng.basecall_files([f], trim_start=0, trim_end=0)
    assert len(results) == 2
    names = [n for n, _ in results]
    assert names[0].endswith(":0000-beef") and names[1].endswith(":0001-beef")
    for _, res in results:
        assert res.sequence and len(res.sequence) > 50


def test_cli_raw_multi_read_file(tmp_path):
    from tests.test_cli import run_cli

    pA = _sim_signals([800, 600], seed=33)
    f = _make_multi_fast5(tmp_path / "multi.fast5", pA)
    out = tmp_path / "calls.fa"
    r = run_cli("raw", str(f), "--model", "rgrgr_r94", "--chunk-len", "2000",
                "--overlap", "400", "--trim", "0:0", "-o", str(out))
    assert r.returncode == 0
    text = out.read_text()
    recs = [l for l in text.splitlines() if l.startswith(">")]
    assert len(recs) == 2
    assert ":0000-beef" in recs[0] and ":0001-beef" in recs[1]

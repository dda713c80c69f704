"""Basecall parity with the reference C implementation.

The reference binary is built from the reference sources (copied into
the gitignored .baseline/ working area) with OUR weights exported as C
headers.  Reproducible from a fresh checkout: `bash
scripts/build_baseline.sh` compiles the committed scripts/bench_driver.c
against the copied reference sources and turns the skips below into
runs (scripts/export_c_headers.py supplies the weights).
Running both implementations on the identical normalised signal must
yield near-identical basecalls — the analogue of the reference's own
SSE-vs-scalar decoder parity test (ref src/test/test_scrappie_decoding.c)
but across implementations.  The decoder is bit-identical (tests/test_ops);
the posterior GEMMs differ at the float-reassociation level between
CBLAS and XLA, so a borderline block can flip: the round-1 weights were
byte-identical, the retrained (higher-accuracy) weights flip a single
block on the bundled read, so the assertion allows <= 2 edits.

Skipped when the baseline binary has not been built.
"""

import pathlib
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier (see pyproject)

DRIVER = pathlib.Path(__file__).parent.parent / ".baseline" / "src" / "bench_driver"

needs_driver = pytest.mark.skipif(not DRIVER.exists(),
                                  reason="baseline binary not built")


def run_driver(*args, timeout=600):
    ref = subprocess.run([str(DRIVER)] + [str(a) for a in args],
                         capture_output=True, text=True, timeout=timeout)
    assert ref.returncode == 0, ref.stderr
    return dict(line.split("\t", 1)
                for line in ref.stdout.strip().splitlines())


def write_matrix(path, arr):
    """Text matrix: 'T ns' header then rows; %.9g round-trips f32."""
    arr = np.asarray(arr, dtype=np.float32)
    with open(path, "w") as fh:
        fh.write(f"{arr.shape[0]} {arr.shape[1]}\n")
        np.savetxt(fh, arr, fmt="%.9g")


def parse_path(field):
    return np.array([int(x) for x in field.split()])


@pytest.mark.skipif(not DRIVER.exists(), reason="baseline binary not built")
def test_basecall_parity_with_reference(reads_dir, tmp_path):
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.post.overlapper import overlapper
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.utils.maths import medmad_normalise

    rs = read_raw(reads_dir / "read_ch228_file118.fast5")
    rt = trim_and_segment_raw(rs, 200, 10)
    norm = medmad_normalise(rt.trimmed)
    sig_file = tmp_path / "signal.txt"
    np.savetxt(sig_file, norm, fmt="%.9g")

    ref = subprocess.run([str(DRIVER), str(sig_file)], capture_output=True,
                         text=True, timeout=600)
    assert ref.returncode == 0, ref.stderr
    fields = dict(line.split("\t") for line in ref.stdout.strip().splitlines())

    params = registry.load_params("rgrgr_r94")
    lp = np.asarray(
        forward.rgrgr_posterior(params, norm.reshape(1, -1, 1),
                                conv_activation="elu", stride=5, min_prob=1e-5)
    )[0]
    score, path = decode_transducer(lp, 0.0, 0.0, 2.0)
    seq = overlapper(path, 1024)

    import Levenshtein

    edit = Levenshtein.distance(seq, fields["sequence"])
    # CBLAS-vs-XLA GEMM reassociation flips borderline blocks; allow ~1
    # edit per 1000 bases (decode itself is exact at 1e-5:
    # test_transducer_decode_parity).  Measured: 1 edit with the round-1
    # weights, 4 with the real-read fine-tuned weights (~3.3k bases).
    assert edit / max(len(seq), 1) <= 3e-3, (
        f"basecalls differ from reference binary by {edit} edits "
        f"in {len(seq)} bases")
    ref_score = float(fields["score"])
    assert abs(score - ref_score) / abs(ref_score) < 1e-3


@needs_driver
def test_transducer_decode_parity(tmp_path):
    """Same posterior through both transducer decoders: identical path,
    score within the reference's own 1e-5 tolerance
    (ref src/test/test_scrappie_decoding.c:48-49)."""
    from scrappie_tpu.decode.transducer import decode_transducer

    rng = np.random.default_rng(5)
    T, ns = 60, 1025
    # floored (as robustlog/min_prob does in production) and biased along
    # a valid kmer walk so the Viterbi path actually maps: an all-local
    # path exercises a reference edge case where the final entry keeps an
    # untranscoded local state (ref src/decode.c:77-95 transcodes leading
    # starts/trailing ends only up to the first mapped block)
    p = rng.dirichlet(np.full(ns, 0.2), size=T)
    p = np.maximum(p, 1e-6)
    kmer = int(rng.integers(1024))
    for t in range(T):
        if rng.random() < 0.5:
            kmer = ((kmer << 2) & 1023) | int(rng.integers(4))
            p[t, kmer] += 1.0
        else:
            p[t, 1024] += 1.0  # stay
    lp = np.log(p / p.sum(-1, keepdims=True)).astype(np.float32)
    f = tmp_path / "post.txt"
    write_matrix(f, lp)
    ref = run_driver("--mode", "decode", f)

    score, path = decode_transducer(np.loadtxt(f, skiprows=1,
                                               dtype=np.float32), 0.0, 0.0, 2.0)
    np.testing.assert_array_equal(np.asarray(path), parse_path(ref["path"]))
    ref_score = float(ref["score"])
    assert abs(score - ref_score) <= 1e-5 * max(abs(ref_score), 1.0)


@needs_driver
def test_crf_decode_parity(tmp_path):
    """Same CRF transitions through both decoders: identical path and
    basecall, score within 1e-5."""
    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf

    rng = np.random.default_rng(6)
    T = 80
    trans = rng.standard_normal((T, 25)).astype(np.float32)
    f = tmp_path / "trans.txt"
    write_matrix(f, trans)
    ref = run_driver("--mode", "crfdecode", f)

    score, path = decode_crf(np.loadtxt(f, skiprows=1, dtype=np.float32)[None])
    path = np.asarray(path)[0]
    np.testing.assert_array_equal(path, parse_path(ref["path"]))
    seq = crfpath_to_basecall(path)
    assert seq == ref["sequence"]
    ref_score = float(ref["score"])
    assert abs(float(score[0]) - ref_score) <= 1e-5 * max(abs(ref_score), 1.0)


@needs_driver
def test_crf_pipeline_parity(reads_dir, tmp_path):
    """signal -> rnnrf transitions -> CRF decode, cross-implementation
    (the rnnrf analogue of the rgrgr end-to-end parity test)."""
    from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.utils.maths import medmad_normalise

    rs = read_raw(reads_dir / "read_ch228_file118.fast5")
    rt = trim_and_segment_raw(rs, 200, 10)
    norm = medmad_normalise(rt.trimmed)[:6000]
    sig_file = tmp_path / "signal.txt"
    np.savetxt(sig_file, norm, fmt="%.9g")
    ref = run_driver("--mode", "crf", sig_file)

    params = registry.load_params("rnnrf_r94")
    trans = np.asarray(
        forward.rnnrf_transitions(params, norm.reshape(1, -1, 1),
                                  conv_activation="elu", stride=2))[0]
    score, path = decode_crf(trans[None])
    seq = crfpath_to_basecall(np.asarray(path)[0])

    import Levenshtein

    edit = Levenshtein.distance(seq, ref["sequence"])
    # Borderline-block flips (CBLAS-vs-XLA GEMM float ordering) scale
    # with the number of DP BLOCKS, not emitted bases: at stride 2 this
    # read is ~3000 blocks for ~430 bases.  The round-4 whole-region
    # weights measured 3 flipped blocks here (the round-3 window-trained
    # weights measured 2); the decoder itself is exact at 1e-5
    # (test_crf_decode_parity).
    assert edit <= max(2, trans.shape[0] // 500), (
        f"CRF basecalls differ by {edit} edits in {trans.shape[0]} blocks")
    ref_score = float(ref["score"])
    # the CRF score embeds the globalnorm partition function accumulated
    # over ~3000 blocks; CBLAS-vs-XLA GEMM reassociation drifts it ~2e-3
    # relative (decode itself is exact: test_crf_decode_parity is 1e-5)
    assert abs(float(score[0]) - ref_score) <= 5e-3 * max(abs(ref_score), 1.0)


@needs_driver
def test_dtw_parity(tmp_path):
    """signal-to-squiggle DTW (mappy path) against the C binary with the
    real squiggle_r94 weights: identical path, scores within 1e-4."""
    from scrappie_tpu.decode.dtw import (squiggle_match_forward,
                                         squiggle_match_viterbi)
    from scrappie_tpu.models import forward, registry

    rng = np.random.default_rng(7)
    bases = rng.integers(0, 4, size=40)
    seq_str = "".join("ACGT"[b] for b in bases)
    params = registry.load_params("squiggle_r94")
    sq = np.asarray(forward.squiggle_forward(params, bases.astype(np.int32),
                                             transform_units=True))
    dwells = np.maximum(1, np.round(sq[:, 2])).astype(int)
    sig = np.repeat(sq[:, 0], dwells)
    sig = sig + 0.1 * rng.standard_normal(len(sig)).astype(np.float32)

    bases_file = tmp_path / "bases.txt"
    bases_file.write_text(seq_str + "\n")
    sig_file = tmp_path / "sig.txt"
    np.savetxt(sig_file, sig, fmt="%.9g")
    ref = run_driver("--mode", "dtw", bases_file, sig_file)

    sq_raw = np.asarray(forward.squiggle_forward(params, bases.astype(np.int32),
                                                 transform_units=False))
    # mappy defaults (ref src/scrappie_mappy.c:59-75)
    score, path = squiggle_match_viterbi(sig.astype(np.float32), sq_raw,
                                         rate=1.0, prob_back=0.0,
                                         local_pen=2.0, skip_pen=5000.0,
                                         minscore=5.0)
    fwd = squiggle_match_forward(sig.astype(np.float32), sq_raw, rate=1.0,
                                 prob_back=0.0, local_pen=2.0,
                                 skip_pen=5000.0, minscore=5.0)
    np.testing.assert_array_equal(path, parse_path(ref["path"]))
    assert abs(score - float(ref["score"])) <= 1e-4 * max(abs(score), 1.0)
    assert abs(fwd - float(ref["forward"])) <= 1e-4 * max(abs(fwd), 1.0)


@needs_driver
@pytest.mark.parametrize("banded", [False, True])
def test_seqmap_parity(tmp_path, banded):
    """posterior -> sequence mapping (seqmappy path) against the C
    binary: dense (path + scores) and banded (scores)."""
    from scrappie_tpu.decode import mapping

    rng = np.random.default_rng(8)
    T, ns = 70, 1025
    seqlen_b = 48
    bases = rng.integers(0, 4, size=seqlen_b)
    seq_str = "".join("ACGT"[b] for b in bases)
    kmers = np.zeros(seqlen_b - 4, dtype=np.int64)
    for j in range(5):
        kmers += bases[j : seqlen_b - 4 + j] << (2 * (4 - j))
    seqlen = len(kmers)

    # posterior that loosely follows the sequence so the map is nontrivial
    lp = np.log(rng.dirichlet(np.full(ns, 0.05), size=T)).astype(np.float32)
    blocks = np.minimum((np.arange(T) * seqlen) // T, seqlen - 1)
    lp[np.arange(T), kmers[blocks]] += 3.0

    bases_file = tmp_path / "bases.txt"
    bases_file.write_text(seq_str + "\n")
    post_file = tmp_path / "post.txt"
    write_matrix(post_file, lp)

    if banded:
        half = 6
        low = np.maximum(0, blocks - half).astype(np.int64)
        high = np.minimum(seqlen, blocks + half).astype(np.int64)
        low[0] = 0
        high[-1] = seqlen
        high = np.maximum.accumulate(high)
        assert mapping.are_bounds_sane(low, high, T, seqlen)
        band_file = tmp_path / "band.txt"
        np.savetxt(band_file, np.stack([low, high], axis=1), fmt="%d")
        ref = run_driver("--mode", "seqmap", bases_file, post_file, band_file)
        score = mapping.map_to_sequence_banded(lp, kmers, low, high,
                                               0.0, 0.0, 4.0, viterbi=True)
        fwd = mapping.map_to_sequence_banded(lp, kmers, low, high,
                                             0.0, 0.0, 4.0, viterbi=False)
    else:
        ref = run_driver("--mode", "seqmap", bases_file, post_file)
        score, path = mapping.map_to_sequence_viterbi(lp, kmers, 0.0, 0.0,
                                                      4.0, want_path=True)
        fwd = mapping.map_to_sequence_forward(lp, kmers, 0.0, 0.0, 4.0)
        np.testing.assert_array_equal(path, parse_path(ref["path"]))
    assert abs(score - float(ref["score"])) <= 1e-4 * max(abs(score), 1.0)
    assert abs(fwd - float(ref["forward"])) <= 1e-4 * max(abs(fwd), 1.0)

"""End-to-end API tests on the bundled real reads (synthetic weights)."""

import numpy as np
import pytest

import scrappie_tpu
from scrappie_tpu.api import RawTable, basecall_raw, calc_post, decode_post, encode_bases


def load_read(reads_dir, name="MINICOL228_20161012_FNFAB42578_MN17976_mux_scan_HG_52221_ch271_read66_strand.fast5"):
    import h5py

    with h5py.File(reads_dir / name, "r") as h:
        rname = list(h["Raw/Reads"].keys())[0]
        sig = h[f"Raw/Reads/{rname}/Signal"][()].astype(np.float32)
        meta = h["/UniqueGlobalKey/channel_id"].attrs
        return (sig + meta["offset"]) * (meta["range"] / meta["digitisation"])


def test_state_properties():
    assert scrappie_tpu.guess_state_properties(1025) == (4, 5)
    assert scrappie_tpu.guess_state_properties(257) == (4, 4)


def test_encode_bases():
    np.testing.assert_array_equal(encode_bases("ACGT"), [0, 1, 2, 3])
    np.testing.assert_array_equal(encode_bases("acgt"), [0, 1, 2, 3])
    # 2-mers: AC=1, CG=6, GT=11
    np.testing.assert_array_equal(encode_bases("ACGT", 2), [1, 6, 11])


def test_calc_post_invariants(reads_dir):
    sig = load_read(reads_dir)[:20000]
    rt = RawTable(sig).trim().scale()
    post = calc_post(rt, "rgrgr_r94", log=True)
    nblock, nstate = post.shape
    # Documented invariants: 1025 states, stride 5
    # (ref python/test/test_scrappy.py:46-48)
    assert nstate == 1025
    assert nblock == -(-(rt.end - rt.start) // 5)
    p = np.exp(post.data(as_numpy=True, sloika=False))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-3)
    # Sloika reorder: stay first
    sl = post.data(as_numpy=True, sloika=True)
    np.testing.assert_array_equal(sl[:, 0], post.data()[:, -1])


def test_basecall_raw_transducer(reads_dir):
    sig = load_read(reads_dir)[:20000]
    # Until the synthetic models are trained (their posteriors lack the
    # temporal consistency of a real basecaller), a large local_pen is
    # needed for the Viterbi to emit rather than sit in the local states.
    seq, score, pos, start, end, probs = basecall_raw(sig, "rgrgr_r94", local_pen=20.0)
    assert probs is None
    assert isinstance(seq, str) and len(seq) > 50
    assert set(seq) <= set("ACGT")
    assert np.isfinite(score)
    assert pos[-1] >= len(seq) - 5  # pos tracks basecall coordinates
    assert start >= 200


def test_basecall_raw_crf(reads_dir):
    sig = load_read(reads_dir)[:20000]
    seq, score, pos, start, end, probs = basecall_raw(
        sig, "rnnrf_r94", with_base_probs=True
    )
    assert isinstance(seq, str)
    assert set(seq) <= set("ACGT")
    nblock = -(-(end - start) // 2)
    assert probs.shape == (nblock + 1, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_basecall_homopolymer_mode(reads_dir):
    sig = load_read(reads_dir)[:15000]
    seq1, *_ = basecall_raw(sig, "rgrgr_r94", homopolymer="nochange", local_pen=20.0)
    seq2, *_ = basecall_raw(sig, "rgrgr_r94", homopolymer="mean", local_pen=20.0)
    # Same pipeline, possibly modified homopolymer run lengths
    assert abs(len(seq1) - len(seq2)) < max(20, len(seq1) // 10)


def test_decode_post_type_checks():
    with pytest.raises(TypeError):
        decode_post(np.zeros((5, 5)))

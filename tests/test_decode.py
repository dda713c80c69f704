"""Decoder equivalence tests: on-device scans vs scalar numpy references.

Mirrors ref src/test/test_scrappie_decoding.c (vectorised-vs-scalar
Viterbi parity) on synthetic posteriors.
"""

import numpy as np
import pytest

from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf, posterior_crf
from scrappie_tpu.decode.reference import viterbi_crf_ref, viterbi_transducer_ref
from scrappie_tpu.decode.transducer import argmax_decoder, decode_transducer
from scrappie_tpu.post.overlapper import (
    ctc_remove_stays_and_repeats,
    kmer_len_from_nkmer,
    overlap_lengths,
    overlapper,
)


def random_logpost(T, nstate, seed=0, peaky=True):
    rng = np.random.default_rng(seed)
    lp = rng.standard_normal((T, nstate)).astype(np.float32)
    if peaky:
        # Make the posterior peaky like a real net output
        lp = lp * 2.0
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp.astype(np.float32)


@pytest.mark.parametrize("use_slip", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_transducer_device_matches_scalar(use_slip, seed):
    lp = random_logpost(25, 257, seed=seed)  # 4-mer space: 256 kmers + stay
    score_d, path_d = decode_transducer(lp, 0.5, 1.0, 2.0, use_slip)
    score_s, path_s = viterbi_transducer_ref(lp, 0.5, 1.0, 2.0, use_slip)
    assert abs(score_d - score_s) < 1e-4
    np.testing.assert_array_equal(path_d, path_s)


def test_transducer_5mer_space():
    lp = random_logpost(10, 1025, seed=3)
    score_d, path_d = decode_transducer(lp, 0.0, 0.0, 2.0)
    score_s, path_s = viterbi_transducer_ref(lp, 0.0, 0.0, 2.0)
    assert abs(score_d - score_s) < 1e-4
    np.testing.assert_array_equal(path_d, path_s)


def test_transducer_batched():
    lps = np.stack([random_logpost(15, 257, seed=s) for s in range(3)])
    scores, paths = decode_transducer(lps, 0.2, 0.3, 2.0)
    for i in range(3):
        s, p = decode_transducer(lps[i], 0.2, 0.3, 2.0)
        assert abs(scores[i] - s) < 1e-4
        np.testing.assert_array_equal(paths[i], p)


def test_transducer_path_moves_are_legal():
    lp = random_logpost(40, 257, seed=7)
    _, path = decode_transducer(lp, 0.0, 0.0, 2.0)
    ks = path[path >= 0]
    klen = 4
    for a, b in zip(ks[:-1], ks[1:]):
        # Each move must be reachable: suffix of a == prefix of b for some
        # shift 0..klen (0 would be a repeat, only via stay in between)
        ols = overlap_lengths(np.array([a, b]), klen)
        assert 1 <= ols[0] <= klen


def test_crf_device_matches_scalar():
    rng = np.random.default_rng(11)
    trans = rng.standard_normal((30, 25)).astype(np.float32)
    score_d, path_d = decode_crf(trans)
    score_s, path_s = viterbi_crf_ref(trans)
    assert abs(score_d - score_s) < 1e-4
    np.testing.assert_array_equal(path_d, path_s)


def test_crf_posterior_normalised():
    rng = np.random.default_rng(12)
    trans = rng.standard_normal((20, 25)).astype(np.float32)
    post = posterior_crf(trans)
    assert post.shape == (21, 5)
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-5)


def test_crf_posterior_matches_bruteforce():
    """Forward-backward equals marginalising over all explicit paths."""
    rng = np.random.default_rng(13)
    T, ns = 4, 3
    trans = rng.standard_normal((T, ns * ns)).astype(np.float32)
    post = posterior_crf(trans.repeat(1, axis=0))
    # enumerate all state sequences of length T+1
    import itertools

    scores = {}
    for seq in itertools.product(range(ns), repeat=T + 1):
        s = sum(trans[t, seq[t + 1] * ns + seq[t]] for t in range(T))
        scores[seq] = np.exp(s)
    Z = sum(scores.values())
    want = np.zeros((T + 1, ns))
    for seq, w in scores.items():
        for t, st in enumerate(seq):
            want[t, st] += w / Z
    np.testing.assert_allclose(post[:, :], want, atol=1e-4)


def test_crfpath_to_basecall():
    # The (nblock+1)-entry Viterbi path's final entry never emits: the
    # reference passes npos=nblock (ref src/scrappie_raw.c:306,
    # src/decode.c:895-918), so the trailing 3 here is dropped.
    path = np.array([4, 0, 4, 1, 1, 2, 4, 3, 3])
    pos = np.zeros(len(path), dtype=np.int64)
    seq = crfpath_to_basecall(path, pos)
    assert seq == "ACCGT"
    np.testing.assert_array_equal(pos[:-1], [-1, 0, 0, 1, 2, 3, 3, 4])
    # Explicit npos consumes exactly that many entries
    assert crfpath_to_basecall(path, npos=7) == "ACCG"


def test_overlap_lengths():
    klen = 5
    # AACGT (0,0,1,2,3) -> ACGTT: overlap 1 new base
    k1 = int("".join("0123"[b] for b in []) or "0")
    a = (0 << 8) | (0 << 6) | (1 << 4) | (2 << 2) | 3  # AACGT
    b = ((a << 2) | 3) & (4**5 - 1)  # ACGTT
    assert overlap_lengths(np.array([a, b]), klen)[0] == 1
    # identical kmers -> full klen shift (ref do-while semantics)
    assert overlap_lengths(np.array([a, a]), klen)[0] in range(1, klen + 1)


def overlap_scalar(k1, k2, nkmer):
    mask = nkmer - 1
    o = 0
    while True:
        mask >>= 2
        k1 &= mask
        k2 >>= 2
        o += 1
        if k1 == k2:
            return o


def test_overlap_matches_scalar():
    rng = np.random.default_rng(5)
    ks = rng.integers(0, 1024, size=50)
    got = overlap_lengths(ks, 5)
    want = [overlap_scalar(int(a), int(b), 1024) for a, b in zip(ks[:-1], ks[1:])]
    np.testing.assert_array_equal(got, want)


def overlapper_scalar(path, nkmer):
    """Direct scalar port for cross-validation."""
    klen = kmer_len_from_nkmer(nkmer)
    ks = [int(s) for s in path if s >= 0]
    if not ks:
        return None
    def kmer_str(k, n):
        return "".join("ACGT"[(k >> (2 * (n - 1 - j))) & 3] for j in range(n))
    seq = kmer_str(ks[0], klen)
    for a, b in zip(ks[:-1], ks[1:]):
        o = overlap_scalar(a, b, nkmer)
        seq += kmer_str(b, klen)[klen - o:]
    return seq


def test_overlapper_matches_scalar():
    rng = np.random.default_rng(6)
    path = rng.integers(-1, 1024, size=60)
    got = overlapper(path, 1024)
    want = overlapper_scalar(path, 1024)
    assert got == want


def test_overlapper_pos():
    # path: stay, AAAAA, stay, AAAAC, skip to AACGT
    A5 = 0
    AAAAC = 1
    AACGT = (0 << 8) | (1 << 6) | (1 << 4) | (2 << 2) | 3  # A A C G T -> wait
    path = np.array([-1, A5, -1, AAAAC])
    pos = np.zeros(len(path), dtype=np.int64)
    seq = overlapper(path, 1024, pos)
    assert seq == "AAAAAC"
    np.testing.assert_array_equal(pos, [0, 0, 0, 1])


def test_overlapper_all_stays():
    assert overlapper(np.full(5, -1), 1024) is None


def test_argmax_decoder():
    lp = random_logpost(8, 257, seed=9)
    score, path = argmax_decoder(lp)
    imax = lp.argmax(-1)
    want = np.where(imax == 256, -1, imax)
    np.testing.assert_array_equal(path, want)


def test_ctc_remove_stays_and_repeats():
    path = np.array([-1, 0, 0, -1, 0, 1, 1, 2, -1, 3])
    seq = ctc_remove_stays_and_repeats(path)
    # repeated 0 after stay is NOT re-emitted (prev tracks emitted state)
    assert seq == "ACGT"


def test_crf_emit_bias_plumbing_and_effect():
    """decode_crf(trans, emit_bias=b) == decode_crf on manually biased
    transitions (bias adds to every entry with to-state < blank), and a
    strongly negative bias emits fewer bases."""
    rng = np.random.default_rng(42)
    trans = rng.normal(0.0, 1.5, size=(64, 25)).astype(np.float32)

    s1, p1 = decode_crf(trans, emit_bias=-0.7)
    manual = trans.copy()
    manual[:, :20] -= 0.7
    s2, p2 = decode_crf(manual)
    assert np.allclose(s1, s2, rtol=1e-6)
    assert np.array_equal(p1, p2)

    seq0 = crfpath_to_basecall(decode_crf(trans)[1])
    seqn = crfpath_to_basecall(decode_crf(trans, emit_bias=-4.0)[1])
    assert len(seqn) < len(seq0)
    # bias 0 is exactly the reference decode
    s0a, p0a = decode_crf(trans)
    s0b, p0b = decode_crf(trans, emit_bias=0.0)
    assert s0a == s0b and np.array_equal(p0a, p0b)

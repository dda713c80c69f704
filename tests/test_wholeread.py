"""Whole-region CRF training machinery (train/wholeread.py).

The chunked (sqrt-remat) scans must be bit-identical to the plain
lax.scan lattice programs — they are the same recurrence re-batched —
including under grad, and region extraction must respect the chunk
alignment and the aligned-base span.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from scrappie_tpu.train.lattice import (  # noqa: E402
    _crf_lattice_forward_impl,
    _crf_local_partition_impl,
    crf_lattice_forward_batch,
    crf_local_partition,
)
from scrappie_tpu.train import wholeread  # noqa: E402


@pytest.fixture(scope="module")
def lattice_case():
    rng = np.random.default_rng(7)
    B, T, L = 3, 64, 12
    trans = jnp.asarray(rng.normal(size=(B, T, 25)).astype(np.float32))
    bases = np.full((B, L), -1, np.int32)
    for b in range(B):
        n = int(rng.integers(5, L + 1))
        bases[b, :n] = rng.integers(0, 4, n)
    return trans, jnp.asarray(bases)


def test_chunked_scan_matches_plain(lattice_case):
    trans, bases = lattice_case
    sc = wholeread.chunked_scan(16)
    f = _crf_lattice_forward_impl(trans, bases, 4.0, sc)
    z = _crf_local_partition_impl(trans, 4.0, sc)
    np.testing.assert_array_equal(
        np.asarray(f), np.asarray(crf_lattice_forward_batch(trans, bases, 4.0)))
    np.testing.assert_array_equal(
        np.asarray(z), np.asarray(crf_local_partition(trans, 4.0)))


def test_chunked_grad_matches_plain(lattice_case):
    trans, bases = lattice_case
    T = trans.shape[1]

    def plain(t):
        return ((_crf_local_partition_impl(t, 4.0, jax.lax.scan)
                 - _crf_lattice_forward_impl(t, bases, 4.0, jax.lax.scan))
                / T).mean()

    g_chunk = jax.grad(lambda t: wholeread.crf_wholeread_nll(
        t, bases, 4.0, 16))(trans)
    g_plain = jax.grad(plain)(trans)
    np.testing.assert_array_equal(np.asarray(g_chunk), np.asarray(g_plain))


def test_chunked_scan_rejects_misaligned(lattice_case):
    trans, bases = lattice_case
    with pytest.raises(ValueError, match="not a multiple"):
        wholeread.crf_wholeread_nll(trans, bases, 4.0, 48)


def test_region_sequence_alignment():
    from scrappie_tpu.train.realdata import LabelledRead

    nsample, stride, chunk = 10_000, 2, 256
    rng = np.random.default_rng(3)
    bases = rng.integers(0, 4, 1500).astype(np.int64)
    base_at = np.repeat(np.arange(1000), 10)[:nsample]
    base_at[:300] = -1  # unaligned head
    read = LabelledRead("t", rng.normal(size=nsample).astype(np.float32),
                        bases, base_at, 0.0)
    sig, seq = wholeread.region_sequence(read, 8_000, stride, chunk)
    nblock = len(sig) // stride
    assert nblock % chunk == 0 and len(sig) <= 8_000
    # truth spans exactly the aligned base indices inside the region
    ba = base_at[: len(sig)]
    lo, hi = ba[ba >= 0].min(), ba[ba >= 0].max()
    np.testing.assert_array_equal(seq, bases[lo : hi + 1].astype(np.int32))


def test_head_step_moves_only_head():
    import optax

    rng = np.random.default_rng(0)
    T, L = 64, 10
    feats = jnp.asarray(rng.normal(size=(1, T, 96)).astype(np.float32))
    bases = jnp.asarray(rng.integers(0, 4, (1, L)).astype(np.int32))
    head = {"FF_W": jnp.asarray(rng.normal(size=(96, 25)) * 0.1,
                                jnp.float32),
            "FF_b": jnp.zeros((25,), jnp.float32)}
    opt = optax.adam(1e-2)
    step = wholeread.make_head_step(opt, 4.0, 16)
    st = opt.init(head)
    h1, st, l1 = step(head, st, feats, bases)
    _, _, l2 = step(h1, st, feats, bases)
    assert np.isfinite(l1) and float(l2) < float(l1)
    assert not np.allclose(np.asarray(h1["FF_W"]), np.asarray(head["FF_W"]))


def test_transducer_wholeread_matches_window_loss():
    """Round 4: the remat-chunked whole-region transducer lattice NLL is
    bit-identical to the plain-scan window loss on the same data
    (same recurrence, re-batched), including under grad."""
    from scrappie_tpu.train.lattice import lattice_forward_batch

    rng = np.random.default_rng(11)
    B, T, L, S = 2, 64, 14, 1025
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(S), size=(B, T)) + 1e-9)
        .astype(np.float32))
    seqs = np.full((B, L), -1, np.int32)
    for b in range(B):
        n = int(rng.integers(6, L + 1))
        seqs[b, :n] = rng.integers(0, 1024, n)
    seqs = jnp.asarray(seqs)

    plain = -(lattice_forward_batch(lp, seqs, 0.1, 4.0, 4.0) / T).mean()
    chunked = wholeread.transducer_wholeread_nll(lp, seqs, 0.1, 4.0, 4.0,
                                                 chunk=16)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(chunked))

    g_plain = jax.grad(
        lambda x: -(lattice_forward_batch(x, seqs, 0.1, 4.0, 4.0) / T).mean()
    )(lp)
    g_chunk = jax.grad(
        lambda x: wholeread.transducer_wholeread_nll(x, seqs, 0.1, 4.0, 4.0,
                                                     chunk=16))(lp)
    np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_chunk))


def test_region_event_seqstates():
    """Events regions trim to a chunk multiple of events and span the
    kmer states aligned to the region (round 4: events whole-region
    training)."""

    class FakeSampler:
        klen = 5

        def __init__(self):
            rng = np.random.default_rng(2)
            nev = 700
            ev_base = np.full(nev, -1, np.int64)
            ev_base[50:650] = np.linspace(0, 199, 600).astype(np.int64)
            self._ev = [{
                "feats": rng.normal(size=(nev, 4)).astype(np.float32),
                "ev_base": ev_base,
                "kmers": rng.integers(0, 1024, 196).astype(np.int64),
            }]
            self._train_nev = [660]

    s = FakeSampler()
    feats, states = wholeread.region_event_seqstates(s, 0, 128)
    assert feats.shape == (640, 4) and feats.dtype == np.float32  # 660//128*128
    eb = s._ev[0]["ev_base"][:640]
    lo = max(int(eb[eb >= 0].min()), s.klen - 1)
    hi = int(eb[eb >= 0].max())
    np.testing.assert_array_equal(
        states, s._ev[0]["kmers"][lo : hi + 1].astype(np.int32))


def test_region_seqstates_kmer_encoding():
    from scrappie_tpu.api import encode_bases

    class R:
        nsample = 4000
        name = "r"
        norm = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
        bases = np.array([0, 1, 2, 3, 0, 1, 2, 3, 0, 1], np.int64)
        base_at = np.full(4000, -1, np.int64)

    R.base_at[100:3000] = np.linspace(0, 9, 2900).astype(np.int64)
    sig, states = wholeread.region_seqstates(R, 3000, 5, 2)
    assert len(sig) % (5 * 2) == 0
    assert states.dtype == np.int32 and (states >= 0).all()
    assert len(states) == 10 - 4  # L - (KMER_LEN - 1)

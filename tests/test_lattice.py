"""Alignment-marginal lattice losses (train/lattice.py).

The CRF lattice is checked against brute-force enumeration of all 5^T
state paths under the reference transition semantics
(ref src/decode.c:836-894: energy trans[t, to*5 + from], base emitted
when to < 4); the transducer lattice gets ranking/shape sanity checks.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from scrappie_tpu.train.lattice import (crf_lattice_forward_batch,
                                        lattice_forward_batch)

BIG_PEN = 1.0e30


def brute_force_crf(trans, seq):
    """logsumexp of path energies over all 5-state paths emitting seq."""
    T = trans.shape[0]
    target = list(seq)
    scores = []
    for path in itertools.product(range(5), repeat=T):
        emitted = [s for s in path if s < 4]
        if emitted != target:
            continue
        prev = 4
        e = 0.0
        for t, s in enumerate(path):
            e += trans[t, s * 5 + prev]
            prev = s
        scores.append(e)
    assert scores, "no path emits the target sequence"
    m = max(scores)
    return m + np.log(np.sum(np.exp(np.asarray(scores) - m)))


@pytest.mark.parametrize("seed,L", [(0, 2), (1, 3), (2, 1)])
def test_crf_lattice_matches_enumeration(seed, L):
    rng = np.random.default_rng(seed)
    T = 6
    trans = rng.normal(scale=0.7, size=(T, 25)).astype(np.float32)
    seq = rng.integers(0, 4, size=L).astype(np.int32)

    want = brute_force_crf(trans, seq)
    bases = np.full((1, L + 2), -1, np.int32)
    bases[0, :L] = seq
    got = float(crf_lattice_forward_batch(trans[None], bases,
                                          local_pen=BIG_PEN)[0])
    assert got == pytest.approx(want, rel=1e-5, abs=1e-5)


def test_crf_lattice_batch_and_padding():
    """Padded batch rows score identically to their unpadded versions."""
    rng = np.random.default_rng(3)
    T = 8
    trans = rng.normal(scale=0.5, size=(2, T, 25)).astype(np.float32)
    seqs = [np.array([0, 2, 1], np.int32), np.array([3, 3], np.int32)]

    solo = []
    for b, seq in enumerate(seqs):
        pad = np.full((1, 5), -1, np.int32)
        pad[0, : len(seq)] = seq
        solo.append(float(crf_lattice_forward_batch(
            trans[b : b + 1], pad, local_pen=BIG_PEN)[0]))

    pad = np.full((2, 5), -1, np.int32)
    for b, seq in enumerate(seqs):
        pad[b, : len(seq)] = seq
    both = crf_lattice_forward_batch(trans, pad, local_pen=BIG_PEN)
    np.testing.assert_allclose(np.asarray(both), solo, rtol=1e-6)


def test_crf_lattice_local_states_add_mass():
    """Finite local_pen only adds (START/END) paths: score increases."""
    rng = np.random.default_rng(4)
    trans = rng.normal(size=(1, 10, 25)).astype(np.float32)
    bases = np.array([[1, 0, 3, -1]], np.int32)
    hard = float(crf_lattice_forward_batch(trans, bases,
                                           local_pen=BIG_PEN)[0])
    soft = float(crf_lattice_forward_batch(trans, bases, local_pen=2.0)[0])
    assert soft > hard


def test_crf_lattice_prefers_true_sequence():
    """Transitions concentrated on a known path rank its sequence top-1."""
    rng = np.random.default_rng(5)
    T = 12
    seq = np.array([2, 0, 3, 1], np.int32)
    # Path: stay, emit, stay, emit, ... then stays.
    path = []
    it = iter(seq)
    for t in range(T):
        path.append(4 if t % 3 != 1 or t // 3 >= len(seq) else next(it))
    trans = np.full((1, T, 25), -4.0, np.float32)
    prev = 4
    for t, s in enumerate(path):
        trans[0, t, s * 5 + prev] = 2.0
        prev = s

    def score(s):
        pad = np.full((1, 6), -1, np.int32)
        pad[0, : len(s)] = s
        return float(crf_lattice_forward_batch(trans, pad,
                                               local_pen=BIG_PEN)[0])

    true_score = score(seq)
    for _ in range(10):
        other = rng.integers(0, 4, size=len(seq)).astype(np.int32)
        if np.array_equal(other, seq):
            continue
        assert true_score > score(other)


def test_transducer_lattice_prefers_true_sequence():
    """Posterior concentrated on a kmer path ranks its sequence top-1."""
    rng = np.random.default_rng(6)
    T, S = 10, 17  # 2-mer transducer: 16 kmers + stay
    states = np.array([1, 6, 11, 14], np.int32)
    post = np.full((1, T, S), 1e-4, np.float32)
    j = 0
    for t in range(T):
        if t % 2 == 1 and j < len(states):
            post[0, t, states[j]] = 1.0
            j += 1
        else:
            post[0, t, S - 1] = 1.0
    lp = np.log(post / post.sum(-1, keepdims=True))

    def score(ss):
        pad = np.full((1, 6), -1, np.int32)
        pad[0, : len(ss)] = ss
        return float(lattice_forward_batch(lp, pad)[0])

    true_score = score(states)
    for _ in range(10):
        other = rng.integers(0, S - 1, size=len(states)).astype(np.int32)
        if np.array_equal(other, states):
            continue
        assert true_score > score(other)


def test_crf_local_partition_matches_enumeration():
    """With local_pen -> inf the extended lattice accepts exactly the
    plain '-'-initial paths that emit at least one base."""
    from scrappie_tpu.train.lattice import crf_local_partition

    rng = np.random.default_rng(8)
    T = 6
    trans = rng.normal(scale=0.7, size=(T, 25)).astype(np.float32)

    scores = []
    for path in itertools.product(range(5), repeat=T):
        if all(s == 4 for s in path):
            continue
        prev = 4
        e = 0.0
        for t, s in enumerate(path):
            e += trans[t, s * 5 + prev]
            prev = s
        scores.append(e)
    m = max(scores)
    want = m + np.log(np.sum(np.exp(np.asarray(scores) - m)))

    got = float(crf_local_partition(trans[None], local_pen=BIG_PEN)[0])
    assert got == pytest.approx(want, rel=1e-5, abs=1e-5)


@pytest.mark.parametrize("local_pen", [2.0, 4.0, BIG_PEN])
def test_crf_lattice_bounded_by_partition(local_pen):
    """log P(seq) <= logZ_local for any transitions: the loss is >= 0."""
    from scrappie_tpu.train.lattice import crf_local_partition

    rng = np.random.default_rng(9)
    trans = rng.normal(scale=3.0, size=(3, 20, 25)).astype(np.float32)
    bases = rng.integers(0, 4, size=(3, 8)).astype(np.int32)
    bases[0, 5:] = -1
    logp = np.asarray(crf_lattice_forward_batch(trans, bases, local_pen))
    logz = np.asarray(crf_local_partition(trans, local_pen))
    assert (logp <= logz + 1e-4).all()


@pytest.mark.slow
def test_crf_lattice_gradients_finite():
    import jax

    from scrappie_tpu.train.lattice import crf_lattice_loss_fn
    from scrappie_tpu.models import registry

    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("rnnrf_r94").items()}
    rng = np.random.default_rng(7)
    sig = rng.normal(size=(2, 400, 1)).astype(np.float32)
    bases = rng.integers(0, 4, size=(2, 16)).astype(np.int32)
    bases[:, 12:] = -1
    loss, grads = jax.value_and_grad(crf_lattice_loss_fn)(
        params, jnp.asarray(sig), jnp.asarray(bases), "rnnrf_r94")
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k

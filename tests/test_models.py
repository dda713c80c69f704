"""Model-zoo forward-pass tests: real squiggle weights + synthetic raw nets."""

import numpy as np
import pytest

from scrappie_tpu.models import forward, registry
from scrappie_tpu.models.header_parser import load_squiggle_header
from scrappie_tpu.models.specs import RAW_MODELS


@pytest.fixture(scope="module")
def squiggle_params():
    try:
        return registry.load_params("squiggle_r94")
    except FileNotFoundError:
        pytest.skip("squiggle weights unavailable (no npz, reference not mounted)")


# The 100-base test sequence from ref src/test/test_scrappie_squiggle.c:9-14
TEST_SEQ = np.array(
    [1, 0, 3, 3, 2, 1, 0, 1, 3, 1, 1, 0, 2, 1, 1, 3, 2, 1, 3, 2,
     2, 2, 3, 2, 0, 1, 0, 2, 2, 2, 3, 2, 0, 2, 0, 1, 3, 1, 1, 0,
     3, 1, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 3, 0, 3, 3,
     0, 3, 3, 0, 0, 0, 0, 0, 3, 1, 0, 0, 2, 3, 3, 3, 1, 1, 1, 2],
    dtype=np.int32,
)


def test_embed_matrix_matches_known_constant(squiggle_params):
    # misc/parse_squiggle.py:15-18 EMBEDDING_MATRIX
    exp = np.array(
        [[1, 0, -2**-0.5], [-1, 0, -2**-0.5], [0, 1, 2**-0.5], [0, -1, 2**-0.5]],
        dtype=np.float32,
    )
    np.testing.assert_allclose(squiggle_params["embed_W"], exp, atol=1e-6)


def test_squiggle_forward_real_weights(squiggle_params):
    out = np.asarray(forward.squiggle_forward(squiggle_params, TEST_SEQ, transform_units=False))
    assert out.shape == (100, 3)
    assert np.isfinite(out).all()

    trans = np.asarray(forward.squiggle_forward(squiggle_params, TEST_SEQ, transform_units=True))
    np.testing.assert_allclose(trans[:, 0], out[:, 0], rtol=1e-6)
    np.testing.assert_allclose(trans[:, 1], np.exp(out[:, 1]), rtol=1e-5)
    np.testing.assert_allclose(trans[:, 2], np.exp(-out[:, 2]), rtol=1e-5)
    assert (trans[:, 1] > 0).all() and (trans[:, 2] > 0).all()
    # Dwells should be on the order of samples-per-base (sanity)
    assert 0.1 < trans[:, 2].mean() < 100


def naive_squiggle(params, seq):
    """Naive numpy implementation of the squiggle net (same graph)."""
    x = params["embed_W"][seq]
    def conv(x, W, b, stride):
        T = x.shape[0]
        winlen = W.shape[0]
        padL = (winlen - 1) // 2
        ncol = -(-T // stride)
        out = np.tile(b, (ncol, 1)).astype(np.float64)
        for c in range(ncol):
            for w in range(winlen):
                i = c * stride - padL + w
                if 0 <= i < T:
                    out[c] += x[i].astype(np.float64) @ W[w].astype(np.float64)
        return out
    x = np.tanh(conv(x, params["conv1_W"], params["conv1_b"], 1))
    for k in range(2, 6):
        x = x + np.tanh(conv(x, params[f"conv{k}_W"], params[f"conv{k}_b"], 1))
    return conv(x, params["conv6_W"], params["conv6_b"], 1)


def test_squiggle_matches_naive(squiggle_params):
    got = np.asarray(forward.squiggle_forward(squiggle_params, TEST_SEQ[:40], transform_units=False))
    want = naive_squiggle(squiggle_params, TEST_SEQ[:40])
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("model", ["rgrgr_r94", "rnnrf_r94"])
def test_raw_models_run(model):
    spec = RAW_MODELS[model]
    params = registry.load_params(model)
    sig = np.random.default_rng(0).standard_normal((2, 100, 1)).astype(np.float32)
    if spec.kind == "rgrgr":
        post = np.asarray(
            forward.rgrgr_posterior(params, sig, conv_activation=spec.conv_activation,
                                    stride=spec.stride, return_log=False)
        )
        assert post.shape == (2, -(-100 // spec.stride), spec.nstate)
        np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)
    else:
        trans = np.asarray(
            forward.rnnrf_transitions(params, sig, conv_activation=spec.conv_activation,
                                      stride=spec.stride)
        )
        assert trans.shape == (2, -(-100 // spec.stride), 25)
        assert np.isfinite(trans).all()


def test_raw_r94_model_runs():
    spec = RAW_MODELS["raw_r94"]
    params = registry.load_params("raw_r94")
    sig = np.random.default_rng(1).standard_normal((1, 64, 1)).astype(np.float32)
    post = np.asarray(forward.raw_posterior(params, sig, stride=spec.stride, return_log=False))
    assert post.shape == (1, 16, spec.nstate)
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)


def test_events_model_runs():
    params = registry.load_params("nanonet_events")
    feats = np.random.default_rng(2).standard_normal((1, 30, 4)).astype(np.float32)
    post = np.asarray(forward.events_posterior(params, feats, return_log=False))
    assert post.shape == (1, 30, 1025)
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)


def test_model_stride_interface():
    assert registry.get_model_stride("rgrgr_r94") == 5
    with pytest.raises(ValueError):
        registry.get_model_stride("bogus")


def _random_params_like(model, seed):
    from scrappie_tpu.models import registry

    rng = np.random.default_rng(seed)
    return {k: (0.1 * rng.standard_normal(v.shape)).astype(np.float32)
            for k, v in registry.load_params(model).items()}


def test_crf_training_step_reduces_loss():
    """The rnnrf (CRF) trainer: loss decreases from a random init (the
    bundled weights may already be trained, leaving no headroom)."""
    from scrappie_tpu.train.trainer import train

    _, losses = train("rnnrf_r94", steps=6, batch=2, nsample=600, lr=1e-3,
                      log_every=0, params=_random_params_like("rnnrf_r94", 0))
    assert losses[-1] < losses[0]


def test_events_training_step_reduces_loss():
    """The events (biLSTM) trainer: loss decreases from a random init."""
    from scrappie_tpu.train.trainer import train

    _, losses = train("nanonet_events", steps=5, batch=2, nsample=1600,
                      lr=1e-3, log_every=0,
                      params=_random_params_like("nanonet_events", 1))
    assert losses[-1] < losses[0]

"""Layer-zoo equivalence tests: jnp layers vs naive numpy references.

Mirrors the reference strategy of testing the optimised kernels against
simple implementations (ref src/test/test_scrappie_convolution.c).
"""

import numpy as np
import pytest

from scrappie_tpu.nn.layers import (
    conv1d,
    crf_partition_function,
    elu,
    robustlog,
    softmax_with_temperature,
    window,
)
from scrappie_tpu.nn.rnn import gru, grumod, lstm


def naive_conv(x, W, b, stride):
    """Direct port of the reference's simple_convolution test helper:
    output col c = b + sum_w X[c*stride - padL + w] @ W[w]."""
    T, _ = x.shape
    winlen, _, nf = W.shape
    padL = (winlen - 1) // 2
    ncol = -(-T // stride)
    out = np.tile(b, (ncol, 1)).astype(np.float32)
    for c in range(ncol):
        for w in range(winlen):
            idx = c * stride - padL + w
            if 0 <= idx < T:
                out[c] += x[idx] @ W[w]
    return out


@pytest.mark.parametrize("stride", [1, 2, 3, 5])
@pytest.mark.parametrize("winlen", [1, 3, 4, 9, 19])
def test_conv_matches_naive(stride, winlen):
    rng = np.random.default_rng(42)
    T, cin, cout = 50, 3, 8
    x = rng.standard_normal((T, cin)).astype(np.float32)
    W = rng.standard_normal((winlen, cin, cout)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    got = np.asarray(conv1d(x, W, b, stride))
    want = naive_conv(x, W, b, stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_batched_consistent():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 40, 2)).astype(np.float32)
    W = rng.standard_normal((5, 2, 6)).astype(np.float32)
    b = np.zeros(6, dtype=np.float32)
    batched = np.asarray(conv1d(x, W, b, 2))
    for i in range(4):
        np.testing.assert_allclose(batched[i], np.asarray(conv1d(x[i], W, b, 2)), atol=1e-6)


def test_elu():
    # ref src/test/test_scrappie_elu.c edge cases
    x = np.array([0.0, -0.0, 1.0, -1.0, 1e30, -1e30], dtype=np.float32)
    got = np.asarray(elu(x))
    with np.errstate(over="ignore"):
        want = np.where(x >= 0, x, np.expm1(x))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def naive_gru_step(x, h, sW, sW2):
    size = len(h)
    xF = x.copy()
    xF[: 2 * size] += h @ sW
    zr = 1.0 / (1.0 + np.exp(-xF[: 2 * size]))
    z, r = zr[:size], zr[size:]
    hbar = np.tanh(xF[2 * size :] + (r * h) @ sW2)
    return z * h + (1 - z) * hbar


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_matches_stepwise(reverse):
    rng = np.random.default_rng(1)
    T, size = 11, 8
    x = rng.standard_normal((T, 3 * size)).astype(np.float32)
    sW = rng.standard_normal((size, 2 * size)).astype(np.float32) * 0.3
    sW2 = rng.standard_normal((size, size)).astype(np.float32) * 0.3
    got = np.asarray(gru(x, sW, sW2, reverse=reverse))

    h = np.zeros(size, dtype=np.float32)
    order = range(T - 1, -1, -1) if reverse else range(T)
    want = np.zeros((T, size), dtype=np.float32)
    for t in order:
        h = naive_gru_step(x[t].astype(np.float64), h, sW, sW2)
        want[t] = h
    np.testing.assert_allclose(got, want, atol=1e-5)


def naive_lstm_step(x, h, c, sW, peep):
    size = len(h)
    xF = x + h @ sW
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    forget = sig(xF[2 * size : 3 * size] + c * peep[size : 2 * size]) * c
    update = sig(xF[size : 2 * size] + c * peep[:size]) * np.tanh(xF[:size])
    c_new = forget + update
    h_new = sig(xF[3 * size :] + c_new * peep[2 * size :]) * np.tanh(c_new)
    return h_new, c_new


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_matches_stepwise(reverse):
    rng = np.random.default_rng(2)
    T, size = 9, 6
    x = rng.standard_normal((T, 4 * size)).astype(np.float32)
    sW = rng.standard_normal((size, 4 * size)).astype(np.float32) * 0.3
    peep = rng.standard_normal(3 * size).astype(np.float32) * 0.3
    got = np.asarray(lstm(x, sW, peep, reverse=reverse))

    h = np.zeros(size, dtype=np.float64)
    c = np.zeros(size, dtype=np.float64)
    order = range(T - 1, -1, -1) if reverse else range(T)
    want = np.zeros((T, size), dtype=np.float32)
    for t in order:
        h, c = naive_lstm_step(x[t].astype(np.float64), h, c, sW, peep)
        want[t] = h
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grumod_matches_stepwise():
    rng = np.random.default_rng(3)
    T, size = 7, 4
    x = rng.standard_normal((T, 3 * size)).astype(np.float32)
    sW = rng.standard_normal((size, 3 * size)).astype(np.float32) * 0.3
    got = np.asarray(grumod(x, sW))

    h = np.zeros(size, dtype=np.float64)
    want = np.zeros((T, size), dtype=np.float32)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    for t in range(T):
        rec = h @ sW
        zr = sig(x[t, : 2 * size] + rec[: 2 * size])
        z, r = zr[:size], zr[size:]
        hbar = np.tanh(r * rec[2 * size :] + x[t, 2 * size :])
        h = z * h + (1 - z) * hbar
        want[t] = h
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_window():
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    got = np.asarray(window(x, 3, 1))
    assert got.shape == (5, 6)
    # First col: [0 (pad), x0, x1]
    np.testing.assert_array_equal(got[0], [0, 0, 0, 1, 2, 3])
    np.testing.assert_array_equal(got[2], [2, 3, 4, 5, 6, 7])
    # Last col: [x3, x4, 0 (pad)]
    np.testing.assert_array_equal(got[4], [6, 7, 8, 9, 0, 0])


def test_softmax_temperature_unit_is_softmax():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((7, 5)).astype(np.float32)
    W = rng.standard_normal((5, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(softmax_with_temperature(x, W, b, 1.0, 1.0))
    z = x @ W + b
    want = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_softmax_temperature_formula():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 5)).astype(np.float32)
    W = rng.standard_normal((5, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    tw, tb = 2.0, 3.0
    got = np.asarray(softmax_with_temperature(x, W, b, tw, tb))
    z = (x @ W) / tw + b / tb
    want = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_crf_partition_function():
    rng = np.random.default_rng(6)
    T, ns = 6, 5
    trans = rng.standard_normal((T, ns * ns)).astype(np.float32)
    got = float(crf_partition_function(trans))
    # Brute-force forward pass in float64
    prev = np.zeros(ns)
    for t in range(T):
        m = trans[t].reshape(ns, ns)  # [to, from]
        prev = np.array(
            [np.logaddexp.reduce(m[s1] + prev) for s1 in range(ns)]
        )
    want = np.logaddexp.reduce(prev)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_robustlog():
    x = np.array([[0.0, 0.5, 1.0]], dtype=np.float32)
    got = np.asarray(robustlog(x, 1e-5))
    want = np.log(1e-5 / 3 + (1 - 1e-5) * x)
    np.testing.assert_allclose(got, want, rtol=1e-6)

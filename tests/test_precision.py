"""Precision-policy tests: the 'bf16' emulation mode (nn/config.py).

The 'bf16' mode rounds matmul/conv operands to bfloat16 before an
f32-accumulated contraction — the numerics of a single MXU pass
(TPU Precision.DEFAULT) reproduced on any backend.  These tests pin
the operand rounding, the policy save/restore, and that the flagship
forward pass is decode-stable under bf16 rounding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scrappie_tpu.nn import config


@pytest.fixture(autouse=True)
def _restore_policy():
    old_p, old_emu = config.get_precision(), config.bf16_emulation()
    yield
    config._PRECISION, config._BF16_EMULATE = old_p, old_emu


def test_pdot_bf16_matches_manual_cast():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 96)).astype(np.float32)
    w = rng.standard_normal((96, 48)).astype(np.float32)
    with config.precision("bf16"):
        assert config.bf16_emulation()
        got = config.pdot(jnp.asarray(x), jnp.asarray(w))
    manual = jnp.dot(x.astype(jnp.bfloat16).astype(np.float32),
                     w.astype(jnp.bfloat16).astype(np.float32),
                     preferred_element_type=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(manual))
    # ...and it genuinely differs from the exact product (mode is live).
    exact = np.asarray(config.pdot(jnp.asarray(x), jnp.asarray(w)))
    assert np.abs(exact - np.asarray(got)).max() > 0


def test_precision_context_restores_both_flags():
    assert not config.bf16_emulation()
    with config.precision("bf16"):
        with config.precision("highest"):
            assert not config.bf16_emulation()
        assert config.bf16_emulation()
    assert not config.bf16_emulation()
    import jax
    assert config.get_precision() == jax.lax.Precision.HIGHEST


def test_conv_operands_rounded_in_bf16_mode():
    from scrappie_tpu.nn.layers import conv1d
    rng = np.random.default_rng(1)
    x = rng.standard_normal((600, 1)).astype(np.float32)
    W = rng.standard_normal((11, 1, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    with config.precision("bf16"):
        got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(W), jnp.asarray(b), 2))
    want = np.asarray(conv1d(
        jnp.asarray(x.astype(jnp.bfloat16).astype(np.float32)),
        jnp.asarray(np.asarray(W, dtype=jnp.bfloat16).astype(np.float32)),
        jnp.asarray(b), 2))
    np.testing.assert_array_equal(got, want)


def test_flagship_forward_decode_stable_under_bf16():
    """rgrgr_r94 posterior block argmaxes barely move under bf16
    rounding — the compute-path basis for the bf16 throughput mode
    (BASELINE.md).  Real-read identity impact is measured separately
    (scripts/eval_real_reads.py with SCRAPPIE_TPU_PRECISION=bf16)."""
    from scrappie_tpu.models import registry
    from scrappie_tpu.models.forward import rgrgr_posterior

    params = registry.load_params("rgrgr_r94")
    sig = np.random.default_rng(2).standard_normal((1, 3000, 1)).astype(np.float32)
    p32 = np.asarray(rgrgr_posterior(params, sig, stride=5, return_log=True))
    with config.precision("bf16"):
        pbf = np.asarray(rgrgr_posterior(params, sig, stride=5, return_log=True))
    agree = float((p32.argmax(-1) == pbf.argmax(-1)).mean())
    assert agree >= 0.99, agree


def test_env_var_sets_mode(monkeypatch):
    """SCRAPPIE_TPU_PRECISION is applied at config import (subprocess
    entry points); set_precision accepts the same spellings."""
    config.set_precision("default")
    import jax
    assert config.get_precision() == jax.lax.Precision.DEFAULT
    assert not config.bf16_emulation()
    config.set_precision("bf16")
    assert config.get_precision() == jax.lax.Precision.DEFAULT
    assert config.bf16_emulation()
    config.set_precision("highest")
    assert config.get_precision() == jax.lax.Precision.HIGHEST

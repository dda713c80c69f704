"""Opt-in debug validation (SCRAPPIE_TPU_VALIDATE=1).

Analogue of the reference's debug-build layer validation
(validate_scrappie_matrix, ref src/scrappie_matrix.c:138-220, called
after every layer in src/layers.c): finiteness/bounds checks attach to
layer outputs when enabled, cost nothing when disabled, and a poisoned
read is skipped by the engine instead of failing the batch.
"""

import numpy as np
import pytest

from scrappie_tpu.utils.validate import (ValidationError, checked, enabled,
                                         set_enabled)


@pytest.fixture
def validation_on():
    set_enabled(True)
    yield
    set_enabled(None)


def test_disabled_is_identity():
    set_enabled(False)
    try:
        x = np.array([np.nan, 1.0])
        assert checked(x, "x") is x  # no check, no copy
    finally:
        set_enabled(None)


def test_env_var_controls(monkeypatch):
    set_enabled(None)
    monkeypatch.setenv("SCRAPPIE_TPU_VALIDATE", "1")
    assert enabled()
    monkeypatch.setenv("SCRAPPIE_TPU_VALIDATE", "0")
    assert not enabled()


def test_host_checks(validation_on):
    checked(np.ones(4), "ok", lo=0.0, hi=2.0)
    with pytest.raises(ValidationError, match="non-finite"):
        checked(np.array([1.0, np.inf]), "bad")
    with pytest.raises(ValidationError, match="min"):
        checked(np.array([-3.0, 0.0]), "bad", lo=-1.0)
    with pytest.raises(ValidationError, match="max"):
        checked(np.array([0.0, 3.0]), "bad", hi=1.0)


def test_jit_check_fires(validation_on):
    import jax
    import jax.numpy as jnp

    from scrappie_tpu.utils.validate import raise_pending

    @jax.jit
    def f(x):
        return checked(jnp.tanh(x), "tanh", lo=-1.0, hi=1.0) * 2

    np.testing.assert_allclose(np.asarray(f(jnp.ones(3))), 2 * np.tanh(1.0),
                               rtol=1e-6)
    raise_pending()  # clean so far
    jax.block_until_ready(f(jnp.array([jnp.nan, 1.0, 1.0])))
    with pytest.raises(ValidationError, match="tanh"):
        raise_pending()


def test_forward_validates_under_jit(validation_on):
    import jax

    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.utils.validate import raise_pending

    params = registry.load_params("rgrgr_r94")
    sig = np.random.default_rng(0).standard_normal((2, 500, 1)).astype(np.float32)
    lp = forward.rgrgr_posterior(params, sig, stride=5)
    assert np.isfinite(np.asarray(lp)).all()
    raise_pending()
    bad = sig.copy()
    bad[0, 100, 0] = np.nan
    # Eager call: the check is immediate
    with pytest.raises(ValidationError, match="non-finite"):
        forward.rgrgr_posterior(params, bad, stride=5)
    # Jitted call: the check runs as a callback, surfaced by raise_pending
    fwd = jax.jit(lambda p, s: forward.rgrgr_posterior(p, s, stride=5))
    jax.block_until_ready(fwd(params, bad))
    with pytest.raises(ValidationError, match="non-finite"):
        raise_pending()


def test_engine_skips_poisoned_read(validation_on):
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.types import RawSignal

    sim = SquiggleSimulator(seed=3)
    good, _, _ = sim.simulate_read(200)
    poisoned, _, _ = sim.simulate_read(200)
    poisoned = poisoned.copy()
    poisoned[50:60] = np.nan
    engine = BasecallEngine("rgrgr_r94", chunk_len=1500, overlap=300,
                            batch_size=2)
    results = engine.basecall_signals(
        [RawSignal(good, uuid="good"), RawSignal(poisoned, uuid="bad")],
        trim_start=0, trim_end=0, varseg_thresh=0.0)
    assert results[0].sequence  # good read basecalled
    assert results[1].sequence is None  # poisoned read skipped, not fatal

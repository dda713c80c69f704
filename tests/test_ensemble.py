"""Posterior-ensemble decoding (round 4).

BasecallEngine(ensemble=...) geometrically averages the per-block log
posteriors of grid-aligned transducer models before decoding (weighted
log-domain mean, renormalised per block) — measured +0.0075 identity
on the bundled reads' strictly-held-out tails (BASELINE.md "Posterior
ensembling").  These tests pin the combination maths to a manual
composition and the constructor's grid/mode validation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_ensemble_posterior_matches_manual_composition():
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.parallel.runner import BasecallEngine

    eng = BasecallEngine("rgrgr_r94", batch_size=8,
                         ensemble=("rgrgr_r941", "rgrgr_r10"),
                         ensemble_weights=(3.0, 1.0, 1.0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 200, 1)), jnp.float32)

    got = np.asarray(eng._posterior(eng.params, x))

    lps = []
    for m in ("rgrgr_r94", "rgrgr_r941", "rgrgr_r10"):
        spec = RAW_MODELS[m]
        params = {k: jnp.asarray(v)
                  for k, v in registry.load_params(m).items()}
        lps.append(np.asarray(forward.rgrgr_posterior(
            params, x, conv_activation=spec.conv_activation,
            stride=spec.stride, min_prob=1e-5, return_log=True)))
    w = np.array([3.0, 1.0, 1.0]); w /= w.sum()
    lp = sum(wi * l for wi, l in zip(w, lps))
    want = lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    np.testing.assert_allclose(got, want, atol=2e-5)
    # renormalised: rows are distributions again
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, atol=1e-4)


def test_ensemble_default_weights_favour_primary():
    from scrappie_tpu.parallel.runner import BasecallEngine

    eng3 = BasecallEngine("rgrgr_r94", batch_size=8,
                          ensemble=("rgrgr_r941", "rgrgr_r10"))
    eng_explicit = BasecallEngine("rgrgr_r94", batch_size=8,
                                  ensemble=("rgrgr_r941", "rgrgr_r10"),
                                  ensemble_weights=(3.0, 1.0, 1.0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 100, 1)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(eng3._posterior(eng3.params, x)),
        np.asarray(eng_explicit._posterior(eng_explicit.params, x)))


def test_api_ensemble_posterior_combination():
    """api.basecall_raw(ensemble=...) combines the same way the engine
    does and validates grid alignment."""
    from scrappie_tpu import api

    rng = np.random.default_rng(2)
    # squiggle-like step signal (plain noise trims/decodes to nothing)
    sig = (np.repeat(rng.normal(90.0, 15.0, 80), 40)
           + rng.standard_normal(3200) * 2.0).astype(np.float32)
    raw = api.RawTable(sig).trim().scale()
    lp1 = api.calc_post(raw, "rgrgr_r94", log=True).data()
    lp2 = api.calc_post(raw, "rgrgr_r10", log=True).data()
    lp = 0.75 * lp1 + 0.25 * lp2
    want = lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    seq, score, pos, *_ = api.basecall_raw(
        sig, ensemble=("rgrgr_r10",), ensemble_weights=(3.0, 1.0))
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.post.overlapper import overlapper

    wscore, wpath = decode_transducer(want, 0.0, 0.0, 2.0)
    want_seq = overlapper(wpath, 1024) or ""
    assert want_seq, "step signal should decode to some bases"
    assert (seq or "") == want_seq

    with pytest.raises(ValueError, match="grids must align"):
        api.basecall_raw(sig, ensemble=("raw_r94",))


def test_streaming_ensemble_matches_solo_and_engine_posterior():
    """Streaming with ensemble: the batcher equals a solo ensembled
    stream, the shared program equals the engine's combined posterior,
    and the ensemble actually changes the call (sanity)."""
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.parallel.streaming import (StreamingBasecaller,
                                                 StreamingBatcher)
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sig, _, _ = SquiggleSimulator(seed=9).simulate_read(900)
    sig = np.asarray(sig, np.float32)
    ens = ("rgrgr_r941", "rgrgr_r10")

    solo = StreamingBasecaller("rgrgr_r94", 2000, 400, ensemble=ens,
                               trim_start=0)
    for i in range(0, len(sig), 1500):
        solo.feed(sig[i : i + 1500])
    solo.flush()

    bat = StreamingBatcher("rgrgr_r94", 2000, 400, batch_size=2,
                           ensemble=ens, trim_start=0)
    bat.add_stream("a")
    got = bat.feed("a", sig) + bat.flush("a")
    assert got == solo.sequence and got

    plain = StreamingBasecaller("rgrgr_r94", 2000, 400, trim_start=0)
    plain.feed(sig)
    plain.flush()
    assert plain.sequence != solo.sequence  # the ensemble is live

    eng = BasecallEngine("rgrgr_r94", batch_size=2, ensemble=ens)
    x = jnp.asarray(sig[:2000], jnp.float32)[None, :, None]
    np.testing.assert_allclose(
        np.asarray(bat._posterior(bat._params, x)),
        np.asarray(eng._posterior(eng.params, x)), atol=2e-5)

    with pytest.raises(ValueError, match="block grids must align"):
        StreamingBasecaller("rgrgr_r94", 2000, 400, ensemble=("raw_r94",))


def test_fused_ensemble_kernel_matches_composed_decode():
    """viterbi_fused_ens_tm == (combine member posteriors, then
    viterbi_scores_tm): the in-VMEM combination is the same program."""
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.ops.pipeline import ensemble_basecall_fused
    from scrappie_tpu.ops.viterbi import (viterbi_backtrace_tm,
                                          viterbi_scores_tm)

    models = ("rgrgr_r94", "rgrgr_r941", "rgrgr_r10")
    w = np.array([3.0, 1.0, 1.0]); w /= w.sum()
    rng = np.random.default_rng(3)
    sig = jnp.asarray(rng.standard_normal((2, 400, 1)), jnp.float32)

    lps = []
    ps = []
    for m in models:
        spec = RAW_MODELS[m]
        params = {k: jnp.asarray(v)
                  for k, v in registry.load_params(m).items()}
        ps.append(params)
        lps.append(np.asarray(forward.rgrgr_posterior(
            params, sig, conv_activation=spec.conv_activation,
            stride=spec.stride, min_prob=1e-5, return_log=True)))
    lp = sum(wi * l for wi, l in zip(w, lps))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    final, tb = viterbi_scores_tm(jnp.moveaxis(jnp.asarray(lp), 0, 1),
                                  0.3, 0.2, 2.0)
    want_score, want_path = viterbi_backtrace_tm(final, tb)

    acts = tuple(RAW_MODELS[m].conv_activation for m in models)
    got_score, got_path = ensemble_basecall_fused(
        ps, w, sig, kinds=("rgrgr",) * 3, conv_activations=acts,
        stride=5, stay_pen=0.3, skip_pen=0.2)
    np.testing.assert_array_equal(np.asarray(got_path), np.asarray(want_path))
    np.testing.assert_allclose(np.asarray(got_score), np.asarray(want_score),
                               atol=2e-4)


def test_fast_ensemble_engine_matches_stitch():
    """Engine fast mode with an ensemble == stitch mode with the same
    ensemble (single-chunk reads: identical combined posterior, same
    Viterbi), including calibrated FASTQ qualities."""
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.types import RawSignal

    sim = SquiggleSimulator(seed=13)
    signals = [RawSignal(np.asarray(sim.simulate_read(350)[0], np.float32),
                         uuid=f"r{i}") for i in range(3)]
    kw = dict(batch_size=4, chunk_len=4000, overlap=500,
              ensemble=("rgrgr_r941", "rgrgr_r10"),
              qual_calibration="real")
    stitch = BasecallEngine("rgrgr_r94", mode="stitch", **kw)
    fast = BasecallEngine("rgrgr_r94", mode="fast", **kw)
    rs = stitch.basecall_signals(signals, trim_start=0, trim_end=0,
                                 varseg_thresh=0.0, with_qualities=True)
    rf = fast.basecall_signals(signals, trim_start=0, trim_end=0,
                               varseg_thresh=0.0, with_qualities=True)
    assert any(r.sequence for r in rs)
    for a, b in zip(rs, rf):
        assert a.sequence == b.sequence
        assert a.qual == b.qual


def test_rnnrf_self_ensemble_matches_solo():
    """CRF ensembling: a self-ensemble (rnnrf_r94 + rnnrf_r94) is the
    identity combination — transitions equal the solo model's (weights
    normalise to 1) and both modes decode the same call."""
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.types import RawSignal

    eng = BasecallEngine("rnnrf_r94", batch_size=4,
                         ensemble=("rnnrf_r94",),
                         ensemble_weights=(1.0, 1.0))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 200, 1)), jnp.float32)
    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("rnnrf_r94").items()}
    want = np.asarray(forward.rnnrf_transitions(params, x, stride=2))
    got = np.asarray(eng._posterior(eng.params, x))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # transitions are NOT per-block distributions; no renorm applied
    assert not np.allclose(np.exp(got).sum(-1), 1.0, atol=0.1)

    sim = SquiggleSimulator(seed=21)
    sig = RawSignal(np.asarray(sim.simulate_read(300)[0], np.float32),
                    uuid="c")
    solo = BasecallEngine("rnnrf_r94", batch_size=4)
    r_solo = solo.basecall_signals([sig], trim_start=0, trim_end=0,
                                   varseg_thresh=0.0)[0]
    r_ens = eng.basecall_signals([sig], trim_start=0, trim_end=0,
                                 varseg_thresh=0.0)[0]
    assert r_solo.sequence and r_ens.sequence == r_solo.sequence
    fast = BasecallEngine("rnnrf_r94", batch_size=4, mode="fast",
                          ensemble=("rnnrf_r94",),
                          ensemble_weights=(1.0, 1.0))
    r_fast = fast.basecall_signals([sig], trim_start=0, trim_end=0,
                                   varseg_thresh=0.0)[0]
    assert r_fast.sequence == r_solo.sequence


def test_ensemble_rejects_bad_configs():
    from scrappie_tpu.parallel.runner import BasecallEngine

    with pytest.raises(ValueError, match="block grids must align"):
        BasecallEngine("rgrgr_r94", ensemble=("raw_r94",))  # stride 4 vs 5
    # families never mix: CRF transitions and transducer posteriors
    # live on different state spaces
    with pytest.raises(ValueError, match="family"):
        BasecallEngine("rnnrf_r94", ensemble=("rgrgr_r10",))
    with pytest.raises(ValueError, match="family"):
        BasecallEngine("rgrgr_r94", ensemble=("rnnrf_r94",))
    with pytest.raises(ValueError, match="one weight per model"):
        BasecallEngine("rgrgr_r94", ensemble=("rgrgr_r10",),
                       ensemble_weights=(1.0,))
    # round-4 review findings: weights must be positive/finite, and an
    # unknown member gets a ValueError naming the known models
    with pytest.raises(ValueError, match="positive and finite"):
        BasecallEngine("rgrgr_r94", ensemble=("rgrgr_r10",),
                       ensemble_weights=(1.0, -1.0))
    with pytest.raises(ValueError, match="positive and finite"):
        BasecallEngine("rgrgr_r94", ensemble=("rgrgr_r10",),
                       ensemble_weights=(0.0, 0.0))
    with pytest.raises(ValueError, match="known models"):
        BasecallEngine("rgrgr_r94", ensemble=("rgrgr_r94x",))


def test_ensemble_qual_recal_uses_config_fit():
    """qual_calibration='real' with the shipped ensemble uses the
    ensemble configuration's own measured fit; unfitted combos fall
    back to the primary's (with a warning)."""
    from scrappie_tpu.parallel.runner import BasecallEngine

    eng = BasecallEngine("rgrgr_r94", batch_size=8,
                         ensemble=("rgrgr_r941", "rgrgr_r10"),
                         qual_calibration="real")
    assert eng._qual_recal_key == "rgrgr_r94+rgrgr_r10+rgrgr_r941"
    # member order doesn't change the posterior: same (sorted) key
    eng_r = BasecallEngine("rgrgr_r94", batch_size=8,
                           ensemble=("rgrgr_r10", "rgrgr_r941"),
                           qual_calibration="real")
    assert eng_r._qual_recal_key == eng._qual_recal_key
    # custom weights change the posterior: the 3:1:1 fit doesn't apply
    eng_w = BasecallEngine("rgrgr_r94", batch_size=8,
                           ensemble=("rgrgr_r941", "rgrgr_r10"),
                           ensemble_weights=(1.0, 5.0, 5.0),
                           qual_calibration="real")
    assert eng_w._qual_recal_key == "rgrgr_r94"  # fallback + warning
    eng2 = BasecallEngine("rgrgr_r94", batch_size=8,
                          ensemble=("rgrgr_r941",),
                          qual_calibration="real")
    assert eng2._qual_recal_key == "rgrgr_r94"  # fallback
    eng3 = BasecallEngine("rgrgr_r94", batch_size=8,
                          qual_calibration="real")
    assert eng3._qual_recal_key == "rgrgr_r94"


def test_fused_config_contract():
    """models/ensemble.fused_config: the ONE derivation of the fused
    multi-model pipeline's static arguments (engine fast mode and the
    streaming batcher share it)."""
    from scrappie_tpu.models.ensemble import fused_config

    w, kinds, acts = fused_config("rgrgr_r94", ("rgrgr_r941", "rgrgr_r10"))
    np.testing.assert_allclose(w, [0.6, 0.2, 0.2])
    assert kinds == ("rgrgr", "rgrgr", "rgrgr")
    assert len(acts) == 3
    # no ensemble -> None; CRF family combines pre-decode -> None
    assert fused_config("rgrgr_r94", ()) is None
    assert fused_config("rnnrf_r94", ("rnnrf_r94",)) is None
    # invalid configs still raise through validate_ensemble
    with pytest.raises(ValueError, match="grids must align"):
        fused_config("rgrgr_r94", ("raw_r94",))

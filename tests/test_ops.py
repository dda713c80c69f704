"""Pallas kernels vs the lax.scan reference programs.

On CPU the kernels run in interpreter mode (ops.interpret_mode()), so
shapes are tiny; the same code path compiles with Mosaic on TPU.
Equivalence-testing an accelerated kernel against a scalar/pure
reference mirrors the reference's own strategy (SSE decode vs
sloika_viterbi, src/test/test_scrappie_decoding.c:33-54).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scrappie_tpu import ops
from scrappie_tpu.decode.transducer import (
    viterbi_local_backtrace,
    viterbi_transducer_scores,
)
from scrappie_tpu.nn.layers import feedforward
from scrappie_tpu.nn.rnn import gru
from scrappie_tpu.ops.gru import gru_layer_tm
from scrappie_tpu.ops.viterbi import (
    viterbi_backtrace_tm,
    viterbi_scores_tm,
)


@pytest.fixture(autouse=True)
def _force_pallas_off_for_reference():
    # The lax.scan reference paths must not themselves dispatch to Pallas.
    with ops.pallas(False):
        yield


def _rand_logpost(B, T, nstate, seed=0):
    rng = np.random.default_rng(seed)
    lp = rng.standard_normal((B, T, nstate)).astype(np.float32)
    return jnp.asarray(lp - 3.0)


@pytest.mark.parametrize("use_slip", [False, True])
def test_viterbi_forward_matches_scan(use_slip):
    B, T, nstate = 5, 12, 65  # nhist = 64: divisible by 64 for slip
    lp = _rand_logpost(B, T, nstate)
    final_ref, tb_ref = viterbi_transducer_scores(lp, 0.3, 0.7, 2.0, use_slip)
    final, tb = viterbi_scores_tm(jnp.moveaxis(lp, 1, 0), 0.3, 0.7, 2.0,
                                  use_slip, interpret=True)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.moveaxis(np.asarray(tb), 0, 1),
                                  np.asarray(tb_ref))


def test_viterbi_backtrace_matches_scan():
    B, T, nstate = 4, 16, 65
    lp = _rand_logpost(B, T, nstate, seed=1)
    final, tb_bm = viterbi_transducer_scores(lp, 0.0, 0.0, 2.0, False)
    score_ref, path_ref = viterbi_local_backtrace(final, tb_bm)
    tb_tm = jnp.moveaxis(tb_bm, 1, 0)
    score, path = viterbi_backtrace_tm(final, tb_tm, interpret=True)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))


def test_viterbi_batch_padding():
    # B not a multiple of 8 exercises the pad/slice wrapper.
    B, T, nstate = 3, 9, 17
    lp = _rand_logpost(B, T, nstate, seed=2)
    final_ref, tb_ref = viterbi_transducer_scores(lp, 0.0, 0.5, 1.5, False)
    final, tb = viterbi_scores_tm(jnp.moveaxis(lp, 1, 0), 0.0, 0.5, 1.5,
                                  False, interpret=True)
    assert final.shape == (B, nstate + 1)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_ref),
                               rtol=1e-6, atol=1e-6)
    score_ref, path_ref = viterbi_local_backtrace(final_ref, tb_ref)
    score, path = viterbi_backtrace_tm(final, tb, interpret=True)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_layer_matches_scan(reverse):
    rng = np.random.default_rng(3)
    B, T, C, S = 8, 7, 12, 96
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    iW = jnp.asarray(0.3 * rng.standard_normal((C, 3 * S)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((3 * S,)).astype(np.float32))
    sW = jnp.asarray(0.3 * rng.standard_normal((S, 2 * S)).astype(np.float32))
    sW2 = jnp.asarray(0.3 * rng.standard_normal((S, S)).astype(np.float32))

    href = gru(feedforward(x, iW, b), sW, sW2, reverse=reverse)
    h = gru_layer_tm(jnp.moveaxis(x, 1, 0), iW, b, sW, sW2, reverse=reverse)
    assert h.shape == (T, B, 128)
    np.testing.assert_allclose(np.moveaxis(np.asarray(h[..., :S]), 0, 1),
                               np.asarray(href), rtol=1e-5, atol=1e-5)
    # pad lanes must be exactly zero (layer chaining relies on it)
    assert np.all(np.asarray(h[..., S:]) == 0.0)


def test_rgrgr_posterior_tm_matches_batchmajor():
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("rgrgr_r94").items()}
    rng = np.random.default_rng(4)
    sig = jnp.asarray(rng.standard_normal((2, 60, 1)).astype(np.float32))
    ref = forward.rgrgr_posterior(params, sig, conv_activation=spec.conv_activation,
                                  stride=spec.stride)
    tm = forward.rgrgr_posterior_tm(params, sig,
                                    conv_activation=spec.conv_activation,
                                    stride=spec.stride)
    np.testing.assert_allclose(np.moveaxis(np.asarray(tm), 0, 1),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rnnrf_transitions_tm_matches_batchmajor():
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS

    spec = RAW_MODELS["rnnrf_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("rnnrf_r94").items()}
    rng = np.random.default_rng(7)
    # B=2 exercises the batch pad-to-8 slice; T=60 gives 30 blocks (stride 2)
    sig = jnp.asarray(rng.standard_normal((2, 60, 1)).astype(np.float32))
    with ops.pallas(False):
        ref = forward.rnnrf_transitions(params, sig,
                                        conv_activation=spec.conv_activation,
                                        stride=spec.stride)
    tm = forward.rnnrf_transitions_tm(params, sig,
                                      conv_activation=spec.conv_activation,
                                      stride=spec.stride)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pens", [dict(),
                                  dict(stay_pen=0.3, skip_pen=0.6,
                                       local_pen=3.0, use_slip=True)])
def test_fused_pipeline_matches_two_stage(pens):
    from scrappie_tpu.decode.transducer import (
        viterbi_local_backtrace,
        viterbi_transducer_scores,
    )
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.ops.pipeline import rgrgr_basecall_fused

    spec = RAW_MODELS["rgrgr_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("rgrgr_r94").items()}
    rng = np.random.default_rng(7)
    sig = jnp.asarray(rng.standard_normal((2, 60, 1)).astype(np.float32))
    lp = forward.rgrgr_posterior(params, sig, conv_activation=spec.conv_activation,
                                 stride=spec.stride)
    final, tb = viterbi_transducer_scores(
        lp, pens.get("stay_pen", 0.0), pens.get("skip_pen", 0.0),
        pens.get("local_pen", 2.0), pens.get("use_slip", False))
    score_ref, path_ref = viterbi_local_backtrace(final, tb)
    score, path = rgrgr_basecall_fused(params, sig,
                                       conv_activation=spec.conv_activation,
                                       stride=spec.stride, **pens)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("pens", [dict(),
                                  dict(stay_pen=0.4, skip_pen=0.7,
                                       local_pen=3.0)])
def test_raw_fused_pipeline_matches_two_stage(pens):
    """raw_r94 (biGRU) fast path == posterior + decode (round 3)."""
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.ops.pipeline import raw_basecall_fused

    spec = RAW_MODELS["raw_r94"]
    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("raw_r94").items()}
    rng = np.random.default_rng(17)
    sig = jnp.asarray(rng.standard_normal((2, 48, 1)).astype(np.float32))
    lp = forward.raw_posterior(params, sig, stride=spec.stride)
    final, tb = viterbi_transducer_scores(
        lp, pens.get("stay_pen", 0.0), pens.get("skip_pen", 0.0),
        pens.get("local_pen", 2.0), False)
    score_ref, path_ref = viterbi_local_backtrace(final, tb)
    score, path = raw_basecall_fused(params, sig, stride=spec.stride, **pens)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 7), (3, 16), (2, 33), (8, 5)])
def test_crf_kernel_matches_scan(shape):
    """Pallas CRF Viterbi kernel == lax.scan reference: identical paths
    (including tie-breaks) and scores (round 3; ref decode_crf
    src/decode.c:836-894)."""
    from scrappie_tpu.decode.crf import _crf_viterbi
    from scrappie_tpu.ops.crf import crf_viterbi_kernel

    B, T = shape
    rng = np.random.default_rng(31)
    trans = rng.standard_normal((B, T, 25)).astype(np.float32) * 2.0
    # inject exact ties to exercise first-max semantics
    trans[:, T // 2, :10] = 0.5
    s_ref, p_ref = _crf_viterbi(jnp.asarray(trans))
    s_k, p_k = crf_viterbi_kernel(jnp.asarray(trans))
    np.testing.assert_array_equal(np.asarray(p_k), np.asarray(p_ref))
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("emit_bias", [0.0, -1.0])
def test_rnnrf_fused_pipeline_matches_two_stage(emit_bias):
    """rnnrf fast path == transitions + CRF Viterbi (round 3)."""
    from scrappie_tpu.decode.crf import decode_crf
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.ops.pipeline import rnnrf_basecall_fused

    spec = RAW_MODELS["rnnrf_r94"]
    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("rnnrf_r94").items()}
    rng = np.random.default_rng(18)
    sig = jnp.asarray(rng.standard_normal((2, 40, 1)).astype(np.float32))
    trans = forward.rnnrf_transitions(params, sig,
                                      conv_activation=spec.conv_activation,
                                      stride=spec.stride)
    score_ref, path_ref = decode_crf(np.asarray(trans), impl="scan",
                                     emit_bias=emit_bias)
    score, path = rnnrf_basecall_fused(params, sig,
                                       conv_activation=spec.conv_activation,
                                       stride=spec.stride,
                                       emit_bias=emit_bias)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-5, atol=1e-4)


def test_raw_posterior_tm_matches_batchmajor():
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.models.specs import RAW_MODELS

    spec = RAW_MODELS["raw_r94"]
    params = {k: jnp.asarray(v) for k, v in registry.load_params("raw_r94").items()}
    rng = np.random.default_rng(8)
    sig = jnp.asarray(rng.standard_normal((2, 48, 1)).astype(np.float32))
    ref = forward.raw_posterior(params, sig, stride=spec.stride)
    tm = forward.raw_posterior_tm(params, sig, stride=spec.stride)
    np.testing.assert_allclose(np.moveaxis(np.asarray(tm), 0, 1),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_events_posterior_tm_matches_batchmajor():
    from scrappie_tpu.models import forward, registry

    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("nanonet_events").items()}
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((2, 11, 4)).astype(np.float32))
    ref = forward.events_posterior(params, feats)
    tm = forward.events_posterior_tm(params, feats)
    np.testing.assert_allclose(np.moveaxis(np.asarray(tm), 0, 1),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("viterbi,prob_back", [(True, 0.1), (False, 0.1),
                                               (True, 0.0)])
def test_dtw_kernel_matches_scan(viterbi, prob_back):
    from scrappie_tpu.decode.dtw import _penalties, _squiggle_match
    from scrappie_tpu.ops.dtw import squiggle_match_tm

    rng = np.random.default_rng(12)
    npos, T = 20, 37
    params = np.stack([
        rng.standard_normal(npos).astype(np.float32),
        (-0.5 + 0.1 * rng.standard_normal(npos)).astype(np.float32),
        (0.2 * rng.standard_normal(npos)).astype(np.float32),
    ], axis=1)
    sig = rng.standard_normal(T).astype(np.float32)
    with np.errstate(divide="ignore"):
        move_pen, stay_pen = _penalties(params, 1.0, prob_back)
    args = (jnp.asarray(sig), jnp.asarray(params[:, 0]),
            jnp.exp(jnp.asarray(params[:, 1])), jnp.asarray(params[:, 1]),
            jnp.asarray(move_pen), jnp.asarray(stay_pen),
            prob_back, 2.0, 0.5, 5.0)
    final_ref, tb_ref = _squiggle_match(*args, viterbi)
    final, tb = squiggle_match_tm(*args, viterbi=viterbi, interpret=True)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_ref),
                               rtol=1e-5, atol=1e-4)
    if viterbi:
        np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb_ref))


def test_dtw_dispatch_full_viterbi():
    from scrappie_tpu import ops
    from scrappie_tpu.decode.dtw import squiggle_match_viterbi

    rng = np.random.default_rng(13)
    npos, T = 15, 40
    params = np.stack([
        rng.standard_normal(npos).astype(np.float32),
        (-0.5 + 0.1 * rng.standard_normal(npos)).astype(np.float32),
        (0.2 * rng.standard_normal(npos)).astype(np.float32),
    ], axis=1)
    sig = rng.standard_normal(T).astype(np.float32)
    with ops.pallas(False):
        s_ref, p_ref = squiggle_match_viterbi(sig, params, prob_back=0.1)
    with ops.pallas(True):
        s, p = squiggle_match_viterbi(sig, params, prob_back=0.1)
    assert abs(s - s_ref) < 1e-3
    np.testing.assert_array_equal(p, p_ref)


def test_crf_associative_scan_matches_sequential():
    from scrappie_tpu.decode.crf import decode_crf, posterior_crf

    rng = np.random.default_rng(11)
    trans = rng.standard_normal((3, 40, 25)).astype(np.float32)
    s_ref, p_ref = decode_crf(trans, impl="scan")
    s, p = decode_crf(trans, impl="assoc")
    np.testing.assert_allclose(s, s_ref, rtol=1e-5)
    np.testing.assert_array_equal(p, p_ref)
    post_ref = posterior_crf(trans, impl="scan")
    post = posterior_crf(trans, impl="assoc")
    np.testing.assert_allclose(post, post_ref, rtol=1e-4, atol=1e-6)


def test_decode_transducer_dispatch_pallas():
    # Force the Pallas dispatch path end-to-end (interpret on CPU).
    from scrappie_tpu.decode.transducer import decode_transducer

    lp = _rand_logpost(2, 10, 17, seed=5)
    with ops.pallas(False):
        score_ref, path_ref = decode_transducer(lp, 0.0, 0.0, 2.0)
    with ops.pallas(True):
        score, path = decode_transducer(lp, 0.0, 0.0, 2.0)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))


@pytest.mark.parametrize("viterbi", [True, False])
def test_seqmap_kernel_matches_scan(viterbi):
    from scrappie_tpu.decode.mapping import _map_dense
    from scrappie_tpu.ops.seqmap import map_to_sequence_tm

    rng = np.random.default_rng(14)
    T, nst, seqlen = 21, 17, 9
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(nst), T)).astype(np.float32))
    seqstates = jnp.asarray(rng.integers(0, nst - 1, seqlen), jnp.int32)
    final_ref, tb_ref = _map_dense(lp, seqstates, 0.2, 0.7, 4.0, viterbi, True)
    final, tb = map_to_sequence_tm(lp, seqstates, 0.2, 0.7, 4.0,
                                   viterbi=viterbi, interpret=True)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_ref),
                               rtol=1e-5, atol=1e-4)
    if viterbi:
        np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb_ref))


def test_seqmap_dispatch_full():
    from scrappie_tpu import ops
    from scrappie_tpu.decode.mapping import map_to_sequence_viterbi

    rng = np.random.default_rng(15)
    T, nst, seqlen = 30, 17, 12
    lp = np.log(rng.dirichlet(np.ones(nst), T)).astype(np.float32)
    seq = rng.integers(0, nst - 1, seqlen).astype(np.int32)
    with ops.pallas(False):
        s_ref, p_ref = map_to_sequence_viterbi(lp, seq, want_path=True)
    with ops.pallas(True):
        s, p = map_to_sequence_viterbi(lp, seq, want_path=True)
    assert abs(s - s_ref) < 1e-3
    np.testing.assert_array_equal(p, p_ref)


@pytest.mark.slow
def test_viterbi_kernel_shape_fuzz():
    """Randomised (B, T, nstate) sweep: the kernels' padding/grid-edge
    arithmetic must hold across the whole shape envelope, not just the
    hand-picked sizes above (interpret mode on CPU; Mosaic on TPU hits
    the same code paths via scripts/tpu_validate.py)."""
    rng = np.random.default_rng(7)
    for trial in range(6):
        nhist = int(rng.choice([16, 64, 256]))
        B = int(rng.integers(1, 9))
        T = int(rng.integers(2, 25))
        use_slip = bool(rng.integers(0, 2)) and nhist >= 64
        lp = _rand_logpost(B, T, nhist + 1, seed=100 + trial)
        pens = (float(rng.uniform(-1, 1)), float(rng.uniform(0, 2)),
                float(rng.uniform(0.5, 4)))
        ref_final, ref_tb = viterbi_transducer_scores(lp, *pens, use_slip)
        k_final, k_tb = viterbi_scores_tm(jnp.moveaxis(lp, 1, 0), *pens,
                                          use_slip, interpret=True)
        k_path = viterbi_backtrace_tm(k_final, k_tb, interpret=True)[1]
        ref_path = viterbi_local_backtrace(ref_final, ref_tb)[1]
        np.testing.assert_allclose(np.asarray(k_final), np.asarray(ref_final),
                                   rtol=1e-6, atol=1e-6)
        assert np.array_equal(np.asarray(k_path), np.asarray(ref_path)), (
            trial, B, T, nhist, use_slip)


@pytest.mark.slow
def test_gru_kernel_shape_fuzz():
    """Randomised (B, T, C, S, reverse) sweep of the GRU kernel vs the
    scan reference — guards the padding/edge arithmetic across the
    shape envelope (S <= 128 lane width; C arbitrary)."""
    rng = np.random.default_rng(11)
    for trial in range(5):
        B = int(rng.choice([8, 16]))  # kernel contract: B % 8 == 0
        T = int(rng.integers(2, 16))
        C = int(rng.integers(1, 20))
        S = int(rng.choice([16, 48, 96, 128]))
        reverse = bool(rng.integers(0, 2))
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        iW = jnp.asarray(0.3 * rng.standard_normal((C, 3 * S)).astype(np.float32))
        b = jnp.asarray(0.1 * rng.standard_normal((3 * S,)).astype(np.float32))
        sW = jnp.asarray(0.3 * rng.standard_normal((S, 2 * S)).astype(np.float32))
        sW2 = jnp.asarray(0.3 * rng.standard_normal((S, S)).astype(np.float32))
        href = gru(feedforward(x, iW, b), sW, sW2, reverse=reverse)
        h = gru_layer_tm(jnp.moveaxis(x, 1, 0), iW, b, sW, sW2,
                         reverse=reverse)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(h[..., :S]), 0, 1), np.asarray(href),
            rtol=2e-5, atol=2e-5, err_msg=str((trial, B, T, C, S, reverse)))
        assert np.all(np.asarray(h[..., S:]) == 0.0)


@pytest.mark.parametrize("pens", [dict(),
                                  dict(stay_pen=0.4, skip_pen=0.7,
                                       local_pen=3.0)])
def test_events_fused_pipeline_matches_two_stage(pens):
    """nanonet events fast path == posterior + decode (round 4): the
    biLSTM fused kernels + fused head/Viterbi reproduce
    events_posterior -> viterbi exactly (same guarantee as raw/rgrgr)."""
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.ops.pipeline import events_basecall_fused

    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("nanonet_events").items()}
    rng = np.random.default_rng(23)
    feats = jnp.asarray(rng.standard_normal((2, 50, 4)).astype(np.float32))
    lp = forward.events_posterior(params, feats)
    final, tb = viterbi_transducer_scores(
        lp, pens.get("stay_pen", 0.0), pens.get("skip_pen", 0.0),
        pens.get("local_pen", 2.0), False)
    score_ref, path_ref = viterbi_local_backtrace(final, tb)
    score, path = events_basecall_fused(params, feats, **pens)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_ref))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-5, atol=1e-4)


def test_fast_expand_close_to_exact():
    """EXPERIMENTAL fast-expand (2-chunk 16-bit Viterbi lane expansion,
    SCRAPPIE_TPU_FAST_EXPAND): scores within ~1e-4 and paths mostly
    identical to the exact 3-chunk expansion.  This mode deliberately
    gives up the bit-exact parity guarantee; the test pins the plumbing
    and the error scale, not equality.

    The posterior must have a coherent hot path: on uniform-random
    posteriors with local_pen=2 the Viterbi winner is the local
    start/end chain, which never touches an expansion, and any
    expansion perturbation is invisible (measured round 4)."""
    from scrappie_tpu.ops.viterbi import viterbi_backtrace_tm, viterbi_scores_tm

    rng = np.random.default_rng(41)
    T, B = 40, 2
    lp = np.log(rng.dirichlet(np.ones(1025), size=(T, B)) + 1e-8)
    # random-walk hot path: each block strongly prefers a step successor
    state = rng.integers(0, 1024, size=B)
    for t in range(T):
        state = (state * 4 + rng.integers(0, 4, size=B)) % 1024
        lp[t, np.arange(B), state] += 8.0
    lp = jnp.asarray(lp.astype(np.float32))
    # renormalise is unnecessary: Viterbi compares sums, not probabilities
    outs = {}
    for fast in (False, True):
        final, tb = viterbi_scores_tm(lp, 0.1, 0.4, 2.0, False,
                                      fast_expand=fast)
        outs[fast] = viterbi_backtrace_tm(final, tb)
    s_exact, p_exact = outs[False]
    s_fast, p_fast = outs[True]
    # the hot path makes step moves win, so the dropped 8-bit chunk is
    # IN the winning scores: assert they differ (plumbing proof) but
    # only at the expected scale, with paths essentially unchanged
    np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_exact),
                               rtol=1e-4, atol=1e-3)
    assert not np.array_equal(np.asarray(s_fast), np.asarray(s_exact)), \
        "fast-expand produced bit-identical scores on a step-dominated " \
        "path — the flag is not reaching the kernel"
    mism = (np.asarray(p_fast) != np.asarray(p_exact)).mean()
    assert mism < 0.05, f"fast-expand path divergence {mism:.3f}"


def test_viterbi_fused_ens_fuzz():
    """viterbi_fused_ens_tm == (combine member posteriors in XLA, then
    viterbi_scores_tm) over random shapes, member counts, weights, and
    penalty settings — including members with NARROWER hidden widths
    (their h lanes and W rows zero-pad to the common Sp, the path the
    production rgrgr trio never exercises)."""
    from scrappie_tpu.ops.viterbi import viterbi_fused_ens_tm

    nstate = 65  # nhist = 64, divisible by 16 (and 64, for the slip case)
    for seed, (K, B, T, ct, widths, pens, slip) in enumerate([
            (2, 3, 8, 1, (128, 128), (0.0, 0.0), False),
            (3, 5, 12, 4, (128, 64, 96), (0.4, 0.6), False),
            (2, 2, 9, 3, (64, 128), (1.0, 0.0), False),
            (2, 3, 8, 2, (128, 128), (0.2, 0.3), True),
    ]):
        rng = np.random.default_rng(100 + seed)
        Sp = max(widths)
        w = rng.uniform(0.5, 2.0, K)
        w = (w / w.sum()).astype(np.float32)
        hs, Ws, bs, lps = [], [], [], []
        for k, wk in enumerate(widths):
            h = np.zeros((T, B, Sp), np.float32)
            h[:, :, :wk] = rng.standard_normal((T, B, wk)).astype(np.float32)
            W = np.zeros((Sp, nstate), np.float32)
            W[:wk] = (rng.standard_normal((wk, nstate)) / 4).astype(np.float32)
            b = rng.standard_normal(nstate).astype(np.float32)
            hs.append(h); Ws.append(W); bs.append(b)
            y = h @ W + b
            p = np.exp(y - y.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            lps.append(np.log(1e-5 / nstate + (1 - 1e-5) * p))
        lp = sum(wk * l for wk, l in zip(w, lps))
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        final_ref, tb_ref = viterbi_scores_tm(
            jnp.asarray(lp, jnp.float32), pens[0], pens[1], 2.0,
            use_slip=slip, interpret=True)
        want_score, want_path = viterbi_backtrace_tm(final_ref, tb_ref,
                                                     interpret=True)

        final, tb = viterbi_fused_ens_tm(
            jnp.asarray(np.stack(hs)), jnp.asarray(np.stack(Ws)),
            jnp.asarray(np.stack(bs)), jnp.asarray(w), min_prob=1e-5,
            stay_pen=pens[0], skip_pen=pens[1], use_slip=slip, ct=ct,
            interpret=True)
        got_score, got_path = viterbi_backtrace_tm(final, tb,
                                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(got_path),
                                      np.asarray(want_path))
        np.testing.assert_allclose(np.asarray(got_score),
                                   np.asarray(want_score),
                                   rtol=2e-5, atol=2e-5)

"""Real-read decode calibration presets (scrappie_tpu/models/calibration.py).

The presets encode the stay/skip (and CRF emit-bias) optima measured on
the bundled real reads (BASELINE.md "Decode calibration").  Checks: the
preset tables are exposed per model, explicit user knobs always win,
and all three consumers (CLI kwargs dict, api.basecall_raw, serve
submit) resolve a ``calibration="real"`` request to the same knobs.
"""

import numpy as np
import pytest

from scrappie_tpu.models import calibration


def test_preset_reference_is_empty():
    for model in ("rgrgr_r94", "rnnrf_r94", "events"):
        assert calibration.preset(model) == {}
        assert calibration.preset(model, "reference") == {}


def test_preset_real_per_model():
    assert calibration.preset("rgrgr_r94", "real") == {
        "stay_pen": 0.5, "skip_pen": 0.5}
    assert calibration.preset("raw_r94", "real") == {
        "stay_pen": 1.0, "skip_pen": 0.0}
    assert calibration.preset("rgrgr_r941", "real") == {
        "stay_pen": 1.0, "skip_pen": 0.0}
    # skip=0 robustness point, not the raw grid optimum (see module doc)
    assert calibration.preset("rgrgr_r10", "real") == {
        "stay_pen": 1.0, "skip_pen": 0.0}
    # the CRF model's knob is the emit bias, not stay/skip; the round-4
    # whole-region-trained weights measured best at the reference
    # default 0.0 (BASELINE.md), so the preset is empty
    assert calibration.preset("rnnrf_r94", "real") == {}
    assert calibration.preset("nanonet_events", "real") == {
        "stay_pen": 1.0, "skip_pen": 0.0}
    # unknown model -> no preset
    assert calibration.preset("events", "real") == {}


def test_preset_unknown_name_raises():
    with pytest.raises(ValueError, match="unknown calibration"):
        calibration.preset("rgrgr_r94", "bogus")


def test_apply_fills_only_reference_defaults():
    kwargs = {"stay_pen": 0.0, "skip_pen": 2.5, "local_pen": 2.0}
    out = calibration.apply("rgrgr_r94", "real", kwargs)
    assert out is kwargs  # mutates in place
    assert kwargs["stay_pen"] == 0.5      # was at the reference default
    assert kwargs["skip_pen"] == 2.5      # explicit value wins
    assert kwargs["local_pen"] == 2.0     # untouched knob


def test_apply_reference_is_identity():
    kwargs = {"stay_pen": 0.0, "skip_pen": 0.0}
    assert calibration.apply("rgrgr_r94", "reference", dict(kwargs)) == kwargs


def test_cli_parser_accepts_calibration():
    from scrappie_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["raw", "--calibration", "real", "--model", "raw_r94", "x.fast5"])
    assert args.calibration == "real"
    # default stays reference semantics
    args = build_parser().parse_args(["raw", "x.fast5"])
    assert args.calibration == "reference"


def test_api_basecall_raw_expands_preset(monkeypatch):
    """basecall_raw(calibration="real") forwards the preset to the
    decoder (with the CRF knob renamed to the decoder's emit_bias)."""
    from scrappie_tpu import api

    seen = {}

    def fake_decode_post(post, model="rgrgr_r94", **kwargs):
        seen[model] = kwargs
        return "ACGT", -1.0, np.zeros(2, dtype=np.int64)

    monkeypatch.setattr(api, "decode_post", fake_decode_post)
    sig = np.random.default_rng(0).standard_normal(4000).astype(np.float32)

    api.basecall_raw(sig, model="rgrgr_r94", calibration="real")
    assert seen["rgrgr_r94"]["stay_pen"] == 0.5
    assert seen["rgrgr_r94"]["skip_pen"] == 0.5

    # the round-4 rnnrf preset is empty (reference default optimal);
    # the CRF emit-bias plumbing is exercised with an explicit kwarg
    api.basecall_raw(sig, model="rnnrf_r94", calibration="real")
    assert seen["rnnrf_r94"] == {}
    api.basecall_raw(sig, model="rnnrf_r94", emit_bias=-0.5)
    assert seen["rnnrf_r94"] == {"emit_bias": -0.5}

    # explicit kwarg beats the preset
    api.basecall_raw(sig, model="rgrgr_r94", calibration="real", stay_pen=9.0)
    assert seen["rgrgr_r94"]["stay_pen"] == 9.0


def test_api_basecall_events_calibration(monkeypatch):
    """basecall_events(calibration="real") decodes with the events
    preset; an explicit stay_pen wins."""
    from scrappie_tpu import api

    seen = []

    def fake_decode(lp, stay_pen, skip_pen, local_pen, use_slip):
        seen.append((stay_pen, skip_pen))
        return -1.0, np.full(lp.shape[0] + 1, -1, dtype=np.int64)

    monkeypatch.setattr(api, "decode_transducer", fake_decode)
    sig = np.random.default_rng(2).standard_normal(4000).astype(np.float32)
    api.basecall_events(sig, calibration="real")
    api.basecall_events(sig, calibration="real", stay_pen=9.0)
    assert seen == [(1.0, 0.0), (9.0, 0.0)]


def test_cli_events_parser_accepts_calibration():
    from scrappie_tpu.cli.main import build_parser

    args = build_parser().parse_args(["events", "--calibration", "real", "x"])
    assert args.calibration == "real"


def test_real_preset_does_not_collapse_unseen_read():
    """Regression: skip_pen>0 grid optima collapsed the third bundled
    read (no truth) into the decoder's local states — events (1.5,0.5)
    called 88 bases instead of ~1900 (BASELINE.md).  The shipped preset
    must keep every model's call within a sane length band on it."""
    from scrappie_tpu import api
    from scrappie_tpu.io.fast5 import read_raw

    sig = read_raw("/root/reference/reads/read_ch228_file118.fast5",
                   scale_to_pA=True).raw
    seq_ev, *_ = api.basecall_events(sig, calibration="real")
    assert len(seq_ev) > 1000, f"events preset collapsed: {len(seq_ev)} bases"
    seq_r10 = api.basecall_raw(sig, model="rgrgr_r10", calibration="real")[0]
    assert len(seq_r10) > 1000, f"r10 preset collapsed: {len(seq_r10)} bases"


def test_serve_submit_expands_preset():
    """A calibrated request and the equivalent explicit request resolve
    to identical engine options (and so batch together)."""
    from scrappie_tpu.serve import BasecallService

    calls = []

    class FakeEngine:
        model = "rgrgr_r94"

        def basecall_signals(self, signals, **opts):
            calls.append(opts)
            return [None] * len(signals)

    with BasecallService(engine=FakeEngine(), max_wait_ms=200.0) as svc:
        sig = np.zeros(100, np.float32)
        f1 = svc.submit(sig, calibration="real")
        f2 = svc.submit(sig, stay_pen=0.5, skip_pen=0.5)
        f1.result(10)
        f2.result(10)
    assert len(calls) == 1  # one shared engine call: identical options
    assert calls[0] == {"stay_pen": 0.5, "skip_pen": 0.5}


def test_presets_bound_to_shipped_weight_hashes():
    """Every calibrated model's shipped npz must be the one its preset
    was fit against (VERDICT r3 weak #7: the rnnrf emit-bias churn
    proved presets rot silently when weights change).  If this fails:
    re-run scripts/calibrate_decode.py for the model, update
    REAL_CALIBRATION, and record the new hash in CALIBRATED_WEIGHT_SHA.
    """
    assert set(calibration.CALIBRATED_WEIGHT_SHA) == set(
        calibration.REAL_CALIBRATION)
    for model, expect in calibration.CALIBRATED_WEIGHT_SHA.items():
        got = calibration.weights_sha(model)
        assert got == expect, (
            f"{model}: shipped weights (sha {got}) differ from the ones "
            f"the 'real' calibration preset was fit against ({expect}); "
            f"refit with scripts/calibrate_decode.py and update "
            f"CALIBRATED_WEIGHT_SHA")

"""Model weight registry.

Weights live as .npz pytrees under scrappie_tpu/models/params/.  The
squiggle family is converted from the reference's surviving C weight
headers on first use; the raw/events families (whose headers are broken
symlinks in the reference snapshot, SURVEY.md section 0) get
deterministic synthetic weights with the documented architecture shapes,
so every pipeline runs end-to-end and can be validated against a
reference binary built with the *same* synthetic weights.
"""

from __future__ import annotations

import pathlib

import numpy as np

from scrappie_tpu.models import specs
from scrappie_tpu.models.header_parser import load_squiggle_header
from scrappie_tpu.models.specs import (
    EVENTS_MODEL,
    GRU_DIRS,
    RAW_MODELS,
    SQUIGGLE_HEADER_IDS,
    SQUIGGLE_MODELS,
)

PARAMS_DIR = pathlib.Path(__file__).parent / "params"
REFERENCE_MODELS_DIR = pathlib.Path("/root/reference/src/models")

_cache: dict[str, dict[str, np.ndarray]] = {}


def get_model_stride(model: str) -> int:
    """Stride of a raw model (ref get_raw_model_stride, src/networks.c:87-106)."""
    try:
        return RAW_MODELS[model].stride
    except KeyError:
        raise ValueError(f"Invalid model {model!r}") from None


def _rng(name: str) -> np.random.Generator:
    seed = int.from_bytes(f"scrappie_tpu:{name}".encode(), "little") % (2**63)
    return np.random.default_rng(seed)


def _dense(rng, fan_in: int, fan_out: int, scale: float = 1.0) -> np.ndarray:
    return (rng.standard_normal((fan_in, fan_out)) * (scale / np.sqrt(fan_in))).astype(
        np.float32
    )


# Output-layer gain for synthetic models (initial guess, then calibrated):
# a trained basecaller emits peaky posteriors (max log-prob near 0); with
# gaussian logits the max-vs-logsumexp gap is optimised at logit std
# sqrt(2 ln nstate), so we rescale the output layer to hit that.
_SYNTH_OUTPUT_GAIN = 7.5


def _calibrate_output_gain(p: dict[str, np.ndarray], spec, out_key: str) -> None:
    """Rescale the output layer so per-block logit std ~ sqrt(2 ln nstate)."""
    from scrappie_tpu.models import forward  # local import to avoid cycle

    rng = _rng(spec.name + ":calib")
    if out_key == "FF_W" and spec.kind == "rgrgr":
        sig = rng.standard_normal((1, 2000, 1)).astype(np.float32)
        lp = np.asarray(forward.rgrgr_posterior(
            p, sig, conv_activation=spec.conv_activation, stride=spec.stride))
    elif out_key == "FF3_W" and getattr(spec, "kind", None) == "raw":
        sig = rng.standard_normal((1, 2000, 1)).astype(np.float32)
        lp = np.asarray(forward.raw_posterior(p, sig, stride=spec.stride))
    else:  # events
        feats = rng.standard_normal((1, 500, 4)).astype(np.float32)
        lp = np.asarray(forward.events_posterior(p, feats))
    # std of log-posterior across states == std of logits per block
    sd = float(lp.std(axis=-1).mean())
    target = float(np.sqrt(2.0 * np.log(lp.shape[-1])))
    p[out_key] = (p[out_key] * (target / sd)).astype(np.float32)


def _gru_params(rng, prefix: str, in_size: int, size: int) -> dict[str, np.ndarray]:
    return {
        f"{prefix}_iW": _dense(rng, in_size, 3 * size),
        f"{prefix}_b": np.zeros(3 * size, dtype=np.float32),
        f"{prefix}_sW": _dense(rng, size, 2 * size),
        f"{prefix}_sW2": _dense(rng, size, size),
    }


def _synth_rgrgr(spec: specs.RawModelSpec) -> dict[str, np.ndarray]:
    rng = _rng(spec.name)
    p: dict[str, np.ndarray] = {
        "conv_W": (rng.standard_normal((spec.conv_winlen, 1, spec.conv_nfilter))
                   / np.sqrt(spec.conv_winlen)).astype(np.float32),
        "conv_b": np.zeros(spec.conv_nfilter, dtype=np.float32),
    }
    in_size = spec.conv_nfilter
    for i, d in enumerate(GRU_DIRS, start=1):
        p.update(_gru_params(rng, f"gru{d.upper()}{i}", in_size, spec.size))
        in_size = spec.size
    p["FF_W"] = _dense(rng, spec.size, spec.nstate, _SYNTH_OUTPUT_GAIN)
    p["FF_b"] = np.zeros(spec.nstate, dtype=np.float32)
    if spec.kind == "rgrgr":
        _calibrate_output_gain(p, spec, "FF_W")
    return p


def _synth_raw(spec: specs.RawModelSpec) -> dict[str, np.ndarray]:
    rng = _rng(spec.name)
    p: dict[str, np.ndarray] = {
        "conv_W": (rng.standard_normal((spec.conv_winlen, 1, spec.conv_nfilter))
                   / np.sqrt(spec.conv_winlen)).astype(np.float32),
        "conv_b": np.zeros(spec.conv_nfilter, dtype=np.float32),
    }
    in_size = spec.conv_nfilter
    for layer in (1, 2):
        for d in ("F", "B"):
            p.update(_gru_params(rng, f"gru{d}{layer}", in_size, spec.size))
        p[f"FF{layer}_Wf"] = _dense(rng, spec.size, spec.size)
        p[f"FF{layer}_Wb"] = _dense(rng, spec.size, spec.size)
        p[f"FF{layer}_b"] = np.zeros(spec.size, dtype=np.float32)
        in_size = spec.size
    p["FF3_W"] = _dense(rng, spec.size, spec.nstate, _SYNTH_OUTPUT_GAIN)
    p["FF3_b"] = np.zeros(spec.nstate, dtype=np.float32)
    _calibrate_output_gain(p, spec, "FF3_W")
    return p


def _synth_events(spec: specs.EventsModelSpec) -> dict[str, np.ndarray]:
    rng = _rng(spec.name)
    p: dict[str, np.ndarray] = {}
    in_size = spec.winlen * spec.nfeature
    size = spec.size
    for layer in (1, 2):
        for d in ("F", "B"):
            p[f"lstm{d}{layer}_iW"] = _dense(rng, in_size, 4 * size)
            p[f"lstm{d}{layer}_b"] = np.zeros(4 * size, dtype=np.float32)
            p[f"lstm{d}{layer}_sW"] = _dense(rng, size, 4 * size)
            p[f"lstm{d}{layer}_p"] = (rng.standard_normal(3 * size) * 0.1).astype(np.float32)
        p[f"FF{layer}_Wf"] = _dense(rng, size, size)
        p[f"FF{layer}_Wb"] = _dense(rng, size, size)
        p[f"FF{layer}_b"] = np.zeros(size, dtype=np.float32)
        in_size = size
    p["FF3_W"] = _dense(rng, size, spec.nstate, _SYNTH_OUTPUT_GAIN)
    p["FF3_b"] = np.zeros(spec.nstate, dtype=np.float32)
    _calibrate_output_gain(p, spec, "FF3_W")
    return p


def weights_path(model: str) -> pathlib.Path:
    """Registry npz path for a model's weights (load_params source)."""
    return PARAMS_DIR / f"{model}.npz"


def load_params(model: str) -> dict[str, np.ndarray]:
    """Load (and cache) the parameter pytree for a model by name."""
    if model in _cache:
        return _cache[model]

    npz = PARAMS_DIR / f"{model}.npz"
    if npz.exists():
        with np.load(npz) as z:
            p = {k: z[k] for k in z.files}
    elif model in SQUIGGLE_MODELS:
        header = REFERENCE_MODELS_DIR / SQUIGGLE_MODELS[model].header
        p = load_squiggle_header(header, SQUIGGLE_HEADER_IDS[model])
        _save(npz, p)
    elif model in RAW_MODELS:
        spec = RAW_MODELS[model]
        p = _synth_rgrgr(spec) if spec.kind in ("rgrgr", "rnnrf") else _synth_raw(spec)
        _save(npz, p)
    elif model == EVENTS_MODEL.name:
        p = _synth_events(EVENTS_MODEL)
        _save(npz, p)
    else:
        raise ValueError(f"Invalid model {model!r}")

    _cache[model] = p
    return p


def _save(npz: pathlib.Path, p: dict[str, np.ndarray]) -> None:
    PARAMS_DIR.mkdir(parents=True, exist_ok=True)
    np.savez(npz, **p)

"""Public Python API, mirroring the reference binding
(`python/scrappy/__init__.py`) so existing users can switch over.

Unlike the reference (cffi into single-read C), these entry points batch
work onto the TPU: `calc_post` / `basecall_raw` accept one read for API
parity, while the runtime layer (scrappie_tpu.parallel) batches many
chunks per device program.
"""

from __future__ import annotations

import itertools

import numpy as np

from scrappie_tpu.decode.crf import crfpath_to_basecall, decode_crf, posterior_crf
from scrappie_tpu.decode.transducer import decode_transducer
from scrappie_tpu.models import forward, registry
from scrappie_tpu.models.specs import RAW_MODELS, SQUIGGLE_MODELS
from scrappie_tpu.post.homopolymer import HomopolymerMode, homopolymer_path
from scrappie_tpu.post.overlapper import overlapper
from scrappie_tpu.signal.trim import trim_raw_by_mad
from scrappie_tpu.types import RawSignal
from scrappie_tpu.utils.maths import medmad_normalise


def _gsp():
    # (ref python/scrappy/__init__.py:25-44) transducer state-space sizes
    alpha_len = range(4, 8)
    kmer_len = range(1, 10)
    pairs = [(a, k) for a, k in itertools.product(alpha_len, kmer_len)]
    lookup = {a**k: (a, k) for a, k in pairs}

    def guess_state_properties(nstate: int):
        """(alphabet size, kmer length) from transducer state count."""
        return lookup[nstate - 1]

    return guess_state_properties


guess_state_properties = _gsp()


class RawTable:
    """Raw-signal container with chained trim/scale (ref RawTable,
    python/scrappy/__init__.py:47-111)."""

    def __init__(self, data, start: int = 0, end: int | None = None):
        self._rs = RawSignal(np.asarray(data, dtype=np.float32), start=start, end=end)

    def data(self, as_numpy: bool = False):
        if as_numpy:
            return self._rs.trimmed.copy()
        return self._rs

    @property
    def start(self) -> int:
        return self._rs.start

    @property
    def end(self) -> int:
        return self._rs.end

    def trim(self, start=200, end=10, varseg_chunk=100, varseg_thresh=0.0):
        rs = trim_raw_by_mad(self._rs, varseg_chunk, varseg_thresh)
        new_start = rs.start + start if (rs.n - rs.start) > start else rs.n
        new_end = rs.end - end if rs.end > end else 0
        if new_start >= new_end:
            new_start, new_end = 0, 0
        self._rs = RawSignal(rs.raw, start=new_start, end=new_end, uuid=rs.uuid)
        return self

    def scale(self):
        raw = self._rs.raw.copy()
        raw[self._rs.start : self._rs.end] = medmad_normalise(self._rs.trimmed)
        self._rs = RawSignal(raw, self._rs.start, self._rs.end, self._rs.uuid)
        return self


class Posterior:
    """Posterior/transition matrix [nblock, nstate] with the reference's
    optional "sloika" state reorder (stay first — ref _scrappie_to_numpy,
    python/scrappy/__init__.py:247-273)."""

    def __init__(self, mat: np.ndarray, model: str):
        self._mat = np.asarray(mat)
        self.model = model

    @property
    def shape(self):
        return self._mat.shape

    def __len__(self):
        return self._mat.shape[0]

    def data(self, as_numpy: bool = False, sloika: bool = True):
        if not as_numpy:
            return self._mat
        if sloika:
            return np.ascontiguousarray(
                np.concatenate([self._mat[:, -1:], self._mat[:, :-1]], axis=1)
            )
        return self._mat.copy()


_posterior_fns = {
    "raw_r94": forward.raw_posterior,
    "rgrgr_r94": forward.rgrgr_posterior,
    "rgrgr_r941": forward.rgrgr_posterior,
    "rgrgr_r10": forward.rgrgr_posterior,
    "rnnrf_r94": forward.rnnrf_transitions,
}


def calc_post(rt: RawTable, model: str = "rgrgr_r94", min_prob: float = 1e-6,
              log: bool = True, tempW: float = 1.0, tempb: float = 1.0) -> Posterior:
    """Run a raw model over a (trimmed, scaled) RawTable.

    (ref calc_post, python/scrappy/__init__.py:276-298)
    """
    if not log and model == "rnnrf_r94":
        raise ValueError(
            "Returning non-log transformed matrix not supported for model type 'rnnrf_r94'."
        )
    if not isinstance(rt, RawTable):
        raise TypeError("`rt` should be a RawTable.")
    if model not in RAW_MODELS:
        raise KeyError(f"Model type {model!r} not recognised.")

    spec = RAW_MODELS[model]
    params = registry.load_params(model)
    sig = rt.data(as_numpy=True).reshape(1, -1, 1)
    kwargs = dict(stride=spec.stride, min_prob=min_prob, tempW=tempW,
                  tempb=tempb, return_log=log)
    if spec.kind in ("rgrgr", "rnnrf"):
        kwargs["conv_activation"] = spec.conv_activation
    fn = _posterior_fns[model]
    if spec.kind == "rnnrf":
        kwargs.pop("min_prob")
        kwargs.pop("tempW")
        kwargs.pop("tempb")
    out = np.asarray(fn(params, sig, **kwargs)[0])
    return Posterior(out, model)


def _decode_post_transducer(post: Posterior, stay_pen=0.0, skip_pen=0.0,
                            local_pen=2.0, use_slip=False,
                            homopolymer: str | HomopolymerMode | None = None):
    nblock, nstate = post.shape
    score, path = decode_transducer(post.data(), stay_pen, skip_pen, local_pen, use_slip)
    path = np.asarray(path).copy()
    if homopolymer is not None:
        mode = HomopolymerMode.parse(homopolymer) if isinstance(homopolymer, str) else homopolymer
        path = homopolymer_path(post.data(), path, mode)
    pos = np.zeros(nblock + 1, dtype=np.int64)
    seq = overlapper(path, nstate - 1, pos)

    # Runtime decode-collapse guard (models/calibration.py): skip_pen>0
    # can absorb a whole read into the local start/end states on
    # out-of-distribution data; re-decode the cached posterior with
    # skip_pen=0 instead of returning the collapsed call.
    if skip_pen > 0:
        from scrappie_tpu.models.calibration import collapsed

        if collapsed(len(seq or ""), nblock, post.model):
            from scrappie_tpu.utils.tracing import log

            log("warn", "decode collapsed; re-decoding with skip_pen=0",
                nbases=len(seq or ""), nblock=nblock, skip_pen=skip_pen)
            return _decode_post_transducer(post, stay_pen, 0.0, local_pen,
                                           use_slip, homopolymer)
    return seq, float(score), pos


def _decode_post_crf(post: Posterior, emit_bias: float = 0.0):
    nblock, _ = post.shape
    score, path = decode_crf(post.data(), emit_bias=emit_bias)
    pos = np.zeros(nblock + 1, dtype=np.int64)
    seq = crfpath_to_basecall(path[: nblock + 1], pos)
    return seq, float(score), pos


_decoders = {
    "raw_r94": _decode_post_transducer,
    "rgrgr_r94": _decode_post_transducer,
    "rgrgr_r941": _decode_post_transducer,
    "rgrgr_r10": _decode_post_transducer,
    "rnnrf_r94": _decode_post_crf,
}


def decode_post(post: Posterior, model: str = "rgrgr_r94", **kwargs):
    """Decode a posterior into (basecall, score, block positions).

    (ref decode_post, python/scrappy/__init__.py:300-319)
    """
    if not isinstance(post, Posterior):
        raise TypeError("`post` should be a Posterior.")
    try:
        dec = _decoders[model]
    except KeyError:
        raise KeyError(f"Model type {model!r} not recognised.") from None
    return dec(post, **kwargs)


def basecall_raw(data, model: str = "rgrgr_r94", with_base_probs: bool = False,
                 calibration: str = "reference",
                 ensemble: tuple[str, ...] = (),
                 ensemble_weights: tuple[float, ...] | None = None, **kwargs):
    """Trim, scale, run the network, decode — one read end to end.

    Returns (sequence, score, block positions, trim start, trim end,
    base probs or None); ref basecall_raw, python/scrappy/__init__.py:403-430.
    ``calibration="real"`` fills the measured real-read decode preset
    (models/calibration.py) for any knob not passed explicitly.
    ``ensemble`` decodes a weighted geometric mean of grid-aligned
    transducer models' posteriors (BASELINE.md "Posterior ensembling";
    same semantics/validation as BasecallEngine(ensemble=...)).
    """
    if with_base_probs and model != "rnnrf_r94":
        raise ValueError("Base probabilities can only be returned for model 'rnnrf_r94'.")
    if calibration != "reference":
        from scrappie_tpu.models import calibration as _calibration

        for key, value in _calibration.preset(model, calibration,
                                              tuple(ensemble)).items():
            # the CRF decoder spells the emit-bias knob `emit_bias`
            kwargs.setdefault("emit_bias" if key == "crf_emit_bias" else key,
                              value)

    raw = RawTable(data)
    raw.trim().scale()
    post = calc_post(raw, model, log=True)
    if ensemble or ensemble_weights is not None:
        from scrappie_tpu.models.ensemble import validate_ensemble

        w = validate_ensemble(model, ensemble, ensemble_weights)
        lp = w[0] * post.data()
        for wi, m in zip(w[1:], ensemble):
            lp = lp + wi * calc_post(raw, m, log=True).data()
        from scrappie_tpu.models.specs import RAW_MODELS as _RM

        if _RM[model].kind != "rnnrf":
            # CRF members are transition energies: the weighted mean is
            # the whole combination (globally-normalised model; per-block
            # renormalisation is a Viterbi no-op — models/ensemble.py)
            lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        post = Posterior(lp.astype(np.float32), model)
    seq, score, pos = decode_post(post, model, **kwargs)

    base_probs = None
    if with_base_probs:
        base_probs = posterior_crf(post.data())
    return seq, score, pos, raw.start, raw.end, base_probs


def basecall_events(data, *, trim_start=200, trim_end=10, varseg_chunk=100,
                    varseg_thresh=0.0, min_prob=1e-5, tempW=1.0, tempb=1.0,
                    stay_pen=0.0, skip_pen=0.0, local_pen=2.0, use_slip=False,
                    dwell_correction=True, calibration: str = "reference"):
    """Events pipeline: event detection -> nanonet biLSTM -> transducer
    decode -> optional dwell homopolymer correction.

    Mirrors the `scrappie events` calculate_post flow
    (ref src/scrappie_events.c:271-344).  Returns (sequence, score,
    annotated EventTable, trim start, trim end).
    ``calibration="real"`` fills the measured stay/skip preset for
    knobs left at their reference defaults (models/calibration.py).
    """
    if calibration != "reference":
        from scrappie_tpu.models import calibration as _calibration

        knobs = _calibration.apply("nanonet_events", calibration,
                                   {"stay_pen": stay_pen, "skip_pen": skip_pen})
        stay_pen, skip_pen = knobs["stay_pen"], knobs["skip_pen"]
    from scrappie_tpu.post.homopolymer import homopolymer_dwell_correction
    from scrappie_tpu.signal.events import detect_events
    from scrappie_tpu.signal.features import nanonet_features_from_events
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.types import RawSignal

    rt = trim_and_segment_raw(RawSignal(np.asarray(data, dtype=np.float32)),
                              trim_start, trim_end, varseg_chunk, varseg_thresh)
    if rt is None:
        return None, float("nan"), None, 0, 0
    et = detect_events(rt)
    feats = nanonet_features_from_events(et, normalise=True)

    params = registry.load_params("nanonet_events")
    # The log-posterior stays a device array: decode_transducer runs on
    # device and only the int path/score transfer.  Pulling the
    # [nev, 1025] posterior to the host costs ~66 MB/read (820 B/block)
    # — the same transfer ceiling the raw engine's device-stitch mode
    # exists to avoid (BASELINE.md round-2 engine table).
    lp = forward.events_posterior(params, feats[None], min_prob=min_prob,
                                  tempW=tempW, tempb=tempb,
                                  return_log=True)[0]
    nev, nstate = lp.shape
    score, path = decode_transducer(lp, stay_pen, skip_pen, local_pen, use_slip)
    pos = np.zeros(nev + 1, dtype=np.int64)
    # The reference stitches only the first nev path entries
    # (ref src/scrappie_events.c:301)
    seq = overlapper(path[:nev], nstate - 1, pos)

    # Runtime decode-collapse guard (models/calibration.py documents the
    # measured skip_pen>0 failure mode): re-decode the cached posterior
    # with skip_pen=0 instead of emitting a collapsed call.
    if skip_pen > 0:
        from scrappie_tpu.models.calibration import collapsed

        if collapsed(len(seq or ""), nev, "nanonet_events"):
            from scrappie_tpu.utils.tracing import log

            log("warn", "events decode collapsed; re-decoding with skip_pen=0",
                nbases=len(seq or ""), nev=nev, skip_pen=skip_pen)
            score, path = decode_transducer(lp, stay_pen, 0.0, local_pen,
                                            use_slip)
            pos = np.zeros(nev + 1, dtype=np.int64)
            seq = overlapper(path[:nev], nstate - 1, pos)

    # Annotate events with decoded state/position (ref :307-311)
    ev = et.event
    ev["state"][et.start : et.start + nev] = 1 + path[:nev]
    ev["pos"][et.start : et.start + nev] = pos[:nev]

    if dwell_correction and seq is not None:
        active = et.active[:nev]
        new = homopolymer_dwell_correction(
            active["length"], active["start"], path[:nev], active["pos"],
            active["state"], nstate, len(seq)
        )
        if new is not None:
            seq = new
    return seq, float(score), et, rt.start, rt.end


def get_model_stride(model: str) -> int:
    return registry.get_model_stride(model)


_base_to_int = {c: i for i, c in enumerate("ACGT")}


def encode_bases(sequence: str, state_len: int = 1) -> np.ndarray:
    """Rolling kmer encoding of a base string (ref encode_bases_to_integers,
    src/scrappie_seq_helpers.c:53-74; first base most significant)."""
    try:
        enc = np.array([_base_to_int[b] for b in sequence.upper()],
                       dtype=np.int64)
    except KeyError as e:
        raise ValueError(f"sequence contains non-ACGT base {e.args[0]!r}") from None
    n = len(enc) - state_len + 1
    if n <= 0:
        raise ValueError("sequence shorter than state length")
    out = np.zeros(n, dtype=np.int64)
    for j in range(state_len):
        out = out * 4 + enc[j : j + n]
    return out


def sequence_to_squiggle(sequence: str, model: str = "squiggle_r94",
                         rescale: bool = False) -> np.ndarray:
    """Predict (current, sd, dwell) per base of `sequence`.

    (ref sequence_to_squiggle, python/scrappy/__init__.py:433-459).
    rescale=True applies the unit transform (sd=exp(logsd),
    dwell=exp(-x)) exactly like the CLI's --rescale.
    """
    if model not in SQUIGGLE_MODELS:
        raise KeyError(f"Squiggle model type {model!r} not recognised.")
    params = registry.load_params(model)
    seq = encode_bases(sequence, 1).astype(np.int32)
    out = forward.squiggle_forward(params, seq, transform_units=rescale)
    return np.asarray(out)


def map_signal_to_squiggle(data, sequence: str, model: str = "squiggle_r94",
                           rate: float = 1.0, back_prob: float = 0.0,
                           local_pen: float = 2.0, skip_pen: float = 5000.0,
                           min_score: float = 5.0):
    """Align raw signal to the predicted squiggle of `sequence` by DTW.

    (ref map_signal_to_squiggle, python/scrappy/__init__.py:462-489)
    Returns (score, path over the FULL input with -1 outside the
    trimmed/mapped region).
    """
    from scrappie_tpu.decode.dtw import squiggle_match_viterbi

    raw = RawTable(data)
    raw.trim().scale()
    squiggle = sequence_to_squiggle(sequence, model=model, rescale=False)
    score, path = squiggle_match_viterbi(
        raw.data(as_numpy=True), squiggle, rate=rate, prob_back=back_prob,
        local_pen=local_pen, skip_pen=skip_pen, minscore=min_score,
    )
    full_path = np.full(len(np.asarray(data)), -1, dtype=np.int32)
    full_path[raw.start : raw.end] = path
    return score, full_path


def map_post_to_sequence(post: Posterior, sequence: str, stay_pen=0.0, skip_pen=0.0,
                         local_pen=4.0, viterbi=False, path=False, bands=None):
    """Local-global alignment of a basecall posterior to a reference
    sequence (ref map_post_to_sequence, python/scrappy/__init__.py:492-578).

    bands: None (full DP), an int half-width (diagonal band), or a
    (low, high) pair of arrays.
    """
    from scrappie_tpu.decode import mapping

    if path and not viterbi:
        raise ValueError("Cannot calculate path with `viterbi==False`.")
    if not isinstance(post, Posterior):
        raise TypeError("`post` should be a Posterior.")

    nblock, nstate = post.shape
    _, kmer_len = guess_state_properties(nstate)
    seq = encode_bases(sequence, kmer_len)
    seqlen = len(seq)

    if bands is None:
        if viterbi:
            res = mapping.map_to_sequence_viterbi(
                post.data(), seq, stay_pen, skip_pen, local_pen, want_path=path
            )
            score, p = res if path else (res, None)
        else:
            score = mapping.map_to_sequence_forward(
                post.data(), seq, stay_pen, skip_pen, local_pen
            )
            p = None
        return score, p

    if isinstance(bands, int):
        gradient = seqlen / nblock
        half = bands * gradient
        low = np.maximum(0, (np.arange(nblock) * gradient - half)).astype(np.int64)
        high = np.minimum(seqlen, (np.arange(nblock) * gradient + half)).astype(np.int64)
        # Invariants required by are_bounds_sane
        low[0] = 0
        high[-1] = seqlen
        bands = (low, high)
    elif len(bands) != 2:
        raise ValueError("`bands` should be `None`, an integer, or length 2.")
    low, high = (np.asarray(b, dtype=np.int64) for b in bands)
    if not mapping.are_bounds_sane(low, high, nblock, seqlen):
        raise ValueError("Supplied banding structure is not valid.")
    score = mapping.map_to_sequence_banded(
        post.data(), seq, low, high, stay_pen, skip_pen, local_pen, viterbi=viterbi
    )
    return score, None

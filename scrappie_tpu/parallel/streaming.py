"""Streaming (incremental) basecalling: signal in, bases out, live.

New capability beyond the reference, which is strictly whole-read —
every pipeline consumes a complete `raw_table` before any output
(ref src/scrappie_raw.c:333-436).  A `StreamingBasecaller` accepts raw
current samples in arbitrary increments (e.g. from a live sequencing
channel), runs the same fixed-shape chunk geometry as the batch engine
(parallel/chunk.py — so every device program compiles exactly once),
and commits bases as soon as their blocks can no longer be affected by
future signal: a block is emitted once it is at least half an overlap
inside a decoded chunk, the same midpoint rule `chunk_keep_ranges`
uses.

Latency/throughput contract:
  - feed() triggers one device call per completed `chunk_len - overlap`
    hop; decisions are committed with at most `chunk_len` samples of
    lookahead.
  - Output is increment-invariant: feeding the same signal in any split
    yields byte-identical bases (tests/test_streaming.py).
  - The decode geometry matches the batch engine's 'fast' mode (fused
    per-chunk decode + midpoint path stitch); only the final junction
    can differ from the engine, because the engine right-aligns its
    last chunk while a stream must commit before the read's end is
    known.

Normalisation: the batch pipeline med-mad-normalises the whole read
(ref src/util.c:190), which a stream cannot do.  The default
`calib_mode="prefix"` recalibrates each chunk with the med-mad of a
strided reservoir over ALL samples seen so far — deterministic in the
signal prefix (chunk starts are fixed stream coordinates), so output
stays increment-invariant, and converging to the batch engine's
whole-read scale (the frozen opening-window calibration was the entire
streaming-vs-engine accuracy gap; BASELINE.md).  `calib_mode="frozen"`
keeps the opening-window behaviour: scale from the first
`min(calib_samples, chunk_len)` samples, then frozen.  Pass
`normalise=False` to feed pre-normalised signal.

For many concurrent channels, `StreamingBatcher` coalesces ready
chunks across channels into [batch_size, chunk_len] device batches —
the TPU-shaped way to run live basecalling (a solo stream decodes at
batch 1 and wastes the MXU).  Per-channel output is byte-identical to
a solo StreamingBasecaller with the same parameters.
"""

from __future__ import annotations

import numpy as np

from scrappie_tpu.decode.crf import decode_crf
from scrappie_tpu.decode.transducer import viterbi_decode_batch
from scrappie_tpu.models.specs import RAW_MODELS
from scrappie_tpu.post.overlapper import kmer_len_from_nkmer, overlapper
from scrappie_tpu.utils.maths import madf, medianf

NBASE = 4
_CRF_BASES = np.array(list("ACGT"))
# prefix-calibration reservoir keeps every 4th stream sample; med-mad
# of an AR(1)-correlated squiggle subsampled 4x matches the full
# estimate to well under the decode's sensitivity
_RES_STRIDE = 4


def _build_posterior(model: str, min_prob: float, tempW: float, tempb: float,
                     ensemble: tuple[str, ...] = (), ensemble_weights=None):
    """Jitted posterior/transition forward for one model (shared by a
    solo stream, or once across a whole StreamingBatcher).

    With `ensemble`, the returned params are a TUPLE of per-model dicts
    (primary first) and the program emits the weighted geometric mean
    of the members' posteriors, renormalised per block — the streaming
    analogue of BasecallEngine(ensemble=...) (same validation,
    models/ensemble.py)."""
    import functools

    import jax
    import jax.numpy as jnp

    from scrappie_tpu.models import forward, registry

    def one(m):
        spec = RAW_MODELS[m]
        params = {k: jnp.asarray(v)
                  for k, v in registry.load_params(m).items()}
        kwargs = dict(stride=spec.stride, min_prob=min_prob, tempW=tempW,
                      tempb=tempb, return_log=True)
        if spec.kind == "rgrgr":
            fn = functools.partial(forward.rgrgr_posterior,
                                   conv_activation=spec.conv_activation,
                                   **kwargs)
        elif spec.kind == "rnnrf":
            fn = functools.partial(forward.rnnrf_transitions,
                                   conv_activation=spec.conv_activation,
                                   stride=spec.stride)
        else:
            fn = functools.partial(forward.raw_posterior, **kwargs)
        return params, fn

    params, fn = one(model)
    if not ensemble:
        return params, jax.jit(lambda p, x: fn(p, x))

    from scrappie_tpu.models.ensemble import validate_ensemble

    w = validate_ensemble(model, ensemble, ensemble_weights)
    members = [one(m) for m in ensemble]

    if RAW_MODELS[model].kind == "rnnrf":
        # CRF family: weighted mean of transition energies, no
        # renormalisation (globally-normalised model; per-block
        # constants cancel in the Viterbi — models/ensemble.py)
        def combined(ps, x):
            t = np.float32(w[0]) * fn(ps[0], x)
            for wi, (_, f), p in zip(w[1:], members, ps[1:]):
                t = t + np.float32(wi) * f(p, x)
            return t
    else:
        def combined(ps, x):
            lp = np.float32(w[0]) * fn(ps[0], x)
            for wi, (_, f), p in zip(w[1:], members, ps[1:]):
                lp = lp + np.float32(wi) * f(p, x)
            return lp - jax.scipy.special.logsumexp(lp, axis=-1,
                                                    keepdims=True)

    all_params = (params,) + tuple(p for p, _ in members)
    return all_params, jax.jit(combined)


class SampleBufferMixin:
    """Shared stream-buffer machinery for the streaming basecallers
    (raw here; events in streaming_events.py).

    Requires attributes: `_parts` (list of arrays), `_base_off` (samples
    dropped from the front), `_next_start` (next chunk's sample start),
    `chunk_len`.  Subclasses may override `_compact_ready()` to delay
    compaction (the raw stream must keep its calibration window)."""

    def _buffer(self) -> np.ndarray:
        if len(self._parts) > 1:
            self._parts = [np.concatenate(self._parts)]
        return self._parts[0] if self._parts else np.zeros(0, np.float32)

    def _window(self, start: int, length: int) -> np.ndarray:
        """Samples [start, start+length) in stream coordinates,
        reflect-padded at the tail like chunk.extract_chunks."""
        buf = self._buffer()
        seg = buf[start - self._base_off : start - self._base_off + length]
        if len(seg) == length:
            return seg
        out = np.zeros(length, np.float32)
        out[: len(seg)] = seg
        if len(seg) > 0:
            refl = seg[::-1]
            npad = length - len(seg)
            reps = -(-npad // len(refl))
            out[len(seg):] = np.tile(refl, reps)[:npad]
        return out

    def _compact_ready(self) -> bool:
        return True

    def _compact(self) -> None:
        # keep everything a flush-time right-aligned final chunk could
        # still need (f >= next_start - chunk_len)
        if not self._compact_ready():
            return
        keep_from = max(self._base_off, self._next_start - self.chunk_len)
        buf = self._buffer()
        drop = keep_from - self._base_off
        if drop > 0:
            self._parts = [buf[drop:]]
            self._base_off = keep_from


class StreamingBasecaller(SampleBufferMixin):
    """Incremental basecaller for one read/channel.

    feed(samples) -> str   newly committed bases (possibly "")
    flush() -> str         decode + commit the tail; stream is finished
    .sequence              all bases committed so far
    .score                 kept-block-weighted decode score so far

    decode_fn: optional injected decoder mapping a normalised
    [chunk_len] float32 window to (per-block emissions [nblock_chunk],
    score) — used by StreamingBatcher to route chunk decodes through
    one shared batched program.  Without it the stream builds its own
    batch-1 jit on first use.
    """

    def __init__(self, model: str = "rgrgr_r94", chunk_len: int = 10000,
                 overlap: int = 1000, *, normalise: bool = True,
                 calib_mode: str = "prefix", calib_samples: int = 8000,
                 min_prob: float = 1e-5,
                 tempW: float = 1.0, tempb: float = 1.0, stay_pen: float = 0.0,
                 skip_pen: float = 0.0, local_pen: float = 2.0,
                 use_slip: bool = False, decode_fn=None,
                 trim_start: int = 0, ensemble: tuple[str, ...] = (),
                 ensemble_weights: tuple[float, ...] | None = None):
        self.model = model
        self.spec = RAW_MODELS[model]
        self._ensemble = tuple(ensemble)
        self._ensemble_weights = ensemble_weights
        if ensemble or ensemble_weights is not None:
            from scrappie_tpu.models.ensemble import validate_ensemble

            validate_ensemble(model, self._ensemble, ensemble_weights)
        from scrappie_tpu.models.ensemble import fused_config

        self._ens_fused = fused_config(model, self._ensemble,
                                       ensemble_weights)
        stride = self.spec.stride
        if chunk_len % stride or overlap % stride:
            raise ValueError("chunk_len and overlap must be stride multiples")
        if not 0 < overlap < chunk_len:
            raise ValueError("need 0 < overlap < chunk_len")
        self.chunk_len, self.overlap = chunk_len, overlap
        self.hop = chunk_len - overlap
        self.normalise = normalise
        if calib_mode not in ("prefix", "frozen"):
            raise ValueError(f"unknown calib_mode {calib_mode!r}")
        self.calib_mode = calib_mode
        self.calib_samples = calib_samples
        self._decode_args = (float(stay_pen), float(skip_pen),
                             float(local_pen), bool(use_slip))
        self._posterior_opts = (float(min_prob), float(tempW), float(tempb))
        self._decode_fn = decode_fn
        self._own_program = None  # lazy (params, jit) when decode_fn is None
        # samples still to drop from the stream head (the engine's
        # trim_start analogue; a live channel skips the adapter)
        self._trim_left = int(trim_start)

        # stream state
        self._parts: list[np.ndarray] = []   # raw samples from _base_off on
        self._base_off = 0                   # samples dropped from the front
        self._nfed = 0                       # total samples ever fed
        self._next_start = 0                 # sample start of the next chunk
        self._reserved = 0                   # chunks reserved, not committed
        self._committed_hi = 0               # global blocks committed
        self._last_chunk = None              # (emissions, f_blk, score)
        self._last_kmer: int | None = None   # kmer context across commits
        self._med = self._mad = None
        # prefix calibration reservoir: every _RES_STRIDE-th stream
        # sample (deterministic in the signal; ~25% of the read)
        self._res_parts: list[np.ndarray] = []
        self._seq_parts: list[str] = []
        self._score = 0.0
        self._done = False

    # ------------------------------------------------------------- buffer

    def _compact_ready(self) -> bool:
        # frozen mode: the calibration window must survive until
        # calibration happens (prefix mode keeps its own reservoir)
        return (self.calib_mode == "prefix" or self._med is not None
                or not self.normalise)

    def _prefix_medmad(self, upto: int) -> tuple[float, float]:
        """(median, mad) over the reservoir samples with stream index
        < `upto` — a deterministic function of the signal prefix, so
        per-chunk calibration stays increment-invariant.  Converges to
        the batch engine's whole-read med-mad as the stream grows."""
        if len(self._res_parts) > 1:
            self._res_parts = [np.concatenate(self._res_parts)]
        res = self._res_parts[0] if self._res_parts else np.zeros(0, np.float32)
        # reservoir sample i sits at stream index i * _RES_STRIDE
        n_use = min(len(res), -(-upto // _RES_STRIDE))
        if n_use == 0:
            return 0.0, 1.0
        win = res[:n_use]
        med = medianf(win)
        mad = madf(win, med)
        return med, (mad if mad > 0 else 1.0)

    def _maybe_calibrate(self, force: bool = False) -> None:
        if not self.normalise or self._med is not None \
                or self.calib_mode == "prefix":
            return
        if self._nfed >= self.calib_samples or force:
            # Deterministic in the signal alone (NOT in feed() split
            # sizes, which would break increment-invariance): the window
            # is the first min(calib_samples, chunk_len) samples — the
            # first chunk can trigger processing before calib_samples
            # have arrived, so never look past chunk_len.
            win = self._buffer()[: min(self.calib_samples, self.chunk_len,
                                       self._nfed)]
            if len(win) == 0:
                self._med, self._mad = 0.0, 1.0
                return
            self._med = medianf(win)
            mad = madf(win, self._med)
            self._mad = mad if mad > 0 else 1.0

    # ------------------------------------------------------------- decode

    def _chunk_ready(self) -> bool:
        return (not self._done
                and self._nfed >= self._next_start + self.chunk_len)

    def _chunk_input(self, start: int) -> np.ndarray:
        """Normalised [chunk_len] window for the chunk at `start`."""
        x = self._window(start, self.chunk_len)
        if self.normalise:
            if self.calib_mode == "prefix":
                med, mad = self._prefix_medmad(start + self.chunk_len)
            else:
                self._maybe_calibrate(force=True)
                med, mad = self._med, self._mad
            x = (x - med) / mad
        return np.asarray(x, np.float32)

    def _reserve_chunk(self) -> tuple[int, np.ndarray]:
        """Claim the next ready chunk: returns (start, normalised input)
        and advances the chunk cursor.  Chunks MUST then be committed in
        reservation order (enforced by _commit_chunk's bookkeeping)."""
        start = self._next_start
        x = self._chunk_input(start)
        self._next_start += self.hop
        self._reserved += 1
        self._compact()
        return start, x

    def _decode(self, x: np.ndarray) -> tuple[np.ndarray, float]:
        """(per-block emissions [nblock_chunk], score) for one window."""
        if self._decode_fn is not None:
            return self._decode_fn(x)
        import jax.numpy as jnp

        from scrappie_tpu import ops

        if self._own_program is None:
            self._own_program = _build_posterior(
                self.model, *self._posterior_opts,
                ensemble=self._ensemble,
                ensemble_weights=self._ensemble_weights)
        params, posterior = self._own_program
        if self.spec.kind == "rgrgr" and not self._ensemble \
                and ops.pallas_enabled():
            # fused chunk pipeline (see StreamingBatcher._decode_batch_input)
            from scrappie_tpu.ops.pipeline import rgrgr_basecall_fused

            mp, tw, tb = self._posterior_opts
            scores, paths = rgrgr_basecall_fused(
                params, jnp.asarray(x)[None, :, None],
                conv_activation=self.spec.conv_activation,
                stride=self.spec.stride, min_prob=mp, tempW=tw, tempb=tb,
                stay_pen=self._decode_args[0], skip_pen=self._decode_args[1],
                local_pen=self._decode_args[2],
                use_slip=self._decode_args[3])
            return np.asarray(paths)[0][1:], float(np.asarray(scores)[0])
        if self._ens_fused is not None and ops.pallas_enabled():
            # fused multi-model chunk pipeline (round 5): the K member
            # stacks run in one device program, posteriors combine in
            # VMEM before the fused head+Viterbi — one device call per
            # chunk instead of posterior-then-decode
            from scrappie_tpu.ops.pipeline import ensemble_basecall_fused

            mp, tw, tb = self._posterior_opts
            w, kinds, acts = self._ens_fused
            scores, paths = ensemble_basecall_fused(
                params, w, jnp.asarray(x)[None, :, None], kinds=kinds,
                conv_activations=acts, stride=self.spec.stride,
                min_prob=mp, tempW=tw, tempb=tb,
                stay_pen=self._decode_args[0], skip_pen=self._decode_args[1],
                local_pen=self._decode_args[2],
                use_slip=self._decode_args[3])
            return np.asarray(paths)[0][1:], float(np.asarray(scores)[0])
        lp = posterior(params, jnp.asarray(x)[None, :, None])
        if self.spec.kind == "rnnrf":
            if ops.pallas_enabled():
                # device-side CRF Viterbi (ops/crf.py): identical paths
                # to decode_crf's scan, without shipping the [B, nb, 25]
                # transitions to the host and back
                from scrappie_tpu.ops.crf import crf_viterbi_kernel

                scores, paths = crf_viterbi_kernel(lp)
                return np.asarray(paths)[0][:-1], float(np.asarray(scores)[0])
            scores, paths = decode_crf(np.asarray(lp))
            return np.asarray(paths)[0][:-1], float(scores[0])
        scores, paths = viterbi_decode_batch(lp, *self._decode_args)
        return np.asarray(paths)[0][1:], float(np.asarray(scores)[0])

    def _emit(self, seg: np.ndarray) -> str:
        """Turn newly committed per-block emissions into bases, carrying
        kmer context across commits so the result equals one overlapper
        pass over the concatenated emissions."""
        seg = np.asarray(seg)
        if self.spec.kind == "rnnrf":
            return "".join(_CRF_BASES[seg[seg < NBASE]])
        nonstay = seg >= 0
        if not nonstay.any():
            return ""
        if self._last_kmer is None:
            out = overlapper(seg, self.spec.nstate - 1) or ""
        else:
            ext = np.concatenate([[self._last_kmer], seg])
            klen = kmer_len_from_nkmer(self.spec.nstate - 1)
            out = (overlapper(ext, self.spec.nstate - 1) or "")[klen:]
        self._last_kmer = int(seg[nonstay][-1])
        return out

    def _commit_range(self, emissions: np.ndarray, f_blk: int, lo: int,
                      hi: int, score: float) -> str:
        """Commit global blocks [lo, hi) from a chunk starting at block
        f_blk; returns the new bases."""
        if hi <= lo:
            return ""
        bases = self._emit(emissions[lo - f_blk : hi - f_blk])
        self._committed_hi = hi
        self._score += score * (hi - lo) / max(len(emissions), 1)
        if bases:
            self._seq_parts.append(bases)
        return bases

    def _commit_chunk(self, start: int, emissions: np.ndarray,
                      score: float) -> str:
        """Commit a reserved chunk's decode (in reservation order)."""
        stride = self.spec.stride
        f_blk = start // stride
        hi = f_blk + self.hop // stride + (self.overlap // stride) // 2
        lo = 0 if start == 0 else self._committed_hi
        bases = self._commit_range(np.asarray(emissions), f_blk, lo, hi,
                                   float(score))
        self._last_chunk = (np.asarray(emissions), f_blk, float(score))
        self._reserved -= 1
        return bases

    # ------------------------------------------------------------- public

    @property
    def sequence(self) -> str:
        return "".join(self._seq_parts)

    @property
    def score(self) -> float:
        return self._score

    @property
    def nsample(self) -> int:
        return self._nfed

    def append_samples(self, samples) -> None:
        """Buffer samples without decoding (StreamingBatcher ingest)."""
        if self._done:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples, dtype=np.float32).ravel()
        if self._trim_left:
            drop = min(self._trim_left, len(samples))
            samples = samples[drop:]
            self._trim_left -= drop
        if len(samples):
            if self.normalise and self.calib_mode == "prefix":
                # stream indices [_nfed, _nfed+n): keep those ≡ 0 (mod
                # stride), independent of how the feed was split
                off = (-self._nfed) % _RES_STRIDE
                if off < len(samples):
                    self._res_parts.append(samples[off::_RES_STRIDE])
            self._parts.append(samples)
            self._nfed += len(samples)

    def feed(self, samples) -> str:
        self.append_samples(samples)
        out: list[str] = []
        while self._chunk_ready():
            start, x = self._reserve_chunk()
            emissions, score = self._decode(x)
            out.append(self._commit_chunk(start, emissions, score))
        return "".join(out)

    def flush(self) -> str:
        if self._done:
            raise RuntimeError("stream already flushed")
        if self._reserved:
            raise RuntimeError("reserved chunks not yet committed "
                               "(StreamingBatcher must poll() before flush)")
        self._done = True
        nsample = self._nfed
        if nsample == 0:
            return ""
        stride = self.spec.stride
        total = -(-nsample // stride)
        self._maybe_calibrate(force=True)
        if self._committed_hi >= total:
            return ""
        if self._last_chunk is None:
            # short read: a single (reflect-padded) chunk covers it all
            emissions, score = self._decode(self._chunk_input(0))
            return self._commit_range(np.asarray(emissions), 0, 0, total,
                                      score)
        emissions, prev_f_blk, prev_score = self._last_chunk
        prev_start = self._next_start - self.hop
        if nsample <= prev_start + self.chunk_len:
            # the last decoded chunk already covers the tail
            return self._commit_range(emissions, prev_f_blk,
                                      self._committed_hi, total, prev_score)
        # right-aligned final chunk over the tail (ceil-stride-aligned,
        # like chunk.plan_chunks' last chunk)
        f = max(0, -(-(nsample - self.chunk_len) // stride) * stride)
        f = min(f, prev_start + self.hop)
        emissions, score = self._decode(self._chunk_input(f))
        return self._commit_range(np.asarray(emissions), f // stride,
                                  self._committed_hi, total, score)


class StreamingBatcher:
    """Live basecalling of many channels with batched device work.

    Ready chunks from all channels are queued and decoded in
    [batch_size, chunk_len] groups through ONE shared compiled program
    (full batches are decoded eagerly inside feed(); poll() forces the
    remainder — call it on a latency deadline).  Per-channel results
    are byte-identical to a solo StreamingBasecaller with the same
    parameters (tests/test_streaming.py).

    feed(key, samples) -> new bases for THAT channel; bases decoded for
    other channels in the same batch are buffered and returned by their
    next feed()/poll()/flush()/collect() call.
    """

    def __init__(self, model: str = "rgrgr_r94", chunk_len: int = 10000,
                 overlap: int = 1000, batch_size: int = 8, *,
                 mesh=None, min_prob: float = 1e-5, tempW: float = 1.0,
                 tempb: float = 1.0, stay_pen: float = 0.0,
                 skip_pen: float = 0.0, local_pen: float = 2.0,
                 use_slip: bool = False, ensemble: tuple[str, ...] = (),
                 ensemble_weights: tuple[float, ...] | None = None,
                 **stream_kwargs):
        from scrappie_tpu.parallel.sharding import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        self.model = model
        self.spec = RAW_MODELS[model]
        self.chunk_len, self.overlap = chunk_len, overlap
        self._decode_args = (float(stay_pen), float(skip_pen),
                             float(local_pen), bool(use_slip))
        self._min_prob, self._tempW, self._tempb = min_prob, tempW, tempb
        self._ensemble = tuple(ensemble)
        from scrappie_tpu.models.ensemble import fused_config

        self._ens_fused = fused_config(model, self._ensemble,
                                       ensemble_weights)
        self._params, self._posterior = _build_posterior(
            model, min_prob, tempW, tempb, ensemble=self._ensemble,
            ensemble_weights=ensemble_weights)
        # Data-parallel over the mesh like the batch engine: live
        # serving should light up every chip, not one
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = -(-batch_size // self.mesh.shape["data"]) \
            * self.mesh.shape["data"]
        if self._ensemble:
            self._params = tuple(shard_params(p, self.mesh)
                                 for p in self._params)
        else:
            self._params = shard_params(self._params, self.mesh)
        self._batch_sharding = batch_sharding(self.mesh)
        self._stream_kwargs = dict(stream_kwargs, min_prob=min_prob,
                                   tempW=tempW, tempb=tempb,
                                   stay_pen=stay_pen, skip_pen=skip_pen,
                                   local_pen=local_pen, use_slip=use_slip)
        self._streams: dict = {}
        self._queue: list[tuple] = []        # (key, start, window) FIFO
        self._outbuf: dict[object, list[str]] = {}

    # ------------------------------------------------------------ streams

    def add_stream(self, key, **kwargs) -> StreamingBasecaller:
        if key in self._streams:
            raise KeyError(f"stream {key!r} already exists")
        kw = {**self._stream_kwargs, **kwargs}
        sb = StreamingBasecaller(self.model, self.chunk_len, self.overlap,
                                 decode_fn=self._decode_one, **kw)
        self._streams[key] = sb
        self._outbuf[key] = []
        return sb

    def stream(self, key) -> StreamingBasecaller:
        return self._streams[key]

    # ------------------------------------------------------------ decode

    def _decode_batch_input(self, xs: np.ndarray):
        """[B<=batch_size, chunk_len] -> (emissions [B, nb], scores [B]);
        pads to batch_size so the shared program compiles once."""
        import jax

        n = len(xs)
        if n < self.batch_size:
            xs = np.concatenate(
                [xs, np.zeros((self.batch_size - n, self.chunk_len),
                              np.float32)])
        from scrappie_tpu import ops

        x = jax.device_put(xs[..., None], self._batch_sharding)
        if self.spec.kind == "rgrgr" and not self._ensemble \
                and ops.pallas_enabled():
            # fully-fused chunk pipeline (ops/pipeline.py): the
            # [B, nblock, 1025] posterior never materialises in HBM —
            # the same path the batch engine's fast mode uses
            from scrappie_tpu.ops.pipeline import rgrgr_basecall_fused

            scores, paths = rgrgr_basecall_fused(
                self._params, x, conv_activation=self.spec.conv_activation,
                stride=self.spec.stride, min_prob=self._min_prob,
                tempW=self._tempW, tempb=self._tempb,
                stay_pen=self._decode_args[0], skip_pen=self._decode_args[1],
                local_pen=self._decode_args[2], use_slip=self._decode_args[3])
            return paths[:n, 1:], scores[:n]
        if self._ens_fused is not None and ops.pallas_enabled():
            # fused multi-model chunk pipeline (round 5; same program
            # family the engine's fast-mode ensemble uses): one device
            # call per batch instead of posterior-then-decode
            from scrappie_tpu.ops.pipeline import ensemble_basecall_fused

            w, kinds, acts = self._ens_fused
            scores, paths = ensemble_basecall_fused(
                self._params, w, x, kinds=kinds, conv_activations=acts,
                stride=self.spec.stride, min_prob=self._min_prob,
                tempW=self._tempW, tempb=self._tempb,
                stay_pen=self._decode_args[0], skip_pen=self._decode_args[1],
                local_pen=self._decode_args[2], use_slip=self._decode_args[3])
            return paths[:n, 1:], scores[:n]
        lp = self._posterior(self._params, x)
        if self.spec.kind == "rnnrf":
            if ops.pallas_enabled():
                # device-side CRF Viterbi (see _decode): no host
                # round-trip of the transition tensor
                from scrappie_tpu.ops.crf import crf_viterbi_kernel

                scores, paths = crf_viterbi_kernel(lp)
                return paths[:n, :-1], scores[:n]
            # decode_crf materialises internally (np); already sliced
            scores, paths = decode_crf(np.asarray(lp))
            return np.asarray(paths)[:n, :-1], np.asarray(scores)[:n]
        # returned lazily (async dispatch): callers np.asarray at
        # collect time, after every eligible batch has been dispatched
        scores, paths = viterbi_decode_batch(lp, *self._decode_args)
        return paths[:n, 1:], scores[:n]

    def _decode_one(self, x: np.ndarray):
        """decode_fn for member streams (flush-time tail chunks): one
        window through the shared batched program."""
        emis, scores = self._decode_batch_input(x[None])
        return emis[0], float(scores[0])

    def _run_queue(self, everything: bool) -> None:
        # dispatch every eligible batch before materialising any (JAX
        # dispatch is async — the same double buffering as the engine);
        # commits stay in FIFO order, which preserves per-channel order
        pending = []
        while (len(self._queue) >= self.batch_size
               or (everything and self._queue)):
            group = self._queue[: self.batch_size]
            del self._queue[: len(group)]
            xs = np.stack([w for _, _, w in group])
            pending.append((group, self._decode_batch_input(xs)))
        for group, (emis_d, scores_d) in pending:
            emis = np.asarray(emis_d)    # one transfer per batch
            scores = np.asarray(scores_d)
            for (key, start, _), e, s in zip(group, emis, scores):
                bases = self._streams[key]._commit_chunk(start, e, float(s))
                if bases:
                    self._outbuf[key].append(bases)

    def decode_pending(self) -> None:
        """Force-decode all queued chunks WITHOUT collecting: decoded
        bases stay in each channel's buffer for its next
        feed()/collect()/flush().  This is the latency-deadline hook
        for a server poller (poll() would hand the bases to the poller
        and they would never reach the client)."""
        self._run_queue(everything=True)

    def collect(self, key) -> str:
        """Bases decoded for `key` since its last feed/poll/collect."""
        out = "".join(self._outbuf[key])
        self._outbuf[key].clear()
        return out

    # ------------------------------------------------------------ public

    def feed(self, key, samples) -> str:
        """Buffer samples for one channel; decode any full batches; new
        bases for this channel (other channels' bases are buffered)."""
        sb = self._streams[key]
        sb.append_samples(samples)
        while sb._chunk_ready():
            start, x = sb._reserve_chunk()
            self._queue.append((key, start, x))
        self._run_queue(everything=False)
        return self.collect(key)

    def poll(self) -> dict:
        """Force-decode all queued chunks (latency deadline); returns
        {key: new bases} for every channel that gained bases."""
        self._run_queue(everything=True)
        out = {k: self.collect(k) for k in self._outbuf}
        return {k: v for k, v in out.items() if v}

    def flush(self, key) -> str:
        """Finish one channel: decode its queued chunks, then its tail.
        Returns ALL remaining bases for the channel."""
        mine = [q for q in self._queue if q[0] == key]
        if mine:
            # decode everything queued up to and including this
            # channel's chunks (order within a channel must hold)
            self._run_queue(everything=True)
        tail = self._streams[key].flush()
        if tail:
            self._outbuf[key].append(tail)
        return self.collect(key)

    def close_stream(self, key) -> None:
        """Drop a channel's state (call after flush(); a live server
        would otherwise accumulate finished channels forever).  Unflushed
        queued chunks for the channel are discarded."""
        self._queue = [q for q in self._queue if q[0] != key]
        self._streams.pop(key, None)
        self._outbuf.pop(key, None)

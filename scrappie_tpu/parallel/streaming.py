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
(ref src/util.c:190), which a stream cannot do.  Instead the scale is
calibrated once from the first `min(calib_samples, chunk_len)` samples
(a window deterministic in the signal alone) and then frozen
— the behaviour of a live channel calibrated on its opening window.
Pass `normalise=False` to feed pre-normalised signal.

For many concurrent streams, batch chunks across reads with the
serving layer (scrappie_tpu/serve.py) instead of one StreamingBasecaller
per channel.
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


class StreamingBasecaller:
    """Incremental basecaller for one read/channel.

    feed(samples) -> str   newly committed bases (possibly "")
    flush() -> str         decode + commit the tail; stream is finished
    .sequence              all bases committed so far
    .score                 kept-block-weighted decode score so far
    """

    def __init__(self, model: str = "rgrgr_r94", chunk_len: int = 10000,
                 overlap: int = 1000, *, normalise: bool = True,
                 calib_samples: int = 8000, min_prob: float = 1e-5,
                 tempW: float = 1.0, tempb: float = 1.0, stay_pen: float = 0.0,
                 skip_pen: float = 0.0, local_pen: float = 2.0,
                 use_slip: bool = False):
        import functools

        import jax
        import jax.numpy as jnp

        from scrappie_tpu.models import forward, registry

        self.model = model
        self.spec = RAW_MODELS[model]
        stride = self.spec.stride
        if chunk_len % stride or overlap % stride:
            raise ValueError("chunk_len and overlap must be stride multiples")
        if not 0 < overlap < chunk_len:
            raise ValueError("need 0 < overlap < chunk_len")
        self.chunk_len, self.overlap = chunk_len, overlap
        self.hop = chunk_len - overlap
        self.normalise = normalise
        self.calib_samples = calib_samples
        self._decode_args = (float(stay_pen), float(skip_pen),
                             float(local_pen), bool(use_slip))

        params = registry.load_params(model)
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        kwargs = dict(stride=stride, min_prob=min_prob, tempW=tempW,
                      tempb=tempb, return_log=True)
        if self.spec.kind == "rgrgr":
            fn = functools.partial(forward.rgrgr_posterior,
                                   conv_activation=self.spec.conv_activation,
                                   **kwargs)
        elif self.spec.kind == "rnnrf":
            fn = functools.partial(forward.rnnrf_transitions,
                                   conv_activation=self.spec.conv_activation,
                                   stride=stride)
        else:
            fn = functools.partial(forward.raw_posterior, **kwargs)
        self._posterior = jax.jit(lambda p, x: fn(p, x))

        # stream state
        self._parts: list[np.ndarray] = []   # raw samples from _base_off on
        self._buf_len = 0                    # samples held in _parts
        self._base_off = 0                   # samples dropped from the front
        self._nfed = 0                       # total samples ever fed
        self._next_start = 0                 # sample start of the next chunk
        self._committed_hi = 0               # global blocks committed
        self._pending = None                 # (emissions, f_blk) last chunk
        self._last_kmer: int | None = None   # kmer context across commits
        self._med = self._mad = None
        self._seq_parts: list[str] = []
        self._score = 0.0
        self._done = False

    # ------------------------------------------------------------- buffer

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

    def _compact(self) -> None:
        # keep everything a flush-time right-aligned final chunk could
        # still need (f >= next_start - chunk_len), and the calibration
        # window until calibration has happened
        if self._med is None and self.normalise:
            return
        keep_from = max(self._base_off, self._next_start - self.chunk_len)
        buf = self._buffer()
        drop = keep_from - self._base_off
        if drop > 0:
            self._parts = [buf[drop:]]
            self._base_off = keep_from
            self._buf_len = len(self._parts[0])

    def _maybe_calibrate(self, force: bool = False) -> None:
        if not self.normalise or self._med is not None:
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

    def _decode_chunk(self, start: int) -> tuple[np.ndarray, float]:
        """Decode the chunk at sample `start`; returns (per-block
        emissions [nblock_chunk], chunk score)."""
        import jax.numpy as jnp

        x = self._window(start, self.chunk_len)
        if self.normalise:
            x = (x - self._med) / self._mad
        lp = self._posterior(self.params, jnp.asarray(x, jnp.float32)[None, :, None])
        if self.spec.kind == "rnnrf":
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

    def _commit(self, emissions: np.ndarray, f_blk: int, lo: int, hi: int,
                score: float) -> str:
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

    def feed(self, samples) -> str:
        if self._done:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples, dtype=np.float32).ravel()
        if len(samples):
            self._parts.append(samples)
            self._buf_len += len(samples)
            self._nfed += len(samples)
        out: list[str] = []
        stride = self.spec.stride
        ov_blk = self.overlap // stride
        hop_blk = self.hop // stride
        while self._nfed >= self._next_start + self.chunk_len:
            self._maybe_calibrate(force=True)
            start = self._next_start
            f_blk = start // stride
            emissions, score = self._decode_chunk(start)
            hi = f_blk + hop_blk + ov_blk // 2  # midpoint with the NEXT chunk
            if start == 0:
                lo = 0
            else:
                lo = self._committed_hi
            out.append(self._commit(emissions, f_blk, lo, hi, score))
            self._pending = (emissions, f_blk, score)
            self._next_start += self.hop
            self._compact()
        return "".join(out)

    def flush(self) -> str:
        if self._done:
            raise RuntimeError("stream already flushed")
        self._done = True
        nsample = self._nfed
        if nsample == 0:
            return ""
        stride = self.spec.stride
        total = -(-nsample // stride)
        self._maybe_calibrate(force=True)
        if self._committed_hi >= total:
            return ""
        if self._pending is None:
            # short read: a single (reflect-padded) chunk covers it all
            emissions, score = self._decode_chunk(0)
            return self._commit(emissions, 0, 0, total, score)
        emissions, prev_f_blk, prev_score = self._pending
        prev_start = self._next_start - self.hop
        if nsample <= prev_start + self.chunk_len:
            # the last decoded chunk already covers the tail
            return self._commit(emissions, prev_f_blk, self._committed_hi,
                                total, prev_score)
        # right-aligned final chunk over the tail (ceil-stride-aligned,
        # like chunk.plan_chunks' last chunk)
        f = max(0, -(-(nsample - self.chunk_len) // stride) * stride)
        f = min(f, prev_start + self.hop)
        emissions, score = self._decode_chunk(f)
        return self._commit(emissions, f // stride, self._committed_hi, total,
                            score)

"""Streaming events-pipeline basecalling (live signal -> events -> bases).

The raw streaming module (parallel/streaming.py) streams the raw
pipeline; this streams the reference's `scrappie events` pipeline
(detect events -> nanonet biLSTM -> transducer decode, ref
src/scrappie_events.c:271-344) — the most accurate model on the
bundled real reads (BASELINE.md).

Design: the same fixed sample-chunk geometry as raw streaming, but the
per-chunk program is the whole events pipeline, and commits are by
EVENT START SAMPLE at the raw geometry's overlap-midpoint boundaries:

  - events are detected per chunk (the t-stat peak state machine
    resets at every emitted peak, so interior events match whole-read
    detection; only events near chunk edges can differ, and those are
    never committed);
  - features are studentised with statistics FROZEN from the first
    chunk (the batch pipeline studentises over the whole read, which a
    stream cannot; the window is deterministic in the signal, so
    output stays increment-invariant);
  - per-chunk event counts vary, so features are reflect-padded and
    the log-posterior neutral-padded to a fixed event bucket — one
    compile for every chunk;
  - an event is committed once its start sample can no longer fall
    inside a future chunk's kept region (midpoint rule).  Event
    boundaries ARE re-derived per chunk, so a junction event can
    occasionally differ from the whole-read pipeline — the same class
    of deviation as the raw fast-mode path stitch.

Dwell homopolymer correction needs whole-read dwell calibration
(ref src/decode.c:645-694) and is unavailable online, like
posterior-mean homopolymer correction in the raw fast mode.
"""

from __future__ import annotations

import numpy as np

from scrappie_tpu.decode.transducer import viterbi_decode_batch
from scrappie_tpu.models.specs import NSTATE_TRANSDUCER
from scrappie_tpu.parallel.chunk import neutral_pad_logpost
from scrappie_tpu.post.overlapper import kmer_len_from_nkmer, overlapper
from scrappie_tpu.signal.events import EVENT_DETECTION_DEFAULTS, detect_events
from scrappie_tpu.signal.features import nanonet_features_from_events
from scrappie_tpu.types import RawSignal


class EventsStreamingBasecaller:
    """Incremental events-pipeline basecaller for one read/channel.

    feed(samples) -> str   newly committed bases (possibly "")
    flush() -> str         process the tail; stream is finished
    .sequence / .score / .nevent
    """

    def __init__(self, chunk_len: int = 10000, overlap: int = 2000, *,
                 event_bucket: int | None = None, trim_start: int = 0,
                 min_prob: float = 1e-5, tempW: float = 1.0,
                 tempb: float = 1.0, stay_pen: float = 0.0,
                 skip_pen: float = 0.0, local_pen: float = 2.0,
                 use_slip: bool = False,
                 detection=EVENT_DETECTION_DEFAULTS):
        import functools

        import jax

        from scrappie_tpu.models import forward, registry

        if not 0 < overlap < chunk_len:
            raise ValueError("need 0 < overlap < chunk_len")
        self.chunk_len, self.overlap = int(chunk_len), int(overlap)
        self.hop = self.chunk_len - self.overlap
        # ~1 event / 10 samples typical; 1/4 is a generous ceiling
        self.event_bucket = event_bucket or -(-self.chunk_len // 4) // 256 * 256
        self.detection = detection
        self._decode_args = (float(stay_pen), float(skip_pen),
                             float(local_pen), bool(use_slip))
        self._trim_left = int(trim_start)

        params = registry.load_params("nanonet_events")
        import jax.numpy as jnp

        self._params = {k: jnp.asarray(v) for k, v in params.items()}
        self._posterior = jax.jit(functools.partial(
            forward.events_posterior, min_prob=min_prob, tempW=tempW,
            tempb=tempb, return_log=True))

        # stream state
        self._parts: list[np.ndarray] = []
        self._base_off = 0
        self._nfed = 0
        self._next_start = 0
        self._committed_hi = 0           # SAMPLE coordinate
        self._last_chunk = None          # (starts, emissions, s, score, nev)
        self._last_kmer: int | None = None
        self._feat_stats = None          # frozen (m*rsd, rsd) float32 [4]
        self._seq_parts: list[str] = []
        self._score = 0.0
        self._nevent = 0
        self._done = False

    # ------------------------------------------------------------- buffer

    def _buffer(self) -> np.ndarray:
        if len(self._parts) > 1:
            self._parts = [np.concatenate(self._parts)]
        return self._parts[0] if self._parts else np.zeros(0, np.float32)

    def _window(self, start: int, length: int) -> np.ndarray:
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
        keep_from = max(self._base_off, self._next_start - self.chunk_len)
        buf = self._buffer()
        drop = keep_from - self._base_off
        if drop > 0:
            self._parts = [buf[drop:]]
            self._base_off = keep_from

    # ------------------------------------------------------------- chunk

    def _chunk_events(self, start: int):
        """Run the events pipeline on the chunk at `start`: returns
        (event start samples in STREAM coords [nev], per-event path
        emissions [nev], chunk score, nev)."""
        x = self._window(start, self.chunk_len)
        et = detect_events(RawSignal(x), self.detection)
        feats = nanonet_features_from_events(et, normalise=False)
        nev = len(feats)
        if nev > self.event_bucket:
            from scrappie_tpu.utils.tracing import log

            log("warn", "event bucket overflow; truncating chunk tail",
                nev=nev, bucket=self.event_bucket)
            feats = feats[: self.event_bucket]
            nev = self.event_bucket
        if self._feat_stats is None:
            # frozen studentisation stats: first chunk only (its window
            # is deterministic in the signal — [0, chunk_len) or, for a
            # short read, the single flush window)
            m = feats.astype(np.float64).mean(axis=0)
            v = (feats.astype(np.float64) ** 2).mean(axis=0) - m * m
            safe = v > 0.0
            rsd = np.where(safe, 1.0 / np.sqrt(np.where(safe, v, 1.0)), 0.0)
            self._feat_stats = (
                (m * rsd).astype(np.float32), rsd.astype(np.float32))
        mrsd, rsd = self._feat_stats
        sfeats = feats * rsd - mrsd

        # reflect-pad features to the bucket so the net sees one shape;
        # pad rows have plausible statistics and are never committed
        pad = self.event_bucket - nev
        if pad:
            refl = sfeats[::-1]
            reps = -(-pad // max(len(refl), 1))
            sfeats = np.concatenate(
                [sfeats, np.tile(refl, (reps, 1))[:pad]]) if nev else \
                np.zeros((self.event_bucket, 4), np.float32)

        import jax.numpy as jnp

        lp = np.asarray(self._posterior(
            self._params, jnp.asarray(sfeats, jnp.float32)[None]))[0]
        # neutral-pad the tail so pad events decode to stays
        lp = neutral_pad_logpost(lp[:nev], self.event_bucket,
                                 self._decode_args[0])
        scores, paths = viterbi_decode_batch(
            jnp.asarray(lp)[None], *self._decode_args)
        # emission for event i = path entry i (ref src/scrappie_events.c:301
        # stitches path[:nev])
        emissions = np.asarray(paths)[0][: nev]
        starts = (et.active["start"][:nev].astype(np.int64) + start)
        return starts, emissions, float(np.asarray(scores)[0]), nev

    def _emit(self, seg: np.ndarray) -> str:
        seg = np.asarray(seg)
        nonstay = seg >= 0
        if not nonstay.any():
            return ""
        if self._last_kmer is None:
            out = overlapper(seg, NSTATE_TRANSDUCER - 1) or ""
        else:
            ext = np.concatenate([[self._last_kmer], seg])
            klen = kmer_len_from_nkmer(NSTATE_TRANSDUCER - 1)
            out = (overlapper(ext, NSTATE_TRANSDUCER - 1) or "")[klen:]
        self._last_kmer = int(seg[nonstay][-1])
        return out

    def _commit(self, starts, emissions, lo: int, hi: int, score: float,
                nev: int) -> str:
        """Commit events with start sample in [lo, hi)."""
        sel = (starts >= lo) & (starts < hi)
        n = int(sel.sum())
        self._committed_hi = hi
        if n == 0:
            return ""
        bases = self._emit(emissions[sel])
        self._nevent += n
        self._score += score * n / max(nev, 1)
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
    def nevent(self) -> int:
        return self._nevent

    def feed(self, samples) -> str:
        if self._done:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples, dtype=np.float32).ravel()
        if self._trim_left:
            drop = min(self._trim_left, len(samples))
            samples = samples[drop:]
            self._trim_left -= drop
        if len(samples):
            self._parts.append(samples)
            self._nfed += len(samples)
        out: list[str] = []
        while not self._done and self._nfed >= self._next_start + self.chunk_len:
            s = self._next_start
            starts, emissions, score, nev = self._chunk_events(s)
            hi = s + self.hop + self.overlap // 2
            lo = 0 if s == 0 else self._committed_hi
            out.append(self._commit(starts, emissions, lo, hi, score, nev))
            self._last_chunk = (starts, emissions, s, score, nev)
            self._next_start += self.hop
            self._compact()
        return "".join(out)

    def flush(self) -> str:
        if self._done:
            raise RuntimeError("stream already flushed")
        self._done = True
        nsample = self._nfed
        if nsample == 0 or self._committed_hi >= nsample:
            return ""
        if self._last_chunk is None:
            starts, emissions, score, nev = self._chunk_events(0)
            return self._commit(starts, emissions, 0, nsample, score, nev)
        starts, emissions, prev_s, score, nev = self._last_chunk
        prev_start = self._next_start - self.hop
        if nsample <= prev_start + self.chunk_len:
            return self._commit(starts, emissions, self._committed_hi,
                                nsample, score, nev)
        f = max(0, nsample - self.chunk_len)
        f = min(f, prev_start + self.hop)
        starts, emissions, score, nev = self._chunk_events(f)
        return self._commit(starts, emissions, self._committed_hi, nsample,
                            score, nev)

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
  - features are studentised with PREFIX statistics — running mean/var
    over all events seen so far — converging to the whole-read
    statistics the batch pipeline uses (which a stream cannot know
    up front); chunk boundaries are fixed stream coordinates, so the
    stats are deterministic in the signal and output stays
    increment-invariant (`stats_mode="frozen"` keeps the round-2
    frozen-first-chunk behaviour);
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
from scrappie_tpu.parallel.streaming import SampleBufferMixin
from scrappie_tpu.post.overlapper import kmer_len_from_nkmer, overlapper
from scrappie_tpu.signal.events import EVENT_DETECTION_DEFAULTS, detect_events
from scrappie_tpu.signal.features import (
    apply_feature_stats,
    feature_stats,
    nanonet_features_from_events,
)
from scrappie_tpu.types import RawSignal


def _build_events_program(min_prob: float, tempW: float, tempb: float,
                          stay_pen: float, skip_pen: float,
                          local_pen: float, use_slip: bool):
    """One jitted device program for the whole chunk pipeline's device
    half: posterior -> per-row neutral masking of pad events -> Viterbi
    decode.  The [B, bucket, 1025] posterior never leaves the device —
    round 3 measured the old host round-trip (posterior out, padded
    posterior back in) at ~10k samples/s aggregate over this
    environment's tunnel; only [B] scores and [B, bucket+1] int paths
    transfer now.  The neutral mask reproduces
    chunk.neutral_pad_logpost exactly (stay log-prob +stay_pen, -1e30
    elsewhere), so outputs are bit-identical to the round-2/3 path."""
    import functools

    import jax
    import jax.numpy as jnp

    from scrappie_tpu.models import forward, registry

    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("nanonet_events").items()}

    @jax.jit
    def net_decode(p, feats, nev):
        lp = forward.events_posterior(p, feats, min_prob=min_prob,
                                      tempW=tempW, tempb=tempb,
                                      return_log=True)
        ns = lp.shape[-1]
        neutral = jnp.full((ns,), -1e30, lp.dtype).at[ns - 1].set(stay_pen)
        pad_row = jnp.arange(lp.shape[1])[None, :] >= nev[:, None]
        lp = jnp.where(pad_row[:, :, None], neutral, lp)
        return viterbi_decode_batch(lp, stay_pen, skip_pen, local_pen,
                                    use_slip)

    return params, net_decode


class EventsStreamingBasecaller(SampleBufferMixin):
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
                 use_slip: bool = False, stats_mode: str = "prefix",
                 feature_stats_override=None,
                 detection=EVENT_DETECTION_DEFAULTS, events_fn=None):
        if not 0 < overlap < chunk_len:
            raise ValueError("need 0 < overlap < chunk_len")
        self.chunk_len, self.overlap = int(chunk_len), int(overlap)
        self.hop = self.chunk_len - self.overlap
        # ~1 event / 5-10 samples typical; 1/4 is a generous ceiling
        # (rounded UP to the 256 lane bucket)
        self.event_bucket = event_bucket or -(-self.chunk_len // 4 // 256) * 256
        self.detection = detection
        self._decode_args = (float(stay_pen), float(skip_pen),
                             float(local_pen), bool(use_slip))
        self._posterior_opts = (float(min_prob), float(tempW), float(tempb))
        if stats_mode not in ("prefix", "frozen", "fixed"):
            raise ValueError(f"unknown stats_mode {stats_mode!r}")
        if stats_mode == "fixed":
            if feature_stats_override is None:
                raise ValueError(
                    "stats_mode='fixed' needs feature_stats_override="
                    "(mean*rsd, rsd) float32[4] pairs (e.g. from "
                    "signal.features.feature_stats on a calibration read)")
            self._fixed_stats = (
                np.asarray(feature_stats_override[0], np.float32),
                np.asarray(feature_stats_override[1], np.float32))
        self._stats_mode = stats_mode
        self._trim_left = int(trim_start)
        # events_fn: injected device half (EventsStreamingBatcher)
        # mapping (padded feats, nev) -> (emissions [nev], score);
        # without it a batch-1 program is built lazily on first use
        self._events_fn = events_fn or self._net_decode_single
        self._own_program = None

        # stream state
        self._parts: list[np.ndarray] = []
        self._base_off = 0
        self._nfed = 0
        self._next_start = 0
        self._reserved = 0               # chunks reserved, not committed
        self._committed_hi = 0           # SAMPLE coordinate
        self._last_chunk = None          # (starts, emissions, s, score, nev)
        self._last_kmer: int | None = None
        self._feat_stats = None          # frozen (m*rsd, rsd) float32 [4]
        # prefix mode: running moment accumulators over every healthy
        # prepared chunk's events (float64, like feature_stats)
        self._stats_n = 0
        self._stats_s1 = np.zeros(4, np.float64)
        self._stats_s2 = np.zeros(4, np.float64)
        self._seq_parts: list[str] = []
        self._score = 0.0
        self._nevent = 0
        self._done = False

    # ------------------------------------------------------------- chunk

    def _prepare_chunk(self, start: int):
        """Host half of the chunk pipeline: detect events, studentise
        with the frozen stats, reflect-pad to the bucket.  Returns
        (event start samples in STREAM coords [nev], padded features
        [event_bucket, 4], nev, coverage-end sample).

        The coverage end is `start + chunk_len` unless the bucket
        overflowed, in which case it is the first TRUNCATED event's
        start — commits are capped there so the dropped region is
        re-detected (and emitted) by the next chunk instead of being
        silently skipped."""
        x = self._window(start, self.chunk_len)
        et = detect_events(RawSignal(x), self.detection)
        feats = nanonet_features_from_events(et, normalise=False)
        nev = len(feats)
        cov = start + self.chunk_len
        if nev > self.event_bucket:
            from scrappie_tpu.utils.tracing import log

            cov = start + int(et.active["start"][self.event_bucket])
            log("warn", "event bucket overflow; deferring chunk tail "
                        "to the next chunk", nev=nev,
                bucket=self.event_bucket, coverage_end=cov)
            feats = feats[: self.event_bucket]
            nev = self.event_bucket
        sfeats = apply_feature_stats(feats, self._select_stats(feats, nev))

        # reflect-pad features to the bucket so the net sees one shape;
        # pad rows have plausible statistics and are never committed
        pad = self.event_bucket - nev
        if pad:
            refl = sfeats[::-1]
            reps = -(-pad // max(len(refl), 1))
            sfeats = np.concatenate(
                [sfeats, np.tile(refl, (reps, 1))[:pad]]) if nev else \
                np.zeros((self.event_bucket, 4), np.float32)
        starts = (et.active["start"][:nev].astype(np.int64) + start)
        return starts, np.asarray(sfeats, np.float32), nev, cov

    @staticmethod
    def _chunk_healthy(feats: np.ndarray, nev: int) -> bool:
        """No pathological dwell outlier: a pore stall produces one huge
        event whose length/stdv would dominate mean/var statistics (they
        are outlier-dominated, as in the reference's whole-read
        studentisation, ref src/nnfeatures.c:46-72)."""
        if nev < 1:
            return False
        lens = feats[:nev, 2]
        return float(lens.max()) <= 50.0 * max(float(np.median(lens)), 1.0)

    def _select_stats(self, feats: np.ndarray, nev: int):
        """Studentisation statistics for this chunk's features.

        Both modes are deterministic in the signal prefix — chunk start
        positions are fixed stream coordinates — so output stays
        increment-invariant either way.

        'prefix' (default): running mean/var over every healthy prepared
        chunk's events so far, converging to the whole-read statistics
        the batch pipeline uses (worth +0.03/+0.05 identity there;
        measured streaming gain in BASELINE.md).  Events in chunk
        overlaps are counted once per preparation; the double count is
        deterministic and statistically harmless.

        'frozen': statistics frozen from the first HEALTHY chunk (enough
        events, every feature informative) — the round-2 behaviour, kept
        for comparison.  A degenerate opener — e.g. a blocked pore
        producing one flat event, hence zero variance — must NOT freeze
        all-zero scales that would blank every later chunk's features;
        until a healthy chunk arrives, stats are per-chunk.

        'fixed' (round 3): externally supplied statistics — e.g. from a
        calibration read on the same channel, or (in the gap-attribution
        experiment, BASELINE.md) the oracle whole-read statistics."""
        if self._stats_mode == "fixed":
            return self._fixed_stats
        if self._stats_mode == "prefix":
            # nev >= 32 makes the median in the dwell guard meaningful
            # (a stalled chunk's single huge event IS its own median)
            if nev >= 32 and self._chunk_healthy(feats, nev):
                f64 = feats[:nev].astype(np.float64)
                self._stats_n += nev
                self._stats_s1 += f64.sum(axis=0)
                self._stats_s2 += (f64 * f64).sum(axis=0)
            if self._stats_n >= 32:
                m = self._stats_s1 / self._stats_n
                v = self._stats_s2 / self._stats_n - m * m
                if (v > 0.0).all():
                    rsd = 1.0 / np.sqrt(v)
                    return (m * rsd).astype(np.float32), rsd.astype(np.float32)
            # degenerate opening (few/stalled/constant events): fall back
            # to per-chunk stats until the accumulator is informative
            return feature_stats(feats)
        stats = self._feat_stats
        if stats is None:
            stats = feature_stats(feats)
            healthy = (nev >= 32 and bool((stats[1] > 0).all())
                       and self._chunk_healthy(feats, nev))
            if healthy:
                self._feat_stats = stats
        return stats

    def _net_decode_single(self, sfeats: np.ndarray, nev: int):
        """Device half, batch 1: one fused net+mask+decode program; the
        posterior never leaves the device.  Returns (per-event path
        emissions [nev], chunk score)."""
        import jax.numpy as jnp

        if self._own_program is None:
            self._own_program = _build_events_program(
                *self._posterior_opts, *self._decode_args)
        params, net_decode = self._own_program
        scores, paths = net_decode(params, jnp.asarray(sfeats)[None],
                                   jnp.asarray([nev], jnp.int32))
        # emission for event i = path entry i (ref src/scrappie_events.c:301
        # stitches path[:nev])
        return np.asarray(paths)[0][:nev], float(np.asarray(scores)[0])

    def _chunk_events(self, start: int):
        """Whole chunk pipeline (host prep + device decode)."""
        starts, sfeats, nev, cov = self._prepare_chunk(start)
        emissions, score = self._events_fn(sfeats, nev)
        return starts, emissions, score, nev, cov

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

    def append_samples(self, samples) -> None:
        """Buffer samples without decoding (EventsStreamingBatcher)."""
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

    def _chunk_ready(self) -> bool:
        return (not self._done
                and self._nfed >= self._next_start + self.chunk_len)

    def _reserve_chunk(self):
        """Claim the next ready chunk: host prep now, device decode
        later; commits must follow reservation order."""
        s = self._next_start
        prep = self._prepare_chunk(s)
        self._next_start += self.hop
        self._reserved += 1
        self._compact()
        return s, prep

    def _commit_chunk(self, s: int, starts, emissions, score: float,
                      nev: int, cov: int | None = None) -> str:
        hi = s + self.hop + self.overlap // 2
        lo = 0 if s == 0 else self._committed_hi
        if cov is not None:  # bucket overflow: defer the dropped tail
            hi = max(min(hi, cov), lo)
        bases = self._commit(starts, np.asarray(emissions), lo, hi,
                             float(score), nev)
        self._last_chunk = (starts, np.asarray(emissions), s, float(score),
                            nev)
        self._reserved -= 1
        return bases

    def feed(self, samples) -> str:
        self.append_samples(samples)
        out: list[str] = []
        while self._chunk_ready():
            s, (starts, sfeats, nev, cov) = self._reserve_chunk()
            emissions, score = self._events_fn(sfeats, nev)
            out.append(self._commit_chunk(s, starts, emissions, score, nev,
                                          cov))
        return "".join(out)

    def flush(self) -> str:
        if self._done:
            raise RuntimeError("stream already flushed")
        if self._reserved:
            raise RuntimeError("reserved chunks not yet committed "
                               "(EventsStreamingBatcher must drain first)")
        self._done = True
        nsample = self._nfed
        if nsample == 0 or self._committed_hi >= nsample:
            return ""
        if self._last_chunk is None:
            starts, emissions, score, nev, _cov = self._chunk_events(0)
            return self._commit(starts, emissions, 0, nsample, score, nev)
        starts, emissions, prev_s, score, nev = self._last_chunk
        prev_start = self._next_start - self.hop
        if nsample <= prev_start + self.chunk_len:
            return self._commit(starts, emissions, self._committed_hi,
                                nsample, score, nev)
        f = max(0, nsample - self.chunk_len)
        f = min(f, prev_start + self.hop)
        starts, emissions, score, nev, _cov = self._chunk_events(f)
        return self._commit(starts, emissions, self._committed_hi, nsample,
                            score, nev)


class EventsStreamingBatcher:
    """Live events-pipeline basecalling of many channels with batched
    device work (the events analogue of streaming.StreamingBatcher).

    Event detection/features run host-side per chunk; the net + decode
    for ready chunks from ALL channels share one
    [batch_size, event_bucket] compiled program.  Per-channel output is
    byte-identical to a solo EventsStreamingBasecaller.
    """

    def __init__(self, chunk_len: int = 10000, overlap: int = 2000,
                 batch_size: int = 8, *, mesh=None, min_prob: float = 1e-5,
                 tempW: float = 1.0, tempb: float = 1.0,
                 stay_pen: float = 0.0, skip_pen: float = 0.0,
                 local_pen: float = 2.0, use_slip: bool = False,
                 **stream_kwargs):
        from scrappie_tpu.parallel.sharding import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        self.chunk_len, self.overlap = chunk_len, overlap
        self._decode_args = (float(stay_pen), float(skip_pen),
                             float(local_pen), bool(use_slip))
        self._params, self._net_decode = _build_events_program(
            min_prob, tempW, tempb, *self._decode_args)
        # Data-parallel over the mesh like the raw StreamingBatcher:
        # ready chunks from all channels shard over 'data'
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = -(-batch_size // self.mesh.shape["data"]) \
            * self.mesh.shape["data"]
        self._params = shard_params(self._params, self.mesh)
        self._batch_sharding = batch_sharding(self.mesh)
        self._stream_kwargs = dict(stream_kwargs, min_prob=min_prob,
                                   tempW=tempW, tempb=tempb,
                                   stay_pen=stay_pen, skip_pen=skip_pen,
                                   local_pen=local_pen, use_slip=use_slip)
        self._streams: dict = {}
        self._queue: list[tuple] = []  # (key, s, starts, sfeats, nev, cov)
        self._outbuf: dict[object, list[str]] = {}

    # ------------------------------------------------------------ streams

    def add_stream(self, key, **kwargs) -> EventsStreamingBasecaller:
        if key in self._streams:
            raise KeyError(f"stream {key!r} already exists")
        kw = {**self._stream_kwargs, **kwargs}
        sb = EventsStreamingBasecaller(self.chunk_len, self.overlap,
                                       events_fn=self._events_one, **kw)
        self._streams[key] = sb
        self._outbuf[key] = []
        return sb

    def stream(self, key) -> EventsStreamingBasecaller:
        return self._streams[key]

    # ------------------------------------------------------------ decode

    def _net_decode_batch(self, sfeats: np.ndarray, nevs: list[int]):
        """[B<=batch_size, event_bucket, 4] -> per-item (emissions, score);
        pads the batch so the shared program compiles once.  Device-side
        pipeline: the posterior is masked and decoded without ever
        reaching the host (see _build_events_program)."""
        import jax.numpy as jnp

        n, bucket = len(sfeats), sfeats.shape[1]
        if n < self.batch_size:
            sfeats = np.concatenate(
                [sfeats, np.zeros((self.batch_size - n, bucket, 4),
                                  np.float32)])
        nev_arr = np.zeros(self.batch_size, np.int32)
        nev_arr[:n] = nevs
        import jax

        feats_dev = jax.device_put(np.ascontiguousarray(sfeats),
                                   self._batch_sharding)
        scores, paths = self._net_decode(self._params, feats_dev,
                                         jnp.asarray(nev_arr))
        scores = np.asarray(scores)
        paths = np.asarray(paths)
        return [(paths[i][: nevs[i]], float(scores[i])) for i in range(n)]

    def _events_one(self, sfeats: np.ndarray, nev: int):
        """events_fn for member streams (flush-time chunks)."""
        return self._net_decode_batch(sfeats[None], [nev])[0]

    def _run_queue(self, everything: bool) -> None:
        while (len(self._queue) >= self.batch_size
               or (everything and self._queue)):
            group = self._queue[: self.batch_size]
            del self._queue[: len(group)]
            outs = self._net_decode_batch(
                np.stack([g[3] for g in group]),
                [g[4] for g in group])
            for (key, s, starts, _sf, nev, cov), (em, sc) in zip(group, outs):
                bases = self._streams[key]._commit_chunk(s, starts, em, sc,
                                                         nev, cov)
                if bases:
                    self._outbuf[key].append(bases)

    def decode_pending(self) -> None:
        """Force-decode queued chunks, leaving bases buffered (server
        poller hook; see streaming.StreamingBatcher.decode_pending)."""
        self._run_queue(everything=True)

    def collect(self, key) -> str:
        out = "".join(self._outbuf[key])
        self._outbuf[key].clear()
        return out

    # ------------------------------------------------------------ public

    def feed(self, key, samples) -> str:
        sb = self._streams[key]
        sb.append_samples(samples)
        while sb._chunk_ready():
            s, (starts, sfeats, nev, cov) = sb._reserve_chunk()
            self._queue.append((key, s, starts, sfeats, nev, cov))
        self._run_queue(everything=False)
        return self.collect(key)

    def poll(self) -> dict:
        self._run_queue(everything=True)
        out = {k: self.collect(k) for k in self._outbuf}
        return {k: v for k, v in out.items() if v}

    def flush(self, key) -> str:
        if any(q[0] == key for q in self._queue):
            self._run_queue(everything=True)
        tail = self._streams[key].flush()
        if tail:
            self._outbuf[key].append(tail)
        return self.collect(key)

    def close_stream(self, key) -> None:
        self._queue = [q for q in self._queue if q[0] != key]
        self._streams.pop(key, None)
        self._outbuf.pop(key, None)

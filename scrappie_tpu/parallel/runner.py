"""Batched multi-read basecalling engine.

Replaces the reference's OpenMP read-level fan-out
(src/scrappie_raw.c:334-426) with a TPU-shaped pipeline:

  host:   fast5 read -> trim -> normalise -> chunk        (numpy, cheap)
  device: [B, chunk_len] -> posterior [B, nblock, nstate] (one jit, batched)
  host:   stitch chunk posteriors per read                (numpy memcpy)
  device: bucketed batched Viterbi decode + backtrace
  host:   overlapper / homopolymer -> FASTA

All device programs have static shapes (fixed chunk length, bucketed
decode lengths), so everything compiles once and streams.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from scrappie_tpu.decode.crf import decode_crf
from scrappie_tpu.decode.transducer import viterbi_decode_batch
from scrappie_tpu.models import forward, registry
from scrappie_tpu.models.specs import EVENTS_MODEL, RAW_MODELS
from scrappie_tpu.parallel import chunk as chunklib
from scrappie_tpu.parallel.sharding import batch_sharding, make_mesh, shard_params
from scrappie_tpu.post.homopolymer import HomopolymerMode, homopolymer_path
from scrappie_tpu.post.overlapper import overlapper
from scrappie_tpu.decode.crf import crfpath_to_basecall
from scrappie_tpu.signal.trim import trim_and_segment_raw
from scrappie_tpu.types import RawSignal
from scrappie_tpu.utils.maths import medmad_normalise


@dataclasses.dataclass
class ReadResult:
    uuid: str | None
    sequence: str | None
    score: float
    nblock: int
    pos: np.ndarray | None
    trim_start: int
    trim_end: int
    nsample: int
    qual: str | None = None  # Phred+33, only with with_qualities=True
    events: object | None = None  # annotated EventTable (events model only)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("stay_pen", "skip_pen",
                                             "local_pen", "use_slip"))
def _gather_decode(post, flat_idx, stay_pen, skip_pen, local_pen, use_slip):
    """Stitch chunk posteriors into whole-read matrices ON DEVICE and
    decode them: post [N, nb, ns] chunk outputs, flat_idx [R, T] indices
    into the flattened blocks (index N*nb = appended neutral block, as
    chunk.neutral_pad_logpost builds host-side)."""
    N, nb, ns = post.shape
    flat = post.reshape(N * nb, ns)
    neutral = jnp.full((1, ns), -1e30, flat.dtype).at[0, ns - 1].set(stay_pen)
    flat = jnp.concatenate([flat, neutral], axis=0)
    lp = flat[flat_idx]  # [R, T, ns] whole-read stitched log posteriors
    return viterbi_decode_batch(lp, stay_pen, skip_pen, local_pen, use_slip)


@functools.partial(jax.jit, static_argnames=("impl",))
def _gather_decode_crf(trans, flat_idx, emit_bias, impl: str = "scan"):
    """CRF twin of _gather_decode: stitch chunk transition blocks ON
    DEVICE and Viterbi-decode them.  The appended neutral block allows
    only moves INTO the blank state at cost 0 (same construction as
    chunk.neutral_pad_crf builds host-side), so trailing pad blocks
    emit nothing and carry the real-block score unchanged.

    impl: 'kernel' = Pallas streamed CRF scan (ops/crf.py; identical
    paths incl. ties), 'scan' = lax.scan (the reference program; only
    choice off-TPU).  The engine passes 'kernel' on TPU: a whole-read
    decode at stride 2 is a 20-40k-step sequential scan, where the
    lax.scan loop machinery dominates."""
    from scrappie_tpu.decode.crf import _crf_viterbi
    from scrappie_tpu.ops.crf import crf_viterbi_kernel

    N, nb, nsq = trans.shape
    ns = int(round(nsq ** 0.5))
    flat = trans.reshape(N * nb, nsq).astype(jnp.float32)
    neutral = jnp.full((1, nsq), -1e30, flat.dtype)
    neutral = neutral.at[0, (ns - 1) * ns : ns * ns].set(0.0)
    flat = jnp.concatenate([flat, neutral], axis=0)
    t = flat[flat_idx]
    # same additive emit/stay prior as decode_crf's emit_bias; traced
    # (not static) so sweeping the calibration float never recompiles —
    # adding 0.0 is free
    t = t.at[..., : (ns - 1) * ns].add(jnp.asarray(emit_bias, jnp.float32))
    return (crf_viterbi_kernel if impl == "kernel" else _crf_viterbi)(t)


class BasecallEngine:
    """Streamed, batched basecalling of many reads with one compiled program.

    chunk_len/overlap are in samples and must be multiples of the model
    stride.  batch_size is the global device batch (divisible by the
    mesh's data axis).
    """

    def __init__(self, model: str = "rgrgr_r94", chunk_len: int | None = None,
                 overlap: int | None = None, batch_size: int = 8, mesh=None,
                 min_prob: float = 1e-5, tempW: float = 1.0, tempb: float = 1.0,
                 decode_bucket: int = 1024, mode: str = "stitch",
                 pipeline_depth: int = 2,
                 ensemble: tuple[str, ...] = (),
                 ensemble_weights: tuple[float, ...] | None = None,
                 qual_calibration: str = "raw"):
        """mode:
          'stitch' — stitch chunk posteriors into whole-read matrices and
            decode once per read (exact: chunked == unchunked basecall).
          'fast'   — decode each chunk on device with the fused Pallas
            pipeline (ops/pipeline.py; the posterior never reaches the
            host) and stitch the Viterbi paths at overlap midpoints,
            bonito-style.  Junction blocks may differ from 'stitch';
            scores are per-chunk sums weighted by kept blocks.  All
            model kinds (rgrgr/raw/rnnrf round 3, events round 4);
            posterior-mean homopolymer correction unavailable (it needs
            the whole-read posterior; the events pipeline's dwell
            correction works in both modes — it only needs the path).

        pipeline_depth: device batches kept in flight before the host
          blocks on results (JAX dispatch is async, so depth 2 =
          classic double buffering: the host builds/stitches group k+1
          while the device crunches group k).  1 = fully synchronous.

        ensemble: extra same-family models whose per-block outputs are
          combined with the primary model's before decoding —
          transducers (rgrgr/raw): weighted log-domain posterior mean,
          renormalised per block; CRF (rnnrf): weighted mean of the 25
          shared transition energies (models/ensemble.py).  Works in
          BOTH modes: stitch combines whole-read posteriors exactly;
          fast runs the K member stacks in one fused device program
          and combines in VMEM before the fused head+Viterbi
          (ops/pipeline.ensemble_basecall_fused — the combined
          posterior never exists in HBM).  Every member must share the
          primary's stride and state space (the block grids must
          align).  Measured on the bundled reads' strictly-held-out
          tails (BASELINE.md "Posterior ensembling"): rgrgr_r94 +
          rgrgr_r941 + rgrgr_r10 at 3:1:1 lifts tail identity
          0.7084 -> 0.7159, improving both reads, at ~2x device cost.
          Robustness: the geometric mean sharpens disagreement — on
          out-of-distribution reads prefer skip_pen=0 with the
          ensemble (the full (0.5, 0.5) preset partially collapsed
          the third bundled read's call, BASELINE.md robustness note).
          The reference has no analogue (one network per call,
          ref src/scrappie_raw.c:199-210).
        ensemble_weights: per-model weights, primary first, default
          (3, 1, ..., 1); normalised internally.

        qual_calibration: 'raw' (default) emits the posterior-derived
          Phred proxies as-is; 'real' applies the measured linear
          Phred-space recalibration (post/quality.QUAL_RECAL, fitted
          on the bundled truth reads) so downstream tools see Q values
          that match empirical error rates.
        """
        self.model = model
        if model == EVENTS_MODEL.name:
            # Events pipeline: blocks are detected events, chunk
            # coordinates are EVENT counts (the reference's events
            # driver, src/scrappie_events.c:271-344, processes whole
            # reads; the chunk geometry here is the overlap-and-stitch
            # analogue at ~1 event / 5-10 samples).
            self.spec = EVENTS_MODEL
            if chunk_len is None:
                chunk_len = 2048
            if overlap is None:
                overlap = 256
        else:
            self.spec = RAW_MODELS[model]
            if chunk_len is None:
                chunk_len = 10000
            if overlap is None:
                overlap = 1000
        if mode not in ("stitch", "fast"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self._min_prob, self._tempW, self._tempb = min_prob, tempW, tempb
        stride = self.spec.stride
        self.chunk_len = _round_up(chunk_len, stride)
        self.overlap = _round_up(overlap, stride)
        self.decode_bucket = decode_bucket
        # Default: data-parallel over every local device (the CLI never
        # passes a mesh; pinning to one chip would idle the rest).
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = _round_up(batch_size, self.mesh.shape["data"])
        self.params = shard_params(registry.load_params(model), self.mesh,
                                   state_shard_keys=("FF_W", "FF3_W"))
        self._batch_sharding = batch_sharding(self.mesh)

        spec = self.spec

        def _forward_fn(mspec):
            kwargs = dict(stride=mspec.stride, min_prob=min_prob,
                          tempW=tempW, tempb=tempb, return_log=True)
            if mspec.kind == "rgrgr":
                return functools.partial(
                    forward.rgrgr_posterior,
                    conv_activation=mspec.conv_activation, **kwargs)
            if mspec.kind == "rnnrf":
                return functools.partial(
                    forward.rnnrf_transitions,
                    conv_activation=mspec.conv_activation,
                    stride=mspec.stride)
            if mspec.kind == "events":
                return functools.partial(
                    forward.events_posterior, winlen=mspec.winlen,
                    min_prob=min_prob, tempW=tempW, tempb=tempb,
                    return_log=True)
            return functools.partial(forward.raw_posterior, **kwargs)

        fn = _forward_fn(spec)
        self._default_ens_weights = ensemble_weights is None
        self._ens_w = None
        if ensemble or ensemble_weights is not None:
            from scrappie_tpu.models.ensemble import validate_ensemble

            w = validate_ensemble(model, ensemble,
                                  ensemble_weights).astype(np.float32)
            self._ens_w = w
            member_fns = [_forward_fn(RAW_MODELS[m]) for m in ensemble]
            self._ens_params = tuple(
                shard_params(registry.load_params(m), self.mesh,
                             state_shard_keys=("FF_W", "FF3_W"))
                for m in ensemble)

            if spec.kind == "rnnrf":
                # CRF members combine as a weighted mean of transition
                # energies (log-domain product of experts on the shared
                # 25-transition grid, ref src/decode.c:836-894).  No
                # per-block renormalisation: the CRF is globally
                # normalised and every path crosses exactly one
                # transition per block, so the Viterbi decode is
                # invariant to it.
                def _combined(ps, x):
                    t = w[0] * fn(ps[0], x)
                    for wi, f, p in zip(w[1:], member_fns, ps[1:]):
                        t = t + wi * f(p, x)
                    return t
            else:
                def _combined(ps, x):
                    lp = w[0] * fn(ps[0], x)
                    for wi, f, p in zip(w[1:], member_fns, ps[1:]):
                        lp = lp + wi * f(p, x)
                    return lp - jax.scipy.special.logsumexp(
                        lp, axis=-1, keepdims=True)

            jitted = jax.jit(_combined)
            self._posterior = lambda p, x: jitted((p,) + self._ens_params, x)
        else:
            self._posterior = jax.jit(lambda p, x: fn(p, x))
        self.ensemble = tuple(ensemble)

        if qual_calibration not in ("raw", "real"):
            raise ValueError(f"unknown qual_calibration {qual_calibration!r}")
        self._qual_recal_key = None
        if qual_calibration == "real":
            from scrappie_tpu.post.quality import QUAL_RECAL

            # The configuration fit only applies at its fitted weights
            # (default 3:1:...:1); member order doesn't change the
            # posterior, so the key is order-canonical.
            composed = "+".join((self.model,) + tuple(sorted(self.ensemble)))
            if composed in QUAL_RECAL and self._default_ens_weights:
                self._qual_recal_key = composed
            elif self.model in QUAL_RECAL:
                self._qual_recal_key = self.model
                if self.ensemble:
                    from scrappie_tpu.utils.tracing import log

                    log("warn", "no quality recalibration fitted for this "
                                "ensemble configuration; using the primary "
                                "model's fit (see scripts/"
                                "quality_calibration.py --ensemble)",
                        config=composed)
            else:
                raise ValueError(f"no measured quality recalibration for "
                                 f"{self.model!r} (post/quality.QUAL_RECAL; "
                                 f"fit one with scripts/quality_calibration.py)")
        self.qual_calibration = qual_calibration
        from scrappie_tpu.utils.tracing import Stage

        self.stage = Stage()  # wall-clock accounting per pipeline stage

    # ------------------------------------------------------------- pipeline

    def _device_batches(self, all_chunks: np.ndarray):
        """Yield zero-padded, batch-sharded [B, chunk_len, C] device arrays.

        Raw chunks arrive [N, chunk_len] and gain a feature axis; events
        chunks arrive [N, chunk_len, 4] already feature-shaped."""
        N = all_chunks.shape[0]
        B = self.batch_size
        for i in range(0, N, B):
            batch = all_chunks[i : i + B]
            if len(batch) < B:
                batch = np.concatenate(
                    [batch, np.zeros((B - len(batch),) + batch.shape[1:],
                                     np.float32)]
                )
            if batch.ndim == 2:
                batch = batch[..., None]
            yield jax.device_put(batch, self._batch_sharding)

    def _posterior_chunks(self, all_chunks: np.ndarray) -> np.ndarray:
        """Run [N, chunk_len] chunks through the net in batch_size groups."""
        from scrappie_tpu.utils.validate import raise_pending

        import collections

        outs = []
        pend: collections.deque = collections.deque()
        for x in self._device_batches(all_chunks):
            pend.append(self._posterior(self.params, x))  # async dispatch
            if len(pend) >= self.pipeline_depth:
                outs.append(np.asarray(pend.popleft()))
        outs.extend(np.asarray(p) for p in pend)
        raise_pending()  # surface any SCRAPPIE_TPU_VALIDATE layer failures
        return np.concatenate(outs, axis=0)[: all_chunks.shape[0]]

    def _fused_call(self, stay_pen, skip_pen, local_pen, use_slip,
                    crf_emit_bias=0.0, with_qual: bool = False):
        """The model kind's fused chunk pipeline (ops/pipeline.py) as a
        (params, x)->outputs callable; single-model or ensemble."""
        import functools as ft

        from scrappie_tpu.ops import pipeline as plops

        kind = self.spec.kind
        if self._ens_w is not None and kind in ("rgrgr", "raw", "rnnrf"):
            specs = [self.spec] + [RAW_MODELS[m] for m in self.ensemble]
            acts = tuple(getattr(s, "conv_activation", "elu") for s in specs)
            if kind == "rnnrf":
                inner = ft.partial(
                    plops.rnnrf_ensemble_basecall_fused,
                    weights=self._ens_w, conv_activations=acts,
                    stride=self.spec.stride, emit_bias=float(crf_emit_bias))
            else:
                inner = ft.partial(
                    plops.ensemble_basecall_fused,
                    weights=self._ens_w, kinds=tuple(s.kind for s in specs),
                    conv_activations=acts, stride=self.spec.stride,
                    min_prob=self._min_prob, tempW=self._tempW,
                    tempb=self._tempb, stay_pen=stay_pen, skip_pen=skip_pen,
                    local_pen=local_pen, use_slip=use_slip,
                    with_qual=with_qual)
            call = lambda p, x: inner((p,) + self._ens_params, sig=x)
        elif kind == "rgrgr":
            call = ft.partial(
                plops.rgrgr_basecall_fused,
                conv_activation=self.spec.conv_activation,
                stride=self.spec.stride, min_prob=self._min_prob,
                tempW=self._tempW, tempb=self._tempb, stay_pen=stay_pen,
                skip_pen=skip_pen, local_pen=local_pen, use_slip=use_slip,
                with_qual=with_qual)
        elif kind == "raw":
            call = ft.partial(
                plops.raw_basecall_fused, stride=self.spec.stride,
                min_prob=self._min_prob, tempW=self._tempW,
                tempb=self._tempb, stay_pen=stay_pen, skip_pen=skip_pen,
                local_pen=local_pen, use_slip=use_slip,
                with_qual=with_qual)
        elif kind == "events":
            call = ft.partial(
                plops.events_basecall_fused, winlen=self.spec.winlen,
                min_prob=self._min_prob, tempW=self._tempW,
                tempb=self._tempb, stay_pen=stay_pen, skip_pen=skip_pen,
                local_pen=local_pen, use_slip=use_slip,
                with_qual=with_qual)
        else:  # rnnrf
            call = ft.partial(
                plops.rnnrf_basecall_fused,
                conv_activation=self.spec.conv_activation,
                stride=self.spec.stride, emit_bias=float(crf_emit_bias))
        return call

    def _decode_chunks_streamed(self, chunk_iter, call):
        """Fused per-chunk decode over an ITERATOR of per-read chunk
        arrays: dispatch a device batch as soon as batch_size chunks
        accumulate, so host preprocessing of later reads (event
        detection, trimming, feature prep) overlaps with device compute
        of earlier batches — the round-5 profile showed the serial
        prep-then-decode ordering left the device idle through all of
        prep and the host idle through all of decode.  Returns
        (scores [N], paths [N, nblock_chunk+1] int32, quals|None);
        (None, None, None) when the iterator yields nothing.  Paths
        travel int16 on the wire (ops/pipeline._wire_path) and upcast
        here."""
        import collections

        B = self.batch_size
        scores, paths, quals = [], [], []
        pend: collections.deque = collections.deque()

        def _collect():
            out = pend.popleft()
            scores.append(np.asarray(out[0]))
            paths.append(np.asarray(out[1]).astype(np.int32))
            if len(out) > 2:
                quals.append(np.asarray(out[2]))

        def _dispatch(rows):
            if len(rows) < B:
                rows = np.concatenate(
                    [rows, np.zeros((B - len(rows),) + rows.shape[1:],
                                    np.float32)])
            if rows.ndim == 2:
                rows = rows[..., None]
            x = jax.device_put(rows, self._batch_sharding)
            pend.append(call(self.params, x))
            if len(pend) >= self.pipeline_depth:
                _collect()

        N = 0
        buf: list[np.ndarray] = []
        nbuf = 0
        for chunks in chunk_iter:
            N += chunks.shape[0]
            buf.append(chunks)
            nbuf += chunks.shape[0]
            while nbuf >= B:
                flat = np.concatenate(buf) if len(buf) > 1 else buf[0]
                _dispatch(flat[:B])
                rest = flat[B:]
                buf = [rest] if len(rest) else []
                nbuf = len(rest)
        if nbuf:
            _dispatch(np.concatenate(buf) if len(buf) > 1 else buf[0])
        while pend:
            _collect()
        if N == 0:
            return None, None, None
        return (np.concatenate(scores)[:N], np.concatenate(paths)[:N],
                np.concatenate(quals)[:N] if quals else None)

    def _posterior_chunks_device(self, all_chunks: np.ndarray):
        """Like _posterior_chunks but the result STAYS on device and
        KEEPS the batch padding rows: [ceil(N/B)*B, nblock_chunk, ns].

        Keeping the padded shape means _gather_decode specialises on
        (batch-count, nreads-bucket, T-bucket) instead of on every
        distinct chunk total, so streaming groups reuse one compile;
        padding rows are never referenced by flat_idx (it indexes only
        real chunk offsets plus the appended neutral row)."""
        outs = [self._posterior(self.params, x)
                for x in self._device_batches(all_chunks)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def _stitch_decode_device(self, prepped, read_chunks, stay_pen, skip_pen,
                              local_pen, use_slip, crf_emit_bias=0.0):
        """Exact stitch mode with the posterior never leaving the device.

        Host-side stitching transfers ~820 B/sample of posterior
        ([1025] floats per 5-sample block) — measured 5.4k samples/s
        over this environment's tunnel and a hard PCIe ceiling on real
        hardware.  Instead the per-chunk posteriors are stitched ON
        device (one gather via the chunk keep-ranges), padded to the
        decode bucket with neutral blocks, and decoded there; only
        scores and int paths come back.  Bit-identical to the host
        stitch path: same kept blocks, same neutral padding, same
        viterbi_decode_batch.

        Returns {read_index_in_prepped: (score, path np [nblock+1])}.
        """
        import collections

        from scrappie_tpu.utils.validate import raise_pending

        live = [(i, e, c) for (i, e), c in
                zip([(i, e) for i, e in enumerate(prepped) if e is not None],
                    read_chunks)]
        results: dict[int, tuple[float, np.ndarray]] = {}
        # Double buffering: device work for group k is dispatched
        # asynchronously and only materialised once `pipeline_depth`
        # groups are in flight, so the host stitches/plans group k+1
        # while the device crunches group k.
        inflight: collections.deque = collections.deque()

        def _collect_one():
            group, scores_d, paths_d = inflight.popleft()
            scores = np.asarray(scores_d)
            paths = np.asarray(paths_d)
            # device->host sync point: surface SCRAPPIE_TPU_VALIDATE
            # layer failures from callbacks now (attributed to the
            # collected group, which may lag dispatch by the pipeline
            # depth)
            raise_pending()
            for j, (i, e, _c) in enumerate(group):
                nblock = e[2].nblock_total
                results[i] = (float(scores[j]), paths[j, : nblock + 1].copy())

        gi = 0
        while gi < len(live):
            # group reads so one posterior pass covers the whole group
            group = []
            nchunks = 0
            while gi < len(live):
                plan = live[gi][1][2]
                if group and nchunks + plan.nchunk > self.batch_size:
                    break
                group.append(live[gi])
                nchunks += plan.nchunk
                gi += 1

            chunks = np.concatenate([c for _, _, c in group], axis=0)
            with self.stage("posterior"):
                post = self._posterior_chunks_device(chunks)
            ns = post.shape[-1]
            nb = post.shape[1]
            neutral_idx = post.shape[0] * nb  # row appended by the jit

            T_bucket = _round_up(max(e[2].nblock_total for _, e, _c in group),
                                 self.decode_bucket)
            nreads = _round_up(len(group), 8)
            flat_idx = np.full((nreads, T_bucket), neutral_idx, dtype=np.int32)
            off = 0
            for j, (_, e, _c) in enumerate(group):
                plan = e[2]
                starts_blk = plan.starts // plan.stride
                for ci, (lo, hi) in enumerate(chunklib.chunk_keep_ranges(plan)):
                    if hi <= lo:
                        continue
                    rows = (off + ci) * nb + np.arange(
                        lo - starts_blk[ci], hi - starts_blk[ci])
                    flat_idx[j, lo:hi] = rows
                off += plan.nchunk

            with self.stage("decode"):
                if self.spec.kind == "rnnrf":
                    from scrappie_tpu import ops as _ops

                    scores_d, paths_d = _gather_decode_crf(
                        post, jnp.asarray(flat_idx), float(crf_emit_bias),
                        impl="kernel" if _ops.pallas_enabled() else "scan")
                else:
                    scores_d, paths_d = _gather_decode(
                        post, jnp.asarray(flat_idx), float(stay_pen),
                        float(skip_pen), float(local_pen), bool(use_slip))
            inflight.append((group, scores_d, paths_d))
            if len(inflight) >= self.pipeline_depth:
                with self.stage("collect"):
                    _collect_one()
        while inflight:
            with self.stage("collect"):
                _collect_one()
        return results

    def _decode_bucketed(self, logposts: list[np.ndarray], stay_pen, skip_pen,
                         local_pen, use_slip):
        """Batch transducer decode with neutral padding to bucketed lengths."""
        order = np.argsort([lp.shape[0] for lp in logposts])
        results: list = [None] * len(logposts)
        i = 0
        while i < len(order):
            target = _round_up(logposts[order[i]].shape[0], self.decode_bucket)
            group = []
            while i < len(order) and logposts[order[i]].shape[0] <= target:
                group.append(order[i])
                i += 1
            padded = np.stack(
                [chunklib.neutral_pad_logpost(logposts[g], target, stay_pen)
                 for g in group]
            )
            scores, paths = viterbi_decode_batch(
                jnp.asarray(padded), stay_pen, skip_pen, local_pen, use_slip
            )
            scores = np.asarray(scores)
            paths = np.asarray(paths)
            for j, g in enumerate(group):
                nb = logposts[g].shape[0]
                results[g] = (float(scores[j]), paths[j, : nb + 1].copy())
        return results

    def _decode_crf_bucketed(self, transs: list[np.ndarray],
                             emit_bias: float = 0.0):
        """Batched CRF decode with neutral padding to bucketed lengths
        (identity-transition pad blocks add zero score; one compile per
        bucket instead of one per distinct read length)."""
        order = np.argsort([t.shape[0] for t in transs])
        results: list = [None] * len(transs)
        i = 0
        while i < len(order):
            target = _round_up(transs[order[i]].shape[0], self.decode_bucket)
            group = []
            while i < len(order) and transs[order[i]].shape[0] <= target:
                group.append(order[i])
                i += 1
            padded = np.stack(
                [chunklib.neutral_pad_crf(transs[g], target) for g in group]
            )
            scores, paths = decode_crf(padded, emit_bias=emit_bias)
            for j, g in enumerate(group):
                nb = transs[g].shape[0]
                results[g] = (float(scores[j]), paths[j, : nb + 1].copy())
        return results

    def _maybe_recal(self, qual: str | None) -> str | None:
        """Apply the measured Phred recalibration when enabled."""
        if qual is None or self._qual_recal_key is None:
            return qual
        from scrappie_tpu.post.quality import recalibrate_phred

        return recalibrate_phred(qual, self._qual_recal_key)

    def _assemble_events(self, rt, et, path, score, dwell_correction,
                         lp=None, qual_stream=None,
                         with_qualities: bool = False) -> ReadResult:
        """Events-read assembly: emit the first nev path entries
        (api.basecall_events / ref src/scrappie_events.c:301), annotate
        the event table with decoded state/pos (ref :307-311), optional
        dwell homopolymer correction (ref src/decode.c:645-702).
        Qualities come from the whole-read posterior (lp, stitch mode)
        or the fused device quality stream (qual_stream, fast mode)."""
        from scrappie_tpu.post.homopolymer import homopolymer_dwell_correction

        nev = len(et.active)
        path = np.asarray(path)
        emit = path[:nev].copy()
        pos = np.zeros(nev + 1, dtype=np.int64)
        seq = overlapper(emit, self.spec.nstate - 1, pos)
        ev = et.event
        ev["state"][et.start : et.start + nev] = 1 + emit
        ev["pos"][et.start : et.start + nev] = pos[:nev]
        qual = None
        if with_qualities and seq and lp is not None:
            from scrappie_tpu.post.quality import transducer_qualities

            qual = self._maybe_recal(transducer_qualities(lp, emit))
        elif with_qualities and seq and qual_stream is not None:
            from scrappie_tpu.post.quality import qualities_from_stream

            qual = self._maybe_recal(
                qualities_from_stream(np.asarray(qual_stream)[:nev], emit))
        if dwell_correction and seq is not None:
            active = et.active[:nev]
            new = homopolymer_dwell_correction(
                active["length"], active["start"], emit, active["pos"],
                active["state"], self.spec.nstate, len(seq))
            if new is not None:
                if qual is not None and len(new) != len(seq):
                    from scrappie_tpu.utils.tracing import log

                    log("warn", "dwell correction changed the basecall "
                                "length; dropping per-base qualities",
                        uuid=rt.uuid, was=len(seq), now=len(new))
                    qual = None
                seq = new
        return ReadResult(rt.uuid, seq, score, nev, pos, rt.start, rt.end,
                          rt.n, qual, et)

    def basecall_signals(self, signals: list[RawSignal], *, skip_pen=0.0,
                         **kwargs) -> list[ReadResult]:
        """Basecall a batch of raw signals; see _basecall_signals_impl.

        Runtime decode-collapse guard: a positive skip penalty can
        absorb a whole read into the decoder's local start/end states
        on out-of-distribution data (models/calibration.py documents
        the measured failure on the third bundled read).  Any read
        whose call emits implausibly few bases for its block count is
        warned about and re-decoded with skip_pen=0 — one extra device
        pass over only the collapsed reads.
        """
        results = self._basecall_signals_impl(signals, skip_pen=skip_pen,
                                              **kwargs)
        if skip_pen > 0:
            from scrappie_tpu.models.calibration import collapsed

            redo = [i for i, r in enumerate(results)
                    if r.nblock and collapsed(len(r.sequence or ""), r.nblock,
                                              self.model)]
            if redo:
                from scrappie_tpu.utils.tracing import log

                for i in redo:
                    r = results[i]
                    log("warn", "decode collapsed; re-decoding with skip_pen=0",
                        uuid=r.uuid, nbases=len(r.sequence or ""),
                        nblock=r.nblock, skip_pen=skip_pen)
                fixed = self._basecall_signals_impl(
                    [signals[i] for i in redo], skip_pen=0.0, **kwargs)
                for i, r in zip(redo, fixed):
                    results[i] = r
        return results

    def _basecall_signals_impl(self, signals: list[RawSignal], *, trim_start=200,
                         trim_end=10, varseg_chunk=100, varseg_thresh=0.0,
                         stay_pen=0.0, skip_pen=0.0, local_pen=2.0,
                         use_slip=False,
                         homopolymer: HomopolymerMode | str | None = None,
                         crf_emit_bias: float = 0.0,
                         dwell_correction: bool = True,
                         with_qualities: bool = False) -> list[ReadResult]:
        # 1. host-side preprocess + chunk planning.  Per-read error
        # isolation: a failed read (bad data, injected chaos fault)
        # only warns and the batch continues, mirroring the reference
        # (ref src/scrappie_raw.c:397-400); exercised by the chaos
        # fault-injection tests.
        events_kind = self.spec.kind == "events"

        def prep_read(rs):
            """One read's host prep -> ((rt, aux, plan), chunks) or
            (None, None)."""
            try:
                rt = trim_and_segment_raw(rs, trim_start, trim_end,
                                          varseg_chunk, varseg_thresh)
                if rt is None:
                    return None, None
                # Opt-in debug validation (SCRAPPIE_TPU_VALIDATE=1):
                # a non-finite read is caught here and skipped instead
                # of poisoning the whole device batch (analogue of
                # ref validate_scrappie_matrix, src/scrappie_matrix.c:138-220)
                from scrappie_tpu.utils.validate import checked

                if events_kind:
                    # Events pipeline: detect events on the trimmed
                    # signal, studentise features with WHOLE-READ
                    # statistics (exactly api.basecall_events / ref
                    # src/scrappie_events.c:271-299), then chunk the
                    # feature rows; one block per event.
                    from scrappie_tpu.signal.events import detect_events
                    from scrappie_tpu.signal.features import (
                        nanonet_features_from_events,
                    )

                    et = detect_events(rt)
                    aux = nanonet_features_from_events(et, normalise=True)
                    if not len(aux):
                        return None, None
                    checked(aux, f"read.features[{rs.uuid}]")
                    aux = (et, np.asarray(aux, np.float32))
                    n_items = len(aux[1])
                else:
                    aux = medmad_normalise(rt.trimmed)
                    checked(aux, f"read.norm[{rs.uuid}]")
                    n_items = len(aux)
                plan = chunklib.plan_chunks(n_items, self.chunk_len,
                                            self.overlap, self.spec.stride)
            except Exception as e:
                from scrappie_tpu.utils.tracing import log

                log("warn", "read preprocessing failed", uuid=rs.uuid,
                    error=str(e))
                return None, None
            return (rt, aux, plan), chunklib.extract_chunks(
                aux[1] if events_kind else aux, plan)

        # Fast mode: fused per-chunk posterior+decode on device, then
        # path-level stitching — the posterior never reaches the host.
        # Reads are prepped INSIDE the streamed dispatch loop so host
        # preprocessing overlaps device compute (_decode_chunks_streamed).
        if self.mode == "fast":
            if homopolymer not in (None, "nochange", HomopolymerMode.NOCHANGE):
                from scrappie_tpu.utils.tracing import log

                log("warn", "fast mode cannot apply posterior-mean "
                            "homopolymer correction (needs whole-read "
                            "posteriors; measured at +0.0003 identity — "
                            "BASELINE.md); use stitch mode for it")
            fused_qual = with_qualities and self.spec.kind != "rnnrf"
            if with_qualities and not fused_qual:
                from scrappie_tpu.utils.tracing import log

                log("warn", "fast mode cannot compute CRF per-base "
                            "qualities (forward-backward needs the "
                            "whole-read transitions); skipping")
            call = self._fused_call(stay_pen, skip_pen, local_pen, use_slip,
                                    crf_emit_bias, with_qual=fused_qual)
            prepped = []

            def chunk_iter():
                nchunk_total = 0
                for rs in signals:
                    entry, chunks = prep_read(rs)
                    if entry is None:
                        prepped.append(None)
                        continue
                    rt, aux, plan = entry
                    prepped.append((rt, aux, plan, nchunk_total))
                    nchunk_total += plan.nchunk
                    yield chunks

            with self.stage("decode_fused"):
                scores, paths, quals = self._decode_chunks_streamed(
                    chunk_iter(), call)
            if scores is None:
                return [ReadResult(rs.uuid, None, float("nan"), 0, None,
                                   0, 0, rs.n) for rs in signals]
            results = []
            for entry, rs in zip(prepped, signals):
                if entry is None:
                    results.append(ReadResult(rs.uuid, None, float("nan"), 0,
                                              None, 0, 0, rs.n))
                    continue
                rt, aux, plan, off = entry
                path = chunklib.stitch_paths(paths[off : off + plan.nchunk], plan)
                qstream = None
                if quals is not None:
                    qstream = chunklib.stitch_paths(
                        quals[off : off + plan.nchunk], plan)
                keep = chunklib.chunk_keep_ranges(plan)
                score = float(sum(
                    scores[off + i] * (hi - lo) / plan.nblock_chunk
                    for i, (lo, hi) in enumerate(keep)))
                nblock = plan.nblock_total
                if events_kind:
                    # path[1:] are the per-event emissions; prepend the
                    # initial state so _assemble_events sees the same
                    # (nev+1)-entry layout as the exact decode
                    results.append(self._assemble_events(
                        rt, aux[0], path, score, dwell_correction,
                        qual_stream=qstream,
                        with_qualities=with_qualities))
                    continue
                pos = np.zeros(nblock + 1, dtype=np.int64)
                qual = None
                if self.spec.kind == "rnnrf":
                    seq = crfpath_to_basecall(path, pos)
                else:
                    seq = overlapper(path, self.spec.nstate - 1, pos)
                    if qstream is not None and seq:
                        from scrappie_tpu.post.quality import (
                            qualities_from_stream,
                        )

                        qual = self._maybe_recal(
                            qualities_from_stream(qstream, path))
                results.append(ReadResult(rt.uuid, seq, score, nblock, pos,
                                          rt.start, rt.end, rt.n, qual))
            return results

        # Stitch modes: prep every read up front (the stitch decode
        # groups reads by chunk totals, so it needs the full plan set).
        prepped = []
        plans = []
        all_chunks = []
        nchunk_total = 0  # cumulative CHUNK count (reads differ in chunks)
        for rs in signals:
            entry, chunks = prep_read(rs)
            if entry is None:
                prepped.append(None)
                continue
            rt, aux, plan = entry
            prepped.append((rt, aux, plan, nchunk_total))
            nchunk_total += plan.nchunk
            plans.append(plan)
            all_chunks.append(chunks)

        if not all_chunks:
            return [
                ReadResult(rs.uuid, None, float("nan"), 0, None, 0, 0, rs.n)
                for rs in signals
            ]

        # Exact stitch without the posterior ever reaching the host
        # (no whole-read-posterior consumers): the default production
        # path for both transducer and CRF models.  Falls through to
        # the host path for posterior-mean homopolymer correction and
        # per-base qualities (both need the whole-read posterior).
        if events_kind and homopolymer not in (None, "nochange",
                                               HomopolymerMode.NOCHANGE):
            from scrappie_tpu.utils.tracing import log

            log("warn", "posterior homopolymer correction does not apply "
                        "to the events pipeline (ref uses dwell "
                        "correction); ignoring")
            homopolymer = None
        hp_none = (self.spec.kind in ("rnnrf", "events")
                   or homopolymer in (None, "nochange", HomopolymerMode.NOCHANGE))
        if hp_none and not with_qualities:
            decoded_map = self._stitch_decode_device(
                prepped, all_chunks, stay_pen, skip_pen, local_pen, use_slip,
                crf_emit_bias)
            results = []
            for i, (entry, rs) in enumerate(zip(prepped, signals)):
                if entry is None:
                    results.append(ReadResult(rs.uuid, None, float("nan"), 0,
                                              None, 0, 0, rs.n))
                    continue
                rt, aux, plan, _ = entry
                score, path = decoded_map[i]
                nblock = plan.nblock_total
                if events_kind:
                    results.append(self._assemble_events(
                        rt, aux[0], path, score, dwell_correction))
                    continue
                pos = np.zeros(nblock + 1, dtype=np.int64)
                if self.spec.kind == "rnnrf":
                    # paths in decoded_map are already trimmed to
                    # nblock+1 entries by _collect_one
                    seq = crfpath_to_basecall(path, pos)
                else:
                    seq = overlapper(path, self.spec.nstate - 1, pos)
                results.append(ReadResult(rt.uuid, seq, score, nblock, pos,
                                          rt.start, rt.end, rt.n))
            return results

        # 2. one batched device pass over every chunk of every read
        with self.stage("posterior"):
            flat = np.concatenate(all_chunks, axis=0)
            post = self._posterior_chunks(flat)

        # 3. stitch per read
        logposts = []
        metas = []
        for entry, rs in zip(prepped, signals):
            if entry is None:
                continue
            rt, aux, plan, chunk_off = entry
            lp = chunklib.stitch_blocks(post[chunk_off : chunk_off + plan.nchunk], plan)
            logposts.append(lp)
            metas.append((rs, rt, plan, aux))

        # 4. decode (bucketed batches)
        results_map: dict[int, ReadResult] = {}
        with self.stage("decode"):
            if self.spec.kind == "rnnrf":
                decoded = self._decode_crf_bucketed(logposts, crf_emit_bias)
            else:
                decoded = self._decode_bucketed(logposts, stay_pen, skip_pen,
                                                local_pen, use_slip)

        # 5. host-side assembly
        out_iter = iter(zip(logposts, metas, decoded))
        results = []
        for entry, rs in zip(prepped, signals):
            if entry is None:
                results.append(ReadResult(rs.uuid, None, float("nan"), 0, None, 0, 0, rs.n))
                continue
            lp, (rs2, rt, plan, aux), (score, path) = next(out_iter)
            nblock = lp.shape[0]
            if events_kind:
                results.append(self._assemble_events(
                    rt, aux[0], path[: nblock + 1], score, dwell_correction,
                    lp=lp, with_qualities=with_qualities))
                continue
            pos = np.zeros(nblock + 1, dtype=np.int64)
            qual = None
            if self.spec.kind == "rnnrf":
                seq = crfpath_to_basecall(path[: nblock + 1], pos)
                if with_qualities and seq:
                    # exact per-base state posterior; the emit-bias
                    # decode calibration does not alter the model's
                    # reported confidence
                    from scrappie_tpu.decode.crf import posterior_crf
                    from scrappie_tpu.post.quality import crf_qualities

                    qual = self._maybe_recal(
                        crf_qualities(posterior_crf(lp), path[: nblock + 1]))
            else:
                path = np.asarray(path).copy()
                if homopolymer is not None:
                    mode = (HomopolymerMode.parse(homopolymer)
                            if isinstance(homopolymer, str) else homopolymer)
                    path = homopolymer_path(lp, path, mode)
                seq = overlapper(path, lp.shape[1] - 1, pos)
                if with_qualities and seq:
                    from scrappie_tpu.post.quality import transducer_qualities

                    qual = self._maybe_recal(transducer_qualities(lp, path))
            results.append(ReadResult(rt.uuid, seq, score, nblock, pos,
                                      rt.start, rt.end, rt.n, qual))
        return results

    def basecall_files(self, paths, limit: int = 0, **kwargs) -> list[tuple[str, ReadResult]]:
        """Basecall every read in every file (multi-read fast5 files
        contribute one result per contained read, named
        ``<path>:<read_id>``; ``limit`` caps the number of FILES, as the
        reference's analogous --limit does)."""
        from scrappie_tpu.io.fast5 import iterate_fast5, read_raw_all

        files = iterate_fast5(paths)
        if limit:
            files = files[:limit]
        signals = []
        names = []
        for f in files:
            try:
                sigs = read_raw_all(f, scale_to_pA=True)
                signals.extend(sigs)
                names.extend([str(f)] if len(sigs) == 1 else
                             [f"{f}:{s.uuid}" for s in sigs])
            except Exception as e:  # per-read error isolation (ref :397-400)
                import sys

                print(f"Failed to read {f}: {e}", file=sys.stderr)
        results = self.basecall_signals(signals, **kwargs)
        return list(zip(names, results))

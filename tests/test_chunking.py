"""Chunk/stitch runtime tests: chunked == unchunked in the interior."""

import numpy as np
import pytest

from scrappie_tpu.models import forward, registry
from scrappie_tpu.parallel import chunk as chunklib


def test_plan_chunks_short_read():
    plan = chunklib.plan_chunks(500, 1000, 100, 5)
    assert plan.nchunk == 1
    assert plan.starts[0] == 0
    assert plan.nblock_total == 100


def test_plan_chunks_alignment():
    plan = chunklib.plan_chunks(25_731, 10_000, 1_000, 5)
    assert (plan.starts % 5 == 0).all()
    # Last chunk ends at/before nsample but covers the tail blocks
    assert plan.starts[-1] + plan.chunk_len >= plan.nsample - 4
    # Full coverage: consecutive chunks overlap
    assert (np.diff(plan.starts) <= plan.chunk_len).all()


def test_extract_and_stitch_identity():
    """Stitching per-chunk block slices of a global array reproduces it."""
    rng = np.random.default_rng(0)
    nsample, stride = 23_456, 4
    chunk_len, overlap = 4_000, 800
    total_blocks = -(-nsample // stride)
    glob = rng.standard_normal((total_blocks, 3)).astype(np.float32)

    plan = chunklib.plan_chunks(nsample, chunk_len, overlap, stride)
    per_chunk = np.stack(
        [glob[s // stride : s // stride + plan.nblock_chunk] for s in plan.starts]
    )
    got = chunklib.stitch_blocks(per_chunk, plan)
    np.testing.assert_array_equal(got, glob)


def test_neutral_pad_is_decode_neutral():
    from scrappie_tpu.decode.transducer import decode_transducer

    rng = np.random.default_rng(1)
    lp = rng.standard_normal((20, 257)).astype(np.float32) * 2
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
    s1, p1 = decode_transducer(lp, 0.3, 0.1, 2.0)
    padded = chunklib.neutral_pad_logpost(lp, 32, stay_pen=0.3)
    s2, p2 = decode_transducer(padded, 0.3, 0.1, 2.0)
    assert abs(s1 - s2) < 1e-4
    np.testing.assert_array_equal(p1, p2[: len(p1)])
    assert (p2[len(p1):] == -1).all()


@pytest.mark.parametrize("model", ["rgrgr_r94"])
def test_stitched_posterior_matches_whole(model):
    """Chunked + stitched log-posterior equals the whole-read posterior
    away from chunk boundaries (the bidirectional GRU context converges
    well within half an overlap)."""
    from scrappie_tpu.models.specs import RAW_MODELS

    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.utils.maths import medmad_normalise

    spec = RAW_MODELS[model]
    params = registry.load_params(model)
    nsample = 9_000
    # Realistic (simulated) signal: on out-of-distribution noise a
    # well-fitted model's posterior is diffuse and context-sensitive
    # everywhere, which tests the model, not the stitching.
    raw, _, _ = SquiggleSimulator(seed=2).simulate_read(nsample // 8)
    sig = medmad_normalise(raw[:nsample].astype(np.float32))
    nsample = len(sig)

    whole = np.asarray(
        forward.rgrgr_posterior(params, sig.reshape(1, -1, 1),
                                conv_activation=spec.conv_activation,
                                stride=spec.stride)
    )[0]

    plan = chunklib.plan_chunks(nsample, 4000, 1000, spec.stride)
    chunks = chunklib.extract_chunks(sig, plan)
    per_chunk = np.asarray(
        forward.rgrgr_posterior(params, chunks[..., None],
                                conv_activation=spec.conv_activation,
                                stride=spec.stride)
    )
    stitched = chunklib.stitch_blocks(per_chunk, plan)
    assert stitched.shape == whole.shape
    diff = np.abs(stitched - whole).max(axis=1)
    # The RNN context converges within half an overlap, so stitched
    # blocks stay close in log space...
    assert np.median(diff) < 0.2, f"median diff {np.median(diff)}"
    # ...and what stitching must actually guarantee: the decode of the
    # stitched posterior matches the whole-read decode.
    import Levenshtein

    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.post.overlapper import overlapper

    _, path_w = decode_transducer(whole, 0.0, 0.0, 2.0)
    _, path_s = decode_transducer(stitched, 0.0, 0.0, 2.0)
    seq_w = overlapper(path_w, whole.shape[1] - 1)
    seq_s = overlapper(path_s, whole.shape[1] - 1)
    edit = Levenshtein.distance(seq_w, seq_s)
    # allow a couple of flipped bases per chunk junction
    assert edit <= 2 * plan.nchunk, f"{edit} edits in {len(seq_w)}"


@pytest.mark.parametrize("model", ["raw_r94", "rnnrf_r94", "rgrgr_r94"])
def test_engine_fast_mode_all_kinds(reads_dir, model):
    """Fast mode (fused per-chunk decode + path stitch) for every model
    kind (round 3; ref fast path analogue src/networks.c:196-247,
    :567-615).  On an exact-chunk-length read there are no junctions
    and no signal padding, so fast == stitch exactly.
    """
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.models.specs import RAW_MODELS
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal
    from scrappie_tpu.utils.maths import medmad_normalise

    chunk = 2000
    raw = read_raw(sorted(reads_dir.glob("*.fast5"))[0]).raw
    norm = medmad_normalise(raw[1000 : 1000 + chunk])
    sig = [RawSignal(norm, uuid="x")]
    kw = dict(trim_start=0, trim_end=0, varseg_thresh=0.0)
    seqs = {}
    for mode in ("fast", "stitch"):
        eng = BasecallEngine(model, chunk_len=chunk, overlap=400,
                             batch_size=2, mode=mode)
        res = eng.basecall_signals(sig, **kw)[0]
        assert res.sequence, (model, mode)
        seqs[mode] = res.sequence
    assert seqs["fast"] == seqs["stitch"], model


def test_engine_end_to_end(reads_dir):
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine

    engine = BasecallEngine("rgrgr_r94", chunk_len=5000, overlap=500, batch_size=4)
    reads = sorted(reads_dir.glob("*.fast5"))[:2]
    signals = [read_raw(f) for f in reads]
    # Truncate for test speed
    from scrappie_tpu.types import RawSignal

    signals = [RawSignal(s.raw[:12_000], uuid=s.uuid) for s in signals]
    results = engine.basecall_signals(signals, local_pen=20.0)
    assert len(results) == 2
    for r in results:
        assert r.sequence is not None and len(r.sequence) > 50
        assert np.isfinite(r.score)
        assert r.nblock == -(-(r.trim_end - r.trim_start) // 5)


def test_engine_matches_single_read_api(reads_dir):
    """Engine (chunked, batched) basecall matches the single-read API path.

    A read shorter than one chunk is zero-padded, which perturbs the
    backward-GRU context near the read tail (same error class as a chunk
    boundary), so we require near-identity rather than equality.
    """
    import Levenshtein

    from scrappie_tpu.api import basecall_raw
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    f = sorted(reads_dir.glob("*.fast5"))[0]
    sig = read_raw(f).raw[:8_000]
    seq_api, score_api, *_ = basecall_raw(sig, "rgrgr_r94", local_pen=20.0)

    engine = BasecallEngine("rgrgr_r94", chunk_len=10_000, overlap=1_000,
                            batch_size=2, min_prob=1e-6)
    res = engine.basecall_signals([RawSignal(sig)], local_pen=20.0)[0]
    identity = 1.0 - Levenshtein.distance(res.sequence, seq_api) / max(
        len(seq_api), len(res.sequence)
    )
    assert identity > 0.95, f"identity {identity}"
    assert abs(res.score - score_api) / abs(score_api) < 0.02


@pytest.mark.parametrize("emit_bias", [0.0, -1.0])
def test_engine_crf_device_stitch_matches_host(reads_dir, emit_bias):
    """rnnrf (CRF) device-side stitch+decode (_gather_decode_crf) is
    bit-equal to the host stitch path (forced via with_qualities=True,
    which needs whole-read posteriors and so takes the host branch)."""
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    f = sorted(reads_dir.glob("*.fast5"))[0]
    sig = read_raw(f).raw[:9_000]
    engine = BasecallEngine("rnnrf_r94", chunk_len=4000, overlap=400,
                            batch_size=4)
    signals = [RawSignal(sig), RawSignal(sig[:6_500])]
    dev = engine.basecall_signals(signals, crf_emit_bias=emit_bias)
    host = engine.basecall_signals(signals, crf_emit_bias=emit_bias,
                                   with_qualities=True)
    for d, h in zip(dev, host):
        assert d.sequence == h.sequence and len(d.sequence) > 20
        assert abs(d.score - h.score) <= 1e-3 * abs(h.score) + 1e-4
        assert d.nblock == h.nblock


def test_stitch_paths_midpoint_assembly():
    """stitch_paths keeps each chunk's interior emissions (same geometry
    as stitch_blocks) and the first chunk's initial state."""
    from scrappie_tpu.parallel.chunk import (
        chunk_keep_ranges,
        plan_chunks,
        stitch_paths,
    )

    plan = plan_chunks(nsample=100, chunk_len=40, overlap=20, stride=2)
    nblk = plan.nblock_chunk
    starts_blk = plan.starts // plan.stride
    # chunk i emits value 1000*i + local block index
    paths = np.stack([
        np.concatenate([[-(i + 1)], 1000 * i + np.arange(nblk)])
        for i in range(plan.nchunk)
    ]).astype(np.int32)
    out = stitch_paths(paths, plan)
    assert out.shape == (plan.nblock_total + 1,)
    assert out[0] == -1  # first chunk's initial state
    for i, (lo, hi) in enumerate(chunk_keep_ranges(plan)):
        got = out[1 + lo : 1 + hi]
        want = 1000 * i + (np.arange(lo, hi) - starts_blk[i])
        np.testing.assert_array_equal(got, want)
    # every global block was produced by exactly one chunk
    ranges = chunk_keep_ranges(plan)
    covered = sorted((lo, hi) for lo, hi in ranges)
    assert covered[0][0] == 0 and covered[-1][1] == plan.nblock_total
    for (a, b), (c, d) in zip(covered, covered[1:]):
        assert b == c


@pytest.mark.slow
def test_launcher_single_process_virtual_mesh(reads_dir, tmp_path):
    """Launcher plumbing: file sharding + global-mesh engine on the
    8-device virtual CPU mesh, single process."""
    from scrappie_tpu.parallel.launcher import run, shard_files

    files = sorted(str(p) for p in reads_dir.glob("*.fast5"))
    assert shard_files(files, 0, 2) + shard_files(files, 1, 2) != []
    assert sorted(shard_files(files, 0, 2) + shard_files(files, 1, 2)) == files

    out = tmp_path / "calls.fa"
    rc = run(["--model", "rgrgr_r94", "--chunk-len", "2000", "--overlap", "500",
              "--batch-per-device", "1", "--limit", "1", "-o", str(out),
              str(reads_dir)])
    assert rc == 0
    text = out.read_text()
    assert text.startswith(">") and len(text.splitlines()[1]) > 100


def test_plan_covers_final_partial_block():
    """Regression: non-stride-multiple reads must still produce the final
    (partial) block — floor-aligning the last chunk left an all-zeros
    stitched row."""
    from scrappie_tpu.parallel.chunk import chunk_keep_ranges, plan_chunks

    plan = plan_chunks(nsample=141, chunk_len=40, overlap=8, stride=4)
    ranges = chunk_keep_ranges(plan)
    assert ranges[-1][1] == plan.nblock_total
    covered = sorted(ranges)
    assert covered[0][0] == 0
    for (a, b), (c, d) in zip(covered, covered[1:]):
        assert b == c


def test_engine_multiread_chunk_offsets(reads_dir):
    """Regression: a multi-chunk read followed by another read — each
    read's engine basecall must equal its own solo basecall (a prior bug
    offset posteriors by the READ index instead of the cumulative CHUNK
    count, so read 2 decoded read 1's signal)."""
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    f1, f2 = sorted(reads_dir.glob("*.fast5"))[:2]
    a = RawSignal(read_raw(f1).raw[:6000], uuid="a")
    b = RawSignal(read_raw(f2).raw[:5000], uuid="b")
    engine = BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=400,
                            batch_size=8)
    together = engine.basecall_signals([a, b], local_pen=20.0)
    solo_a = engine.basecall_signals([a], local_pen=20.0)[0]
    solo_b = engine.basecall_signals([b], local_pen=20.0)[0]
    assert together[0].sequence == solo_a.sequence
    assert together[1].sequence == solo_b.sequence
    assert together[0].sequence != together[1].sequence


def test_engine_device_stitch_compiles_once(reads_dir):
    """Streaming groups with DIFFERENT chunk totals (but the same batch
    and decode bucket) must reuse one _gather_decode compile: the
    posterior keeps its padded [ceil(N/B)*B] shape so the jit cache key
    does not depend on the per-group chunk count (a prior version
    sliced to the exact total and recompiled nearly every group)."""
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel import runner
    from scrappie_tpu.types import RawSignal

    raw = read_raw(sorted(reads_dir.glob("*.fast5"))[0]).raw
    engine = runner.BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=400,
                                   batch_size=4)
    if not hasattr(runner._gather_decode, "_cache_size"):
        import pytest

        pytest.skip("jax.jit cache introspection unavailable")
    # 2-chunk read, then a 3-chunk read: different chunk totals, same
    # padded batch (4), same nreads bucket (8), same T bucket (1024).
    engine.basecall_signals([RawSignal(raw[:3600], uuid="g1")], local_pen=20.0)
    n0 = runner._gather_decode._cache_size()
    engine.basecall_signals([RawSignal(raw[:5200], uuid="g2")], local_pen=20.0)
    assert runner._gather_decode._cache_size() == n0


@pytest.mark.slow
def test_engine_pipeline_depth_equivalence(reads_dir):
    """Double buffering (pipeline_depth>1) must not change results:
    multi-group device-stitch and fast-mode runs agree with the fully
    synchronous depth-1 engine."""
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    raw = read_raw(sorted(reads_dir.glob("*.fast5"))[0]).raw
    reads = [RawSignal(raw[:6000], uuid="a"), RawSignal(raw[3000:11000], uuid="b"),
             RawSignal(raw[:4200], uuid="c")]
    for mode in ("stitch", "fast"):
        outs = []
        for depth in (1, 3):
            eng = BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=400,
                                 batch_size=2, mode=mode,
                                 pipeline_depth=depth)
            res = eng.basecall_signals(reads, local_pen=20.0)
            outs.append([(r.sequence, round(r.score, 4)) for r in res])
        assert outs[0] == outs[1], mode


def _sim_event_signals(n=3, seed=5):
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sim = SquiggleSimulator(seed=seed)
    return [np.asarray(sim.simulate_read(600 + 100 * i)[0], np.float32)
            for i in range(n)]


def test_engine_events_stitch_matches_api():
    """Events engine (chunked feature rows, batched device decode) is
    byte-identical to the serial api.basecall_events whole-read path
    (round 4; ref src/scrappie_events.c:271-344): event detection and
    whole-read feature studentisation happen before chunking, and the
    device-stitched posterior equals the whole-read posterior away from
    chunk edges (biLSTM context converges within the 128-event
    overlap)."""
    from scrappie_tpu.api import basecall_events
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    sigs = _sim_event_signals()
    ref = [basecall_events(s, trim_start=0, trim_end=0) for s in sigs]
    eng = BasecallEngine("nanonet_events", chunk_len=512, overlap=128,
                         batch_size=4)
    res = eng.basecall_signals([RawSignal(s) for s in sigs],
                               trim_start=0, trim_end=0)
    for (seq_a, score_a, et_a, *_), r in zip(ref, res):
        assert r.sequence == seq_a
        assert abs(r.score - score_a) <= 1e-3 * abs(score_a) + 1e-3
        assert r.nblock == len(et_a.active)
        # annotations written back into the event table (ref :307-311)
        ev = r.events.active
        assert (ev["state"][: r.nblock] >= 0).all()
        np.testing.assert_array_equal(ev["state"], et_a.active["state"])
        np.testing.assert_array_equal(ev["pos"], et_a.active["pos"])


def test_engine_events_fast_matches_stitch():
    """Events fast mode (fused biLSTM+head+Viterbi per chunk, path
    stitch) vs exact stitch: junction/pad blocks may differ, interiors
    are identical — same contract as the raw fast modes."""
    import Levenshtein

    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    sigs = _sim_event_signals()
    kw = dict(trim_start=0, trim_end=0)
    seqs = {}
    for mode in ("stitch", "fast"):
        eng = BasecallEngine("nanonet_events", chunk_len=512, overlap=128,
                             batch_size=4, mode=mode)
        seqs[mode] = [r.sequence for r in eng.basecall_signals(
            [RawSignal(s) for s in sigs], **kw)]
    for a, b in zip(seqs["stitch"], seqs["fast"]):
        assert a and b
        assert Levenshtein.distance(a, b) <= max(3, 0.02 * len(a))


def test_engine_events_qualities_and_dwell():
    """with_qualities=True (dwell off) emits a Phred string per base;
    dwell correction (the default) may change run lengths but never
    silently: a changed basecall drops the (now misaligned) qualities."""
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    sig = _sim_event_signals(1)[0]
    eng = BasecallEngine("nanonet_events", chunk_len=512, overlap=128,
                         batch_size=2)
    r = eng.basecall_signals([RawSignal(sig)], trim_start=0, trim_end=0,
                             dwell_correction=False, with_qualities=True)[0]
    assert r.qual is not None and len(r.qual) == len(r.sequence)
    # dwell on (default): sequence may differ from the uncorrected call
    r2 = eng.basecall_signals([RawSignal(sig)], trim_start=0, trim_end=0)[0]
    assert r2.sequence


def test_fast_mode_batch_split_invariance():
    """A read whose chunks SPLIT across device batches (round-5
    streamed dispatch, runner._decode_chunks_streamed buffer) decodes
    identically to the same read in one big batch — per-chunk decodes
    are independent, so batch boundaries must be invisible."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.train.simulate import SquiggleSimulator
    from scrappie_tpu.types import RawSignal

    sim = SquiggleSimulator(seed=17)
    sig, _, _ = sim.simulate_read(900)  # ~8k samples -> 6+ chunks at 1500/300
    reads = [RawSignal(np.asarray(sig, np.float32), uuid="r0")]
    kw = dict(trim_start=0, trim_end=0, varseg_thresh=0.0)
    res = {}
    for bs in (2, 8):
        eng = BasecallEngine("rgrgr_r94", chunk_len=1500, overlap=300,
                             batch_size=bs, mode="fast")
        res[bs] = eng.basecall_signals(reads, **kw)[0]
    assert res[2].sequence == res[8].sequence
    assert res[2].sequence
    assert np.isclose(res[2].score, res[8].score, rtol=1e-5)

"""StreamingBasecaller: incremental signal in, bases out.

Contracts (scrappie_tpu/parallel/streaming.py):
  - increment-invariance: any split of the same signal yields identical
    bases and identical per-feed commit boundaries;
  - geometry parity: on a pre-normalised signal whose length puts the
    engine's right-aligned last chunk on the uniform grid, streaming
    output equals the batch engine's 'fast' mode exactly;
  - accuracy: streaming a simulated squiggle (with its own frozen
    calibration) basecalls the truth about as well as the engine.
"""

import numpy as np
import pytest

from scrappie_tpu.parallel.streaming import StreamingBasecaller

CHUNK, OV = 2000, 400


def _sim_read(nbase=600, seed=11):
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sig, bases, _ = SquiggleSimulator(seed=seed).simulate_read(nbase)
    truth = "".join("ACGT"[b] for b in bases)
    return np.asarray(sig, np.float32), truth


def _stream(sig, splits, **kw):
    sb = StreamingBasecaller("rgrgr_r94", CHUNK, OV, **kw)
    fed, out = 0, []
    for n in splits:
        out.append(sb.feed(sig[fed : fed + n]))
        fed += n
    assert fed == len(sig)
    out.append(sb.flush())
    return sb, out


def test_increment_invariance():
    sig, _ = _sim_read()
    rng = np.random.default_rng(0)
    one, out_one = _stream(sig, [len(sig)])
    # random small increments
    splits = []
    left = len(sig)
    while left:
        n = min(left, int(rng.integers(1, 900)))
        splits.append(n)
        left -= n
    many, out_many = _stream(sig, splits)
    assert one.sequence == many.sequence
    assert one.sequence  # non-trivial
    assert np.isclose(one.score, many.score)
    # bases only ever appended
    assert "".join(out_one) == "".join(out_many) == one.sequence


def test_matches_engine_fast_mode():
    """On the uniform-grid length, streaming == engine fast mode exactly."""
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    # trim to exactly 3 hops + chunk so plan_chunks' right-aligned last
    # chunk falls on the uniform grid the stream uses
    n = 3 * (CHUNK - OV) + CHUNK
    nbase = 900
    while True:
        sig, _ = _sim_read(nbase=nbase, seed=3)
        if len(sig) >= n:
            break
        nbase += 200
    sig = sig[:n]
    # engine normalises whole-read; give both the identical pre-normalised
    # signal and disable stream calibration
    from scrappie_tpu.utils.maths import medmad_normalise

    norm = medmad_normalise(sig)
    eng = BasecallEngine("rgrgr_r94", chunk_len=CHUNK, overlap=OV,
                         batch_size=4, mode="fast")
    res = eng.basecall_signals([RawSignal(norm, uuid="s")], trim_start=0,
                               trim_end=0, varseg_thresh=0.0)[0]
    sb, _ = _stream(norm, [len(norm)], normalise=False)
    assert sb.sequence == res.sequence


def test_streaming_accuracy_vs_truth():
    import Levenshtein

    sig, truth = _sim_read(nbase=800, seed=7)
    sb, _ = _stream(sig, [512] * (len(sig) // 512) + [len(sig) % 512])
    ident = 1.0 - Levenshtein.distance(sb.sequence, truth) / max(
        len(truth), len(sb.sequence))
    assert ident > 0.85, (ident, len(sb.sequence), len(truth))


def test_short_read_single_flush():
    sig, _ = _sim_read(nbase=60, seed=5)
    assert len(sig) < CHUNK
    sb = StreamingBasecaller("rgrgr_r94", CHUNK, OV)
    assert sb.feed(sig) == ""
    seq = sb.flush()
    assert seq == sb.sequence and len(seq) > 10


def test_empty_stream():
    sb = StreamingBasecaller("rgrgr_r94", CHUNK, OV)
    assert sb.flush() == ""
    with pytest.raises(RuntimeError):
        sb.feed(np.zeros(5, np.float32))


def test_batcher_matches_solo_streams():
    """N channels through StreamingBatcher == each channel solo, exactly
    (shared [B, chunk_len] program vs per-stream batch-1 decodes)."""
    from scrappie_tpu.parallel.streaming import StreamingBatcher

    sigs = [_sim_read(nbase=n, seed=s)[0] for n, s in
            [(500, 1), (620, 2), (430, 4)]]
    solo = []
    for sig in sigs:
        sb, _ = _stream(sig, [len(sig)])
        solo.append(sb.sequence)

    bat = StreamingBatcher("rgrgr_r94", CHUNK, OV, batch_size=4)
    for i in range(len(sigs)):
        bat.add_stream(i)
    # interleave feeds in uneven slices across channels
    rng = np.random.default_rng(3)
    offs = [0] * len(sigs)
    got = [""] * len(sigs)
    while any(offs[i] < len(sigs[i]) for i in range(len(sigs))):
        i = int(rng.integers(0, len(sigs)))
        if offs[i] >= len(sigs[i]):
            continue
        n = int(rng.integers(200, 1500))
        got[i] += bat.feed(i, sigs[i][offs[i] : offs[i] + n])
        offs[i] += n
    for k, v in bat.poll().items():
        got[k] += v
    for i in range(len(sigs)):
        got[i] += bat.flush(i)
    assert got == solo
    assert all(got)


def test_batcher_flush_with_queued_chunks():
    """flush() on one channel while others still have queued chunks."""
    from scrappie_tpu.parallel.streaming import StreamingBatcher

    sig_a, _ = _sim_read(nbase=500, seed=13)
    sig_b, _ = _sim_read(nbase=500, seed=14)
    bat = StreamingBatcher("rgrgr_r94", CHUNK, OV, batch_size=8)
    bat.add_stream("a")
    bat.add_stream("b")
    out_a = bat.feed("a", sig_a)   # queues chunks; batch of 8 never fills
    out_b = bat.feed("b", sig_b)
    out_a += bat.flush("a")        # must decode a's queued chunks first
    out_b += bat.flush("b")
    solo_a, _ = _stream(sig_a, [len(sig_a)])
    solo_b, _ = _stream(sig_b, [len(sig_b)])
    assert out_a == solo_a.sequence
    assert out_b == solo_b.sequence


def test_crf_streaming():
    sig, truth = _sim_read(nbase=500, seed=9)
    del truth
    # CRF model: emissions are per-block independent; check invariance
    sb1 = StreamingBasecaller("rnnrf_r94", CHUNK, OV)
    sb1.feed(sig)
    sb1.flush()
    sb2 = StreamingBasecaller("rnnrf_r94", CHUNK, OV)
    for i in range(0, len(sig), 777):
        sb2.feed(sig[i : i + 777])
    sb2.flush()
    assert sb1.sequence == sb2.sequence and len(sb1.sequence) > 50


def test_streaming_trim_start():
    """trim_start drops exactly N stream-head samples regardless of how
    feeds are split (the engine's trim_start analogue)."""
    sig, _ = _sim_read(nbase=600, seed=17)
    ref = StreamingBasecaller("rgrgr_r94", CHUNK, OV)
    ref.feed(sig[150:])
    ref.flush()
    tr = StreamingBasecaller("rgrgr_r94", CHUNK, OV, trim_start=150)
    for i in range(0, len(sig), 97):
        tr.feed(sig[i : i + 97])
    tr.flush()
    assert tr.sequence == ref.sequence
    assert tr.nsample == len(sig) - 150


def test_batcher_decode_pending_buffers_bases():
    """decode_pending() (the server poller hook) decodes queued chunks
    but leaves the bases in the channel buffer — poll() would hand them
    to the caller and a server poller would lose them."""
    from scrappie_tpu.parallel.streaming import StreamingBatcher

    sig, _ = _sim_read(nbase=500, seed=19)
    bat = StreamingBatcher("rgrgr_r94", CHUNK, OV, batch_size=8)
    bat.add_stream("c")
    got = bat.feed("c", sig)         # queues chunks; batch never fills
    bat.decode_pending()             # poller tick
    got += bat.collect("c")          # client's next request sees them
    got += bat.flush("c")
    solo, _ = _stream(sig, [len(sig)])
    assert got == solo.sequence


def test_batcher_on_device_mesh():
    """StreamingBatcher shards chunk batches over the full device mesh
    (8 virtual devices here) and still reproduces solo-stream output."""
    import jax

    from scrappie_tpu.parallel.sharding import make_mesh
    from scrappie_tpu.parallel.streaming import StreamingBatcher

    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    sig, _ = _sim_read(nbase=700, seed=23)
    bat = StreamingBatcher("rgrgr_r94", CHUNK, OV, batch_size=4, mesh=mesh)
    assert bat.batch_size % mesh.shape["data"] == 0
    bat.add_stream("c")
    got = bat.feed("c", sig)
    got += bat.flush("c")
    solo, _ = _stream(sig, [len(sig)])
    assert got == solo.sequence


def test_streaming_fused_path_matches_plain():
    """With Pallas forced on (interpret mode on CPU), the stream takes
    the fused chunk pipeline — the batch engine's fast-mode path — and
    must produce the same bases as the plain scan path."""
    from scrappie_tpu import ops

    sig, _ = _sim_read(nbase=400, seed=29)
    plain, _ = _stream(sig, [len(sig)])
    with ops.pallas(True):
        fused, _ = _stream(sig, [len(sig)])
    assert fused.sequence == plain.sequence
    assert np.isclose(fused.score, plain.score, rtol=1e-5)


def test_streaming_fused_ensemble_matches_plain():
    """With Pallas forced on, an ensemble stream takes the fused
    multi-model chunk pipeline (round 5: ensemble_basecall_fused —
    one device call per chunk) and must produce the same bases as the
    plain combined-posterior + decode path; batcher == solo holds on
    the fused route too."""
    from scrappie_tpu import ops
    from scrappie_tpu.parallel.streaming import StreamingBatcher

    sig, _ = _sim_read(nbase=400, seed=33)
    ens = ("rgrgr_r941", "rgrgr_r10")

    def solo_stream():
        sb = StreamingBasecaller("rgrgr_r94", CHUNK, OV, ensemble=ens,
                                 trim_start=0)
        sb.feed(sig)
        sb.flush()
        return sb.sequence

    plain = solo_stream()
    with ops.pallas(True):
        fused = solo_stream()
        bat = StreamingBatcher("rgrgr_r94", CHUNK, OV, batch_size=2,
                               ensemble=ens, trim_start=0)
        bat.add_stream("a")
        got = bat.feed("a", sig) + bat.flush("a")
    assert fused == plain and plain
    assert got == plain


def test_raw_kind_streaming():
    """raw_r94 (kind 'raw', stride 4) streams with increment invariance."""
    sig, _ = _sim_read(nbase=400, seed=31)
    sb1 = StreamingBasecaller("raw_r94", CHUNK, OV)
    sb1.feed(sig)
    sb1.flush()
    sb2 = StreamingBasecaller("raw_r94", CHUNK, OV)
    for i in range(0, len(sig), 631):
        sb2.feed(sig[i : i + 631])
    sb2.flush()
    assert sb1.sequence == sb2.sequence and len(sb1.sequence) > 50


def test_prefix_calibration_default_and_modes():
    """Default calib_mode is 'prefix': per-chunk med-mad over a strided
    reservoir of the whole signal prefix (closes the frozen-window
    accuracy gap, BASELINE.md).  Both modes are increment-invariant;
    frozen stays available; compaction still bounds the raw buffer."""
    from scrappie_tpu.parallel.streaming import StreamingBasecaller

    sig, _ = _sim_read()
    sb = StreamingBasecaller("rgrgr_r94", CHUNK, OV)
    assert sb.calib_mode == "prefix"
    sb.feed(sig)
    sb.flush()

    # invariance across a different split (prefix reservoir must not
    # depend on feed boundaries)
    sb2 = StreamingBasecaller("rgrgr_r94", CHUNK, OV)
    for i in range(0, len(sig), 611):
        sb2.feed(sig[i:i + 611])
    sb2.flush()
    assert sb.sequence == sb2.sequence and sb.sequence

    # the raw buffer is compacted even though calibration never freezes
    sb3 = StreamingBasecaller("rgrgr_r94", CHUNK, OV)
    sb3.feed(sig)
    assert sb3._base_off > 0  # compaction happened
    # reservoir is the strided prefix
    assert sum(len(p) for p in sb3._res_parts) == -(-len(sig) // 4)

    # frozen mode still selectable and distinct state
    fz = StreamingBasecaller("rgrgr_r94", CHUNK, OV, calib_mode="frozen")
    fz.feed(sig)
    fz.flush()
    assert fz._med is not None and fz.sequence

    with pytest.raises(ValueError):
        StreamingBasecaller("rgrgr_r94", CHUNK, OV, calib_mode="whole")

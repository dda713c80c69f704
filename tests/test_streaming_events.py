"""Streaming events pipeline (parallel/streaming_events.py).

Contracts: increment-invariance (exact); accuracy on a simulated
detector-realistic read close to the whole-read events pipeline; short
reads handled by a single flush window.
"""

import numpy as np
import pytest

from scrappie_tpu.parallel.streaming_events import EventsStreamingBasecaller

CHUNK, OV = 4000, 1000


def _sim_read(nbase=700, seed=41):
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sig, bases, _ = SquiggleSimulator(seed=seed).simulate_read(nbase)
    truth = "".join("ACGT"[b] for b in bases)
    return np.asarray(sig, np.float32), truth


def test_events_stream_increment_invariance():
    sig, _ = _sim_read()
    sb1 = EventsStreamingBasecaller(CHUNK, OV)
    sb1.feed(sig)
    sb1.flush()
    rng = np.random.default_rng(2)
    sb2 = EventsStreamingBasecaller(CHUNK, OV)
    off = 0
    while off < len(sig):
        n = int(rng.integers(1, 1300))
        sb2.feed(sig[off : off + n])
        off += n
    sb2.flush()
    assert sb1.sequence == sb2.sequence
    assert len(sb1.sequence) > 100
    assert np.isclose(sb1.score, sb2.score)
    assert sb1.nevent == sb2.nevent


def test_events_stream_fixed_stats():
    """stats_mode='fixed' (round 3): externally-calibrated statistics.

    With the read's own whole-stream statistics the call must closely
    match the prefix-mode call (prefix converges to these), and the
    mode must validate its override.
    """
    from scrappie_tpu.signal.events import detect_events
    from scrappie_tpu.signal.features import (feature_stats,
                                              nanonet_features_from_events)
    from scrappie_tpu.types import RawSignal

    sig, _ = _sim_read(nbase=500, seed=43)
    stats = feature_stats(nanonet_features_from_events(
        detect_events(RawSignal(sig)), normalise=False))
    sb = EventsStreamingBasecaller(CHUNK, OV, stats_mode="fixed",
                                   feature_stats_override=stats)
    sb.feed(sig)
    sb.flush()
    assert len(sb.sequence) > 100
    sp = EventsStreamingBasecaller(CHUNK, OV)
    sp.feed(sig)
    sp.flush()
    import Levenshtein

    d = Levenshtein.distance(sb.sequence, sp.sequence)
    assert d <= 0.1 * len(sp.sequence), (d, len(sp.sequence))

    with pytest.raises(ValueError):
        EventsStreamingBasecaller(CHUNK, OV, stats_mode="fixed")


def test_events_stream_accuracy_vs_whole_read():
    import Levenshtein

    from scrappie_tpu import api

    sig, truth = _sim_read(nbase=900, seed=43)
    sb = EventsStreamingBasecaller(CHUNK, OV)
    sb.feed(sig)
    sb.flush()

    def ident(a, b):
        return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)

    whole, _, _, _, _ = api.basecall_events(sig, trim_start=0, trim_end=0,
                                            dwell_correction=False)
    id_stream = ident(sb.sequence, truth)
    id_whole = ident(whole, truth)
    # frozen feature stats + junction jitter cost a little accuracy;
    # the stream must stay in the same class as the batch pipeline
    assert id_stream > id_whole - 0.08, (id_stream, id_whole)
    assert id_stream > 0.6


def test_events_stream_short_read():
    sig, _ = _sim_read(nbase=80, seed=45)
    assert len(sig) < CHUNK
    sb = EventsStreamingBasecaller(CHUNK, OV)
    assert sb.feed(sig) == ""
    seq = sb.flush()
    assert seq == sb.sequence and len(seq) > 20


def test_events_stream_empty_and_reuse():
    sb = EventsStreamingBasecaller(CHUNK, OV)
    assert sb.flush() == ""
    with pytest.raises(RuntimeError):
        sb.feed(np.zeros(3, np.float32))


def test_events_batcher_matches_solo():
    """Channels through EventsStreamingBatcher == solo streams, exactly."""
    from scrappie_tpu.parallel.streaming_events import EventsStreamingBatcher

    sigs = [_sim_read(nbase=n, seed=s)[0] for n, s in [(600, 51), (750, 52)]]
    solo = []
    for sig in sigs:
        sb = EventsStreamingBasecaller(CHUNK, OV)
        sb.feed(sig)
        sb.flush()
        solo.append(sb.sequence)

    bat = EventsStreamingBatcher(CHUNK, OV, batch_size=4)
    for i in range(len(sigs)):
        bat.add_stream(i)
    rng = np.random.default_rng(5)
    offs = [0] * len(sigs)
    got = [""] * len(sigs)
    while any(offs[i] < len(sigs[i]) for i in range(len(sigs))):
        i = int(rng.integers(0, len(sigs)))
        if offs[i] >= len(sigs[i]):
            continue
        n = int(rng.integers(300, 2000))
        got[i] += bat.feed(i, sigs[i][offs[i] : offs[i] + n])
        offs[i] += n
    for k, v in bat.poll().items():
        got[k] += v
    for i in range(len(sigs)):
        got[i] += bat.flush(i)
        bat.close_stream(i)
    assert got == solo and all(got)


def test_events_batcher_decode_pending():
    from scrappie_tpu.parallel.streaming_events import EventsStreamingBatcher

    sig, _ = _sim_read(nbase=600, seed=53)
    bat = EventsStreamingBatcher(CHUNK, OV, batch_size=8)
    bat.add_stream("c")
    got = bat.feed("c", sig)        # queue never fills a batch of 8
    bat.decode_pending()            # poller hook: decode, don't collect
    got += bat.collect("c")
    got += bat.flush("c")
    solo = EventsStreamingBasecaller(CHUNK, OV)
    solo.feed(sig)
    solo.flush()
    assert got == solo.sequence


@pytest.mark.parametrize("mode", ["prefix", "frozen"])
def test_events_stream_degenerate_first_chunk(mode):
    """A flat (blocked-pore) opening chunk must NOT poison the
    studentisation statistics: frozen mode must not freeze zero-variance
    scales that would blank every later chunk's features; prefix mode
    must not accumulate the stall's single huge event."""
    sig, _ = _sim_read(nbase=1400, seed=47)
    flat = np.full(CHUNK, 42.0, np.float32)
    sb = EventsStreamingBasecaller(CHUNK, OV, stats_mode=mode)
    sb.feed(flat)
    if mode == "frozen":
        # degenerate (single zero-variance event): must NOT freeze
        assert sb._feat_stats is None
    else:
        # the stall event must NOT enter the running accumulators
        assert sb._stats_n == 0
    sb.feed(sig)
    if mode == "frozen":
        # a pure-real chunk (no stall-event outlier) eventually freezes
        assert sb._feat_stats is not None
    else:
        assert sb._stats_n >= 32
    sb.flush()
    # the healthy region still basecalls (old behaviour: poisoned
    # scales forever -> near-empty or constant garbage output)
    assert len(sb.sequence) > 700


def test_events_stream_prefix_default_and_invariance():
    """Default stats_mode is 'prefix'; output is increment-invariant and
    in the same accuracy class as frozen mode on a simulated read (the
    real-read gain is recorded in BASELINE.md)."""
    import Levenshtein

    sig, truth = _sim_read(nbase=900, seed=49)
    sb = EventsStreamingBasecaller(CHUNK, OV)
    assert sb._stats_mode == "prefix"
    sb.feed(sig)
    sb.flush()
    # invariance across a different feed split
    sb2 = EventsStreamingBasecaller(CHUNK, OV)
    for i in range(0, len(sig), 777):
        sb2.feed(sig[i:i + 777])
    sb2.flush()
    assert sb.sequence == sb2.sequence

    def ident(a, b):
        return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)

    fz = EventsStreamingBasecaller(CHUNK, OV, stats_mode="frozen")
    fz.feed(sig)
    fz.flush()
    assert ident(sb.sequence, truth) > ident(fz.sequence, truth) - 0.02

    with pytest.raises(ValueError):
        EventsStreamingBasecaller(CHUNK, OV, stats_mode="whole")

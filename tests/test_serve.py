"""Dynamic-batching basecall service + TCP server (scrappie_tpu/serve.py).

Checks: concurrent submissions batch into few engine calls and return
the same sequences as a direct engine call; differing decode options
split batches; the TCP wire protocol round-trips reads from multiple
connections; closing fails queued work instead of hanging clients.
"""

import json
import socket
import threading

import numpy as np
import pytest

from scrappie_tpu.serve import BasecallService, make_server


@pytest.fixture(scope="module")
def sim_reads():
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sim = SquiggleSimulator(seed=21)
    reads = []
    for n in (300, 400, 350, 320):
        sig, bases, _ = sim.simulate_read(n)
        reads.append(np.asarray(sig, np.float32))
    return reads


def _engine_direct(reads, **opts):
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    eng = BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=400,
                         batch_size=4)
    return eng.basecall_signals(
        [RawSignal(r, uuid=f"r{i}") for i, r in enumerate(reads)], **opts)


def test_service_batches_and_matches_engine(sim_reads):
    direct = _engine_direct(sim_reads)
    with BasecallService("rgrgr_r94", chunk_len=2000, overlap=400,
                         batch_size=4, max_wait_ms=300.0) as svc:
        futs = [svc.submit(r, uuid=f"r{i}") for i, r in enumerate(sim_reads)]
        results = [f.result(timeout=600) for f in futs]
        # all four submitted inside the wait window -> one engine call
        assert svc.stats["engine_calls"] <= 2
    for got, want in zip(results, direct):
        assert got.sequence == want.sequence
        assert got.sequence


def test_service_splits_on_options(sim_reads):
    with BasecallService("rgrgr_r94", chunk_len=2000, overlap=400,
                         batch_size=4, max_wait_ms=300.0) as svc:
        f1 = svc.submit(sim_reads[0], uuid="a")
        f2 = svc.submit(sim_reads[1], uuid="b", local_pen=9.0)
        r1, r2 = f1.result(600), f2.result(600)
        assert svc.stats["engine_calls"] == 2  # different opts: two calls
    assert r1.sequence and r2.sequence


def test_service_close_fails_queued():
    svc = BasecallService("rgrgr_r94", chunk_len=2000, overlap=400,
                          batch_size=4)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(100, np.float32))


def test_service_poisoned_read_isolated(sim_reads):
    """A bad read co-batched with good ones fails alone: the engine's
    per-read isolation (ref src/scrappie_raw.c:397-400) carries through
    the service — good requests still resolve with sequences."""
    bad = np.full(4000, np.nan, np.float32)
    with BasecallService("rgrgr_r94", chunk_len=2000, overlap=400,
                         batch_size=4, max_wait_ms=300.0) as svc:
        futs = [svc.submit(sim_reads[0], uuid="good0"),
                svc.submit(bad, uuid="bad"),
                svc.submit(sim_reads[1], uuid="good1")]
        good0, badr, good1 = [f.result(timeout=600) for f in futs]
    assert good0.sequence and good1.sequence
    assert badr.sequence is None  # isolated failure, not an exception


def test_tcp_server_roundtrip(sim_reads):
    direct = _engine_direct(sim_reads[:2])
    server = make_server(port=0, model="rgrgr_r94", chunk_len=2000,
                         overlap=400, batch_size=4, max_wait_ms=200.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def client(i):
            with socket.create_connection(("127.0.0.1", port), timeout=600) as s:
                req = {"id": f"r{i}", "signal": sim_reads[i].tolist()}
                s.sendall((json.dumps(req) + "\n").encode())
                buf = b""
                while not buf.endswith(b"\n"):
                    chunk = s.recv(1 << 20)
                    if not chunk:
                        break
                    buf += chunk
            return json.loads(buf)

        out = [None, None]
        threads = [threading.Thread(target=lambda i=i: out.__setitem__(i, client(i)))
                   for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        for i in range(2):
            assert out[i] is not None, "client timed out"
            assert out[i]["id"] == f"r{i}"
            assert out[i]["sequence"] == direct[i].sequence
    finally:
        server.shutdown()
        server.service.close()
        server.server_close()


def test_tcp_server_bad_request():
    server = make_server(port=0, model="rgrgr_r94", chunk_len=2000,
                         overlap=400, batch_size=4)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            s.sendall(b'{"id": "x", "signal": "not-a-list"}\n')
            resp = json.loads(s.makefile().readline())
        assert resp["id"] == "x" and "error" in resp
    finally:
        server.shutdown()
        server.service.close()
        server.server_close()


def test_tcp_live_channels(sim_reads):
    """Live channel ops: two connections each stream a read in pieces;
    results equal solo StreamingBasecaller output."""
    from scrappie_tpu.parallel.streaming import StreamingBasecaller

    server = make_server(port=0, model="rgrgr_r94", chunk_len=2000,
                         overlap=400, batch_size=4,
                         streaming_kwargs={"poll_ms": 100.0})
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def solo(sig):
        sb = StreamingBasecaller("rgrgr_r94", 2000, 400)
        sb.feed(sig)
        sb.flush()
        return sb.sequence

    def live(i):
        sig = sim_reads[i]
        with socket.create_connection(("127.0.0.1", port), timeout=600) as s:
            s.settimeout(600)
            f = s.makefile()
            def rpc(obj):
                s.sendall((json.dumps(obj) + "\n").encode())
                return json.loads(f.readline())
            assert rpc({"op": "open", "channel": "c"})["open"]
            bases = ""
            for off in range(0, len(sig), 1500):
                r = rpc({"op": "feed", "channel": "c",
                         "signal": sig[off : off + 1500].tolist()})
                bases += r["bases"]
            r = rpc({"op": "flush", "channel": "c"})
            assert r["final"]
            return bases + r["bases"]

    try:
        out = [None, None]
        ths = [threading.Thread(target=lambda i=i: out.__setitem__(i, live(i)))
               for i in range(2)]
        for th in ths:
            th.start()
        for th in ths:
            th.join(timeout=600)
        for i in range(2):
            assert out[i] is not None
            assert out[i] == solo(sim_reads[i])
    finally:
        server.shutdown()
        server.service.close()
        if server._ss is not None:
            server._ss.close()
        server.server_close()


def test_tcp_stats_op():
    server = make_server(port=0, model="rgrgr_r94", chunk_len=2000,
                         overlap=400, batch_size=4)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            s.sendall(b'{"id": "st", "op": "stats"}\n')
            resp = json.loads(s.makefile().readline())
        assert resp["id"] == "st"
        for k in ("requests", "batches", "engine_calls"):
            assert k in resp
    finally:
        server.shutdown()
        server.service.close()
        server.server_close()


def test_tcp_model_routing(sim_reads):
    """Per-request model override: one server, many models (lazily
    instantiated); unknown models error without killing the connection."""
    server = make_server(port=0, model="rgrgr_r94", chunk_len=2000,
                         overlap=400, batch_size=4)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=600) as s:
            s.settimeout(600)
            f = s.makefile()

            def rpc(obj):
                s.sendall((json.dumps(obj) + "\n").encode())
                return json.loads(f.readline())

            sig = sim_reads[0].tolist()
            r_def = rpc({"id": "d", "signal": sig})
            r_crf = rpc({"id": "c", "signal": sig, "model": "rnnrf_r94"})
            r_bad = rpc({"id": "x", "signal": sig, "model": "nope"})
        assert r_def["sequence"] and r_crf["sequence"]
        assert r_def["sequence"] != r_crf["sequence"]  # different decoders
        assert "error" in r_bad and "nope" in r_bad["error"]
        assert "rnnrf_r94" in server._model_services
    finally:
        server.shutdown()
        server.service.close()
        for svc in server._model_services.values():
            svc.close()
        server.server_close()


def test_tcp_live_events_pipeline(sim_reads):
    """Live channel with pipeline=events routes to the events batcher
    and equals a solo EventsStreamingBasecaller."""
    from scrappie_tpu.parallel.streaming_events import (
        EventsStreamingBasecaller,
    )

    server = make_server(port=0, model="rgrgr_r94", chunk_len=2000,
                         overlap=400, batch_size=4,
                         streaming_kwargs={"poll_ms": 100.0})
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    sig = sim_reads[1]
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=600) as s:
            s.settimeout(600)
            f = s.makefile()

            def rpc(obj):
                s.sendall((json.dumps(obj) + "\n").encode())
                return json.loads(f.readline())

            r = rpc({"op": "open", "channel": "e", "pipeline": "events"})
            assert r.get("open"), r
            bases = ""
            for off in range(0, len(sig), 1700):
                r = rpc({"op": "feed", "channel": "e",
                         "signal": sig[off : off + 1700].tolist()})
                assert "error" not in r, r
                bases += r["bases"]
            r = rpc({"op": "flush", "channel": "e"})
            bases += r["bases"]
        # the events batcher inherits the SERVER's chunk geometry
        solo = EventsStreamingBasecaller(2000, 400)
        solo.feed(sig)
        solo.flush()
        assert bases == solo.sequence and bases
    finally:
        server.shutdown()
        server.service.close()
        if server._ss is not None:
            server._ss.close()
        server.server_close()


def test_service_fast_mode_with_ensemble(sim_reads):
    """mode='fast' serves the fused pipeline (round 5: incl. the fused
    multi-model ensemble, CLI `serve --fast`): service results equal a
    direct fast-mode ensemble engine call, and the mode is live (fast
    differs from stitch at the reflected chunk tail on off-grid
    reads)."""
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    kw = dict(chunk_len=4000, overlap=500, batch_size=4,
              ensemble=("rgrgr_r941", "rgrgr_r10"))
    eng = BasecallEngine("rgrgr_r94", mode="fast", **kw)
    want = eng.basecall_signals(
        [RawSignal(r, uuid=f"r{i}") for i, r in enumerate(sim_reads)])
    with BasecallService("rgrgr_r94", mode="fast", max_wait_ms=300.0,
                         **kw) as fast:
        got = [f.result(timeout=600) for f in
               [fast.submit(r, uuid=f"r{i}")
                for i, r in enumerate(sim_reads)]]
    for g, w in zip(got, want):
        assert g.sequence == w.sequence
        assert g.sequence

"""Fault-injection (chaos) and tracing-subsystem tests.

The reference's Chaos build type makes malloc fail with probability p
and asserts the pipeline degrades gracefully (ref
src/scrappie_stdlib.h:10-37, CMakeLists.txt:89-99, per-read isolation
src/scrappie_raw.c:397-400).  Here the chaos monkey strikes the ingest
and preprocessing boundaries; the batch engine must warn and continue.
"""

import json

import numpy as np
import pytest

from scrappie_tpu.types import RawSignal
from scrappie_tpu.utils import chaos
from scrappie_tpu.utils.tracing import Stage, log


@pytest.fixture(autouse=True)
def _reset_chaos():
    yield
    chaos.set_chaos(0.0)


def test_maybe_fail_probability():
    chaos.set_chaos(1.0, seed=1)
    with pytest.raises(chaos.ChaosError):
        chaos.maybe_fail("unit")
    chaos.set_chaos(0.0)
    chaos.maybe_fail("unit")  # never raises when disabled


def test_read_raw_chaos(reads_dir):
    from scrappie_tpu.io.fast5 import read_raw

    files = sorted(reads_dir.glob("*.fast5"))
    chaos.set_chaos(1.0, seed=2)
    with pytest.raises(chaos.ChaosError):
        read_raw(files[0])
    chaos.set_chaos(0.0)
    rs = read_raw(files[0])
    assert rs.n > 0


def test_engine_survives_chaos_reads(reads_dir):
    """basecall_files: injected read failures only drop those reads."""
    from scrappie_tpu.parallel.runner import BasecallEngine

    files = sorted(str(p) for p in reads_dir.glob("*.fast5"))
    engine = BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=500,
                            batch_size=8)
    chaos.set_chaos(0.5, seed=3)  # roughly half the reads fail to load
    results = engine.basecall_files(files, limit=2)
    chaos.set_chaos(0.0)
    # The engine must return (not raise); surviving reads basecall.
    assert isinstance(results, list)
    for _, r in results:
        assert r.sequence is None or len(r.sequence) > 0


def test_engine_survives_preprocess_fault():
    """A poisoned signal (NaN-free API misuse analogue: zero-length)
    fails preprocessing for that read only."""
    from scrappie_tpu.parallel.runner import BasecallEngine

    from scrappie_tpu.train.simulate import SquiggleSimulator

    rng = np.random.default_rng(0)
    # a decodable read: the real-read fine-tuned weights (correctly)
    # basecall white noise to nothing, which would mask the isolation
    good_sig, _, _ = SquiggleSimulator(seed=5).simulate_read(300)
    good = RawSignal(good_sig[:4000], uuid="good")

    class Boom(np.ndarray):
        pass

    bad_arr = rng.standard_normal(4000).astype(np.float32)
    bad = RawSignal(bad_arr, uuid="bad")
    engine = BasecallEngine("rgrgr_r94", chunk_len=2000, overlap=500,
                            batch_size=8)

    # Patch trim to blow up for the 'bad' read — simulates any
    # preprocessing fault (chaos, corrupt data).
    import scrappie_tpu.parallel.runner as runner_mod

    orig = runner_mod.trim_and_segment_raw

    def flaky(rs, *a, **kw):
        if rs.uuid == "bad":
            raise chaos.ChaosError("injected")
        return orig(rs, *a, **kw)

    runner_mod.trim_and_segment_raw = flaky
    try:
        results = engine.basecall_signals([bad, good], trim_start=10,
                                          trim_end=10)
    finally:
        runner_mod.trim_and_segment_raw = orig
    assert results[0].sequence is None          # bad read isolated
    assert results[1].sequence is not None      # good read basecalled
    assert len(results[1].sequence) > 0


def test_stage_timer_and_log(capsys, monkeypatch):
    st = Stage()
    with st("alpha"):
        pass
    with st("alpha"):
        pass
    rep = st.report()
    assert rep["alpha"]["calls"] == 2 and rep["alpha"]["seconds"] >= 0

    monkeypatch.setenv("SCRAPPIE_TPU_LOG", "info")
    log("info", "hello", n=1)
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["msg"] == "hello" and rec["n"] == 1

    monkeypatch.setenv("SCRAPPIE_TPU_LOG", "error")
    log("info", "suppressed")
    assert "suppressed" not in capsys.readouterr().err

"""Runtime guard for the skip-penalty decode collapse.

models/calibration.py documents the measured failure: on the third
bundled read (ch228) a positive skip penalty can absorb the whole call
into the decoder's local start/end states — the events grid point
(stay 1.5, skip 0.5) called 88 bases instead of ~1900.  The guard
detects the signature (implausibly few bases per block), warns, and
re-decodes with skip_pen=0.
"""

import numpy as np
import pytest

from scrappie_tpu.models.calibration import (COLLAPSE_BASES_PER_BLOCK,
                                             COLLAPSE_MIN_BLOCKS, collapsed)


def test_collapsed_predicate():
    # the measured ch228 signature: 88 bases on ~5700 blocks
    assert collapsed(88, 5700)
    # healthy transducer calls: ~1 base per 2.5-4 blocks
    assert not collapsed(1900, 5700)
    assert not collapsed(int(0.25 * 1000), 1000)
    # empty call on a long read is a collapse...
    assert collapsed(0, COLLAPSE_MIN_BLOCKS)
    # ...but short reads are exempt (legitimately empty calls exist)
    assert not collapsed(0, COLLAPSE_MIN_BLOCKS - 1)
    # boundary: strictly-below the floor triggers
    assert not collapsed(int(COLLAPSE_BASES_PER_BLOCK * 1000), 1000)
    assert collapsed(int(COLLAPSE_BASES_PER_BLOCK * 1000) - 1, 1000)


def test_partial_collapse_model_aware():
    """The model-aware trigger (VERDICT r4 #3): the measured ch228
    PARTIAL ensemble collapse (1,168 bases / 5,778 blocks = 0.202
    bases/block) sits 4x above the absolute threshold but below
    COLLAPSE_FRACTION of the flagship's measured healthy prior."""
    from scrappie_tpu.models.calibration import EXPECTED_BASES_PER_BLOCK

    assert not collapsed(1168, 5778)          # the old guard missed it...
    assert collapsed(1168, 5778, "rgrgr_r94")  # ...the prior catches it
    # the healthy single-model ch228 call (1,932 bases) passes
    assert not collapsed(1932, 5778, "rgrgr_r94")
    # every measured healthy rate clears its own model's trigger
    for m, e in EXPECTED_BASES_PER_BLOCK.items():
        assert not collapsed(int(e * 1000), 1000, m), m
    # unknown models keep the absolute fallback
    assert not collapsed(60, 1000, "mystery_model")
    assert collapsed(40, 1000, "mystery_model")


@pytest.mark.slow
def test_ensemble_partial_collapse_on_ch228_guarded(reads_dir, monkeypatch,
                                                    capsys):
    """The measured round-4 failure end-to-end: ensemble + full
    (0.5, 0.5) preset on ch228 part-collapsed to 1,168 bases
    (BASELINE.md robustness caveat) below the old guard's threshold.
    The model-aware guard must now catch it and re-decode to the
    robust ~1,845-base call."""
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.parallel.runner import BasecallEngine
    from scrappie_tpu.types import RawSignal

    monkeypatch.setenv("SCRAPPIE_TPU_LOG", "warn")
    rs = read_raw(reads_dir / "read_ch228_file118.fast5", scale_to_pA=True)
    eng = BasecallEngine("rgrgr_r94", batch_size=8,
                         ensemble=("rgrgr_r941", "rgrgr_r10"))
    res = eng.basecall_signals([RawSignal(rs.raw, uuid="ch228")],
                               stay_pen=0.5, skip_pen=0.5)[0]
    err = capsys.readouterr().err
    assert "re-decoding with skip_pen=0" in err
    assert len(res.sequence or "") > 1700, len(res.sequence or "")


def test_ensemble_real_preset_is_robust_by_default():
    """--ensemble + --calibration real defaults to (stay, skip=0): the
    config that is robust on the OOD read and still beats every
    single-model config on the tails (VERDICT r4 #3)."""
    from scrappie_tpu.models import calibration

    solo = calibration.apply("rgrgr_r94", "real", {})
    assert solo == {"stay_pen": 0.5, "skip_pen": 0.5}
    ens = calibration.apply("rgrgr_r94", "real", {},
                            ensemble=("rgrgr_r941", "rgrgr_r10"))
    assert ens == {"stay_pen": 0.5, "skip_pen": 0.0}
    # an explicit user skip_pen always wins over the robust default
    explicit = calibration.apply("rgrgr_r94", "real", {"skip_pen": 0.7},
                                 ensemble=("rgrgr_r941",))
    assert explicit["skip_pen"] == 0.7


def test_decode_post_guard_redecodes(monkeypatch, capsys):
    """A posterior crafted to collapse under a huge skip_pen decodes
    sanely through the guard (and warns)."""
    from scrappie_tpu import api

    monkeypatch.setenv("SCRAPPIE_TPU_LOG", "warn")
    rng = np.random.default_rng(1)
    T, ns = 200, 1025
    # A kmer walk advancing TWO bases per block with strong evidence: a
    # healthy decode traverses it entirely with skip moves (2 bases per
    # block).  A large skip_pen charges that path per block until the
    # all-local route (local_pen per block) wins, collapsing the call —
    # the synthetic analogue of the measured ch228 failure.
    p = np.full((T, ns), 1e-6)
    kmer = 7
    for t in range(T):
        kmer = ((kmer << 4) & 1023) | int(rng.integers(16))
        p[t, kmer] = 1.0
    lp = np.log(p / p.sum(-1, keepdims=True)).astype(np.float32)
    post = api.Posterior(lp, "rgrgr_r94")

    seq0, _, _ = api.decode_post(post, "rgrgr_r94", skip_pen=0.0)
    assert not collapsed(len(seq0 or ""), T)
    # sanity: without the guard this skip_pen collapses the call
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.post.overlapper import overlapper

    _, raw_path = decode_transducer(lp, 0.0, 1e5, 2.0)
    raw_seq = overlapper(raw_path, 1024) or ""
    assert collapsed(len(raw_seq), T)

    seq, score, pos = api.decode_post(post, "rgrgr_r94", skip_pen=1e5)
    err = capsys.readouterr().err
    assert "re-decoding with skip_pen=0" in err
    assert seq == seq0
    assert not collapsed(len(seq or ""), T)


@pytest.mark.slow
def test_events_collapsing_preset_on_ch228(reads_dir, monkeypatch, capsys):
    """The measured collapse: events model, (stay 1.5, skip 0.5), read
    ch228.  With the guard the call is sane instead of 88 bases, and a
    warning is emitted."""
    from scrappie_tpu import api
    from scrappie_tpu.io.fast5 import read_raw

    monkeypatch.setenv("SCRAPPIE_TPU_LOG", "warn")
    rs = read_raw(reads_dir / "read_ch228_file118.fast5")
    seq, score, et, start, end = api.basecall_events(
        rs.raw, stay_pen=1.5, skip_pen=0.5)
    err = capsys.readouterr().err
    assert seq is not None
    assert "re-decoding with skip_pen=0" in err
    # the collapsed call was 88 bases; the guard's skip_pen=0 re-decode
    # must match a direct (stay 1.5, skip 0) decode (~493 bases here —
    # stay_pen=1.5 legitimately shortens this read's call; only the
    # skip-driven local-state collapse is the guarded failure)
    seq0, _, _, _, _ = api.basecall_events(rs.raw, stay_pen=1.5, skip_pen=0.0)
    assert seq == seq0
    assert len(seq) > 5 * 88, len(seq)

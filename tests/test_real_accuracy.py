"""Real-read basecall accuracy floor.

Basecalls the bundled truth reads (the only real labelled data the
reference ships) with the production engine and asserts identity
against the truth FASTA.  Guards the round-2 real-read fine-tuning
(BASELINE.md "Real-read accuracy"): simulated-only weights scored
0.667/0.609 here, the shipped weights 0.750/0.799.
"""

import glob

import Levenshtein
import numpy as np
import pytest

FLOOR = 0.70

_RC = str.maketrans("ACGT", "TGCA")


def identity(a: str, b: str) -> float:
    return 1.0 - Levenshtein.distance(a, b) / max(len(a), len(b), 1)


@pytest.fixture(scope="module")
def truth_pairs(reads_dir):
    pairs = []
    for fa in sorted(glob.glob(str(reads_dir / "*_strand.fa"))):
        truth = "".join(l.strip() for l in open(fa) if not l.startswith(">"))
        pairs.append((fa[: -len(".fa")] + ".fast5", truth))
    if not pairs:
        pytest.skip("no bundled truth reads")
    return pairs


def test_rgrgr_r94_real_read_identity(truth_pairs):
    from scrappie_tpu.parallel.runner import BasecallEngine

    engine = BasecallEngine("rgrgr_r94", batch_size=16)
    results = engine.basecall_files([f5 for f5, _ in truth_pairs])
    for (f5, truth), (_, res) in zip(truth_pairs, results):
        seq = res.sequence or ""
        ident = max(identity(seq, truth),
                    identity(seq, truth.translate(_RC)[::-1]))
        assert ident >= FLOOR, (
            f"{f5}: identity {ident:.3f} below floor {FLOOR}")

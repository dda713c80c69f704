"""Basecall parity with the reference C implementation.

The reference binary is built from the reference sources (copied into
the gitignored .baseline/ working area) with OUR weights exported as C
headers (scripts/export_c_headers.py + scripts/build_baseline.sh).
Running both implementations on the identical normalised signal must
yield near-identical basecalls — the analogue of the reference's own
SSE-vs-scalar decoder parity test (ref src/test/test_scrappie_decoding.c)
but across implementations.  The decoder is bit-identical (tests/test_ops);
the posterior GEMMs differ at the float-reassociation level between
CBLAS and XLA, so a borderline block can flip: the round-1 weights were
byte-identical, the retrained (higher-accuracy) weights flip a single
block on the bundled read, so the assertion allows <= 2 edits.

Skipped when the baseline binary has not been built.
"""

import pathlib
import subprocess

import numpy as np
import pytest

DRIVER = pathlib.Path(__file__).parent.parent / ".baseline" / "src" / "bench_driver"


@pytest.mark.skipif(not DRIVER.exists(), reason="baseline binary not built")
def test_basecall_parity_with_reference(reads_dir, tmp_path):
    from scrappie_tpu.decode.transducer import decode_transducer
    from scrappie_tpu.io.fast5 import read_raw
    from scrappie_tpu.models import forward, registry
    from scrappie_tpu.post.overlapper import overlapper
    from scrappie_tpu.signal.trim import trim_and_segment_raw
    from scrappie_tpu.utils.maths import medmad_normalise

    rs = read_raw(reads_dir / "read_ch228_file118.fast5")
    rt = trim_and_segment_raw(rs, 200, 10)
    norm = medmad_normalise(rt.trimmed)
    sig_file = tmp_path / "signal.txt"
    np.savetxt(sig_file, norm, fmt="%.9g")

    ref = subprocess.run([str(DRIVER), str(sig_file)], capture_output=True,
                         text=True, timeout=600)
    assert ref.returncode == 0, ref.stderr
    fields = dict(line.split("\t") for line in ref.stdout.strip().splitlines())

    params = registry.load_params("rgrgr_r94")
    lp = np.asarray(
        forward.rgrgr_posterior(params, norm.reshape(1, -1, 1),
                                conv_activation="elu", stride=5, min_prob=1e-5)
    )[0]
    score, path = decode_transducer(lp, 0.0, 0.0, 2.0)
    seq = overlapper(path, 1024)

    import Levenshtein

    edit = Levenshtein.distance(seq, fields["sequence"])
    assert edit <= 2, f"basecalls differ from reference binary by {edit} edits"
    ref_score = float(fields["score"])
    assert abs(score - ref_score) / abs(ref_score) < 1e-3

"""C embed surface (native/embed): build the shim + demo with the
system compiler, basecall a simulated read from C, and compare with the
Python API's answer.  The analogue of the reference's exported C API
(ref interface/scrappie.h:47-52)."""

import os
import pathlib
import shutil
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier (see pyproject)

REPO = pathlib.Path(__file__).resolve().parent.parent
EMBED = REPO / "native" / "embed"


@pytest.fixture(scope="module")
def demo_bin(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    ldlib = sysconfig.get_config_var("LDLIBRARY") or ""
    pyver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION")
    out = tmp_path_factory.mktemp("embed") / "embed_demo"
    cmd = [cc, "-O2", "-I", str(EMBED), "-I", inc,
           str(EMBED / "embed_demo.c"), str(EMBED / "scrappie_tpu_embed.c"),
           f"-L{libdir}", f"-lpython{pyver}", "-ldl", "-lm",
           f"-Wl,-rpath,{libdir}", "-o", str(out)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"embed shim does not build here: {r.stderr[-400:]}")
    assert ldlib  # libpython exists
    return out


def test_embed_basecall_matches_python(demo_bin, tmp_path):
    from scrappie_tpu import api
    from scrappie_tpu.train.simulate import SquiggleSimulator

    sim = SquiggleSimulator(seed=11)
    sig, _, _ = sim.simulate_read(500)
    sig = sig[:4000]
    med = np.median(sig)
    mad = np.median(np.abs(sig - med)) * 1.4826
    # Scale to a plausible pA-ish range so trim/scale has work to do
    raw = ((sig - med) / mad * 12.0 + 90.0).astype(np.float32)

    want_seq, want_score = api.basecall_raw(raw, model="rgrgr_r94")[:2]

    f32 = tmp_path / "sig.f32"
    raw.tofile(f32)
    env = dict(os.environ, SCRAPPIE_TPU_PLATFORM="cpu",
               PYTHONPATH=str(REPO) + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run([str(demo_bin), str(f32), "rgrgr_r94"],
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr
    score_str, seq = r.stdout.split(None, 1)
    assert seq.strip() == want_seq
    assert float(score_str) == pytest.approx(float(want_score), abs=1e-3)
    assert "post " in r.stderr  # calc_post path exercised

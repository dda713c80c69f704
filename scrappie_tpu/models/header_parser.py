"""Parser for the reference's generated C weight headers.

The reference bakes model weights into C headers as `_Mat` structs of hex
floats, column-major with rows padded to multiples of 4 for SSE (emitted
by misc/parse_*.py; struct layout src/scrappie_matrix.h:10-26).  This
module recovers logical numpy arrays from those headers so that models
with surviving weights (the squiggle family) run with their real
parameters.

Conventions recovered here:
  * `_Mat` with nr/nrq/nc/stride: logical matrix is [nr, nc], data laid
    out column-major with column stride = 4*nrq.  We return it as a numpy
    array of shape [nr, nc] (so `affine_map(X, W, b) == X @ W + b` in our
    time-major convention).
  * conv filters additionally pad each *window slot* of the flattened
    (winlen x nfeature) axis to a multiple of 4 (misc/parse_squiggle.py:
    65-77): nr == (winlen-1)*ceil4(nfeature) + nfeature.  We reshape to
    [winlen, nfeature, nfilter].
"""

from __future__ import annotations

import re

import numpy as np

_ARRAY_RE = re.compile(
    r"float\s+__(?P<name>\w+)\s*\[\s*\d*\s*\]\s*=\s*\{(?P<body>.*?)\};", re.S
)
_MAT_RE = re.compile(
    r"_Mat\s+_(?P<name>\w+)\s*=\s*\{\s*"
    r"\.nr\s*=\s*(?P<nr>\d+)\s*,\s*"
    r"\.nrq\s*=\s*(?P<nrq>\d+)\s*,\s*"
    r"\.nc\s*=\s*(?P<nc>\d+)\s*,\s*"
    r"\.stride\s*=\s*(?P<stride>\d+)\s*,\s*"
    r"\.data\.f\s*=\s*__(?P<data>\w+)\s*\}",
    re.S,
)
_CONST_RE = re.compile(r"const\s+(?:int|size_t)\s+_?(?P<name>\w+)\s*=\s*(?P<val>-?\d+)\s*;")


def _parse_hex_floats(body: str) -> np.ndarray:
    toks = [t.strip() for t in body.replace("\n", " ").split(",")]
    return np.array([float.fromhex(t) for t in toks if t], dtype=np.float32)


def parse_header(path) -> tuple[dict[str, np.ndarray], dict[str, int]]:
    """Parse a weight header into {symbol: [nr, nc] array} plus int consts."""
    with open(path) as fh:
        text = fh.read()

    raw_arrays = {m["name"]: _parse_hex_floats(m["body"]) for m in _ARRAY_RE.finditer(text)}
    consts = {m["name"]: int(m["val"]) for m in _CONST_RE.finditer(text)}

    mats: dict[str, np.ndarray] = {}
    for m in _MAT_RE.finditer(text):
        nr, nc, stride = int(m["nr"]), int(m["nc"]), int(m["stride"])
        flat = raw_arrays[m["data"]]
        if len(flat) < stride * nc:
            raise ValueError(f"{path}: symbol {m['name']} too short")
        mats[m["name"]] = flat[: stride * nc].reshape(nc, stride)[:, :nr].T.copy()
    return mats, consts


def ceil4(n: int) -> int:
    return -(-n // 4) * 4


def conv_filter_from_mat(mat: np.ndarray, winlen: int) -> np.ndarray:
    """Recover a [winlen, nfeature, nfilter] filter from a padded conv _Mat.

    The stored matrix has nr = (winlen-1)*ceil4(nfeature) + nfeature rows
    per filter column, window-major with each window slot zero-padded to a
    multiple of 4 (misc/parse_squiggle.py:65-77).
    """
    nr, nfilter = mat.shape
    # Solve nr = (winlen-1)*ceil4(f) + f for nfeature f.
    nfeature = None
    for f in range(1, nr + 1):
        if (winlen - 1) * ceil4(f) + f == nr:
            nfeature = f
            break
    if nfeature is None:
        raise ValueError(f"cannot infer nfeature from nr={nr}, winlen={winlen}")
    slot = ceil4(nfeature)
    padded = np.zeros((winlen * slot, nfilter), dtype=np.float32)
    padded[: mat.shape[0]] = mat
    return padded.reshape(winlen, slot, nfilter)[:, :nfeature, :].copy()


def load_squiggle_header(path, model_id: str) -> dict[str, np.ndarray]:
    """Load a squiggle_* header into our parameter-pytree convention.

    Returns {embed_W [4,3], convK_W [winlen,in,out], convK_b [out],
    convK_stride} for K in 1..6 (graph: src/networks.c:397-451).
    """
    mats, consts = parse_header(path)
    p: dict[str, np.ndarray] = {}
    # Embedding: stored [nr=3, nc=4] (vector x base); ours is [base, vec].
    p["embed_W"] = mats[f"embed_squiggle_{model_id}_W"].T.copy()
    for k in range(1, 7):
        base = f"conv{k}_squiggle_{model_id}_"
        winlen = consts[base + "winlen"]
        p[f"conv{k}_W"] = conv_filter_from_mat(mats[base + "W"], winlen)
        p[f"conv{k}_b"] = mats[base + "b"].ravel()
        p[f"conv{k}_stride"] = np.int64(consts[base + "stride"])
    return p

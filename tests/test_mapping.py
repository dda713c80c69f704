"""Squiggle DTW and posterior-to-sequence mapping tests vs scalar ports."""

import numpy as np
import pytest

from scrappie_tpu.decode import mapping
from scrappie_tpu.decode.dtw import squiggle_match_forward, squiggle_match_viterbi

BIG = 1.0e30


# ---------------------------------------------------------------- scalar ports

def scalar_map_viterbi(lp, seq, stay_pen, skip_pen, local_pen):
    T, nst = lp.shape
    seqlen = len(seq)
    START, END = seqlen, seqlen + 1
    cs = np.full(seqlen + 2, -BIG)
    cs[START] = 0.0
    tb = np.zeros((T, seqlen + 2), dtype=np.int64)
    for t in range(T):
        ps = cs.copy()
        stay = lp[t, nst - 1]
        cs[START] = ps[START] + max(-local_pen, stay)
        tb[t, START] = START
        cs[END] = ps[END] + max(-local_pen, stay)
        tb[t, END] = END
        for pos in range(seqlen):
            cs[pos] = ps[pos] - stay_pen + stay
            tb[t, pos] = pos
        for pos in range(1, seqlen):
            c = ps[pos - 1] + lp[t, seq[pos]]
            if c > cs[pos]:
                cs[pos] = c
                tb[t, pos] = pos - 1
        for pos in range(2, seqlen):
            c = ps[pos - 2] - skip_pen + lp[t, seq[pos]]
            if c > cs[pos]:
                cs[pos] = c
                tb[t, pos] = pos - 2
        c = ps[START] + lp[t, seq[0]]
        if c > cs[0]:
            cs[0] = c
            tb[t, 0] = START
        c = ps[seqlen - 1] - local_pen
        if c > cs[END]:
            cs[END] = c
            tb[t, END] = seqlen - 1
    score = max(cs[seqlen - 1], cs[END])
    path = np.zeros(T, dtype=np.int64)
    path[T - 1] = seqlen - 1 if cs[seqlen - 1] > cs[END] else END
    for t in range(T - 1, 0, -1):
        path[t - 1] = tb[t, path[t]]
    path[(path == START) | (path == END)] = -1
    return score, path


def lse(a, b):
    return np.logaddexp(a, b)


def scalar_map_forward(lp, seq, stay_pen, skip_pen, local_pen):
    T, nst = lp.shape
    seqlen = len(seq)
    START, END = seqlen, seqlen + 1
    cs = np.full(seqlen + 2, -BIG)
    cs[START] = 0.0
    for t in range(T):
        ps = cs.copy()
        stay = lp[t, nst - 1]
        cs[START] = ps[START] + lse(-local_pen, stay)
        cs[END] = ps[END] + lse(-local_pen, stay)
        for pos in range(seqlen):
            cs[pos] = ps[pos] - stay_pen + stay
        for pos in range(1, seqlen):
            cs[pos] = lse(cs[pos], ps[pos - 1] + lp[t, seq[pos]])
        for pos in range(2, seqlen):
            cs[pos] = lse(cs[pos], ps[pos - 2] - skip_pen + lp[t, seq[pos]])
        cs[0] = lse(cs[0], ps[START] + lp[t, seq[0]])
        cs[END] = lse(cs[END], ps[seqlen - 1] - local_pen)
    return lse(cs[seqlen - 1], cs[END])


def scalar_map_banded(lp, seq, low, high, stay_pen, skip_pen, local_pen, viterbi):
    """Direct scalar port of the reference banded recursion
    (ref src/decode.c:1706-1840 viterbi, :1844-1964 forward), including
    the first-block seeding of positions 0/1/2, the start->end move in
    the first block only, the clipped per-block ranges, and the vector
    swap that leaves stale out-of-band values behind.

    Caveat: when a band widens by more than 2 positions per block the
    reference reads those stale (two-blocks-old) entries — uninitialised
    -BIG at best, a latent bug at worst.  The device version treats them
    as unreachable; test bands therefore widen by <= 2 per block."""
    T, nst = lp.shape
    seqlen = len(seq)
    STAY = nst - 1
    START, END = seqlen, seqlen + 1
    comb = max if viterbi else lse
    lstay = (lambda s: max(-local_pen, s)) if viterbi else (lambda s: lse(-local_pen, s))

    ps = np.full(seqlen + 2, -BIG)
    cs = np.full(seqlen + 2, -BIG)
    ps[START] = 0.0

    # First block (ref :1745-1768)
    stay = lp[0, STAY]
    cs[START] = ps[START] + lstay(stay)
    cs[END] = ps[END] + lstay(stay)
    cs[0] = comb(cs[0], ps[0] + stay - stay_pen)
    if high[0] > 0 and seqlen > 1:
        cs[1] = lp[0, seq[1]]
    if high[0] > 1 and seqlen > 2:
        cs[2] = lp[0, seq[2]] - skip_pen
    cs[END] = comb(cs[END], ps[START] - local_pen)  # start->end, block 0 only
    cs[0] = comb(cs[0], ps[START] + lp[0, seq[0]])
    cs[END] = comb(cs[END], ps[seqlen - 1] - local_pen)

    for t in range(1, T):
        ps, cs = cs, ps  # swap, stale values persist as in the reference
        stay = lp[t, STAY]
        cs[START] = ps[START] + lstay(stay)
        cs[END] = ps[END] + lstay(stay)
        for pos in range(low[t], high[t - 1]):
            cs[pos] = ps[pos] - stay_pen + stay
        for pos in range(max(low[t], low[t - 1] + 1),
                         min(high[t], high[t - 1] + 1)):
            cs[pos] = comb(cs[pos], ps[pos - 1] + lp[t, seq[pos]])
        for pos in range(max(low[t], low[t - 1] + 2),
                         min(high[t], high[t - 1] + 2)):
            cs[pos] = comb(cs[pos], ps[pos - 2] - skip_pen + lp[t, seq[pos]])
        if low[t] == 0:
            cs[0] = comb(cs[0], ps[START] + lp[t, seq[0]])
        cs[END] = comb(cs[END], ps[seqlen - 1] - local_pen)
    return comb(cs[seqlen - 1], cs[END])


# ----------------------------------------------------------------------- data

def make_case(T=30, seqlen=20, nstate=257, seed=0):
    rng = np.random.default_rng(seed)
    lp = rng.standard_normal((T, nstate)).astype(np.float32)
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
    seq = rng.integers(0, nstate - 1, size=seqlen)
    return lp.astype(np.float32), seq


def diagonal_band(T, seqlen, half=4):
    g = seqlen / T
    low = np.maximum(0, (np.arange(T) * g - half)).astype(np.int64)
    high = np.minimum(seqlen, (np.arange(T) * g + half)).astype(np.int64)
    low[0] = 0
    high[-1] = seqlen
    high = np.maximum.accumulate(high)
    low = np.minimum(low, np.concatenate([high[1:], [seqlen]]))
    return low, high


# ---------------------------------------------------------------------- tests

def test_map_viterbi_matches_scalar():
    lp, seq = make_case(seed=1)
    score_d, path_d = mapping.map_to_sequence_viterbi(lp, seq, 0.5, 1.0, 3.0, want_path=True)
    score_s, path_s = scalar_map_viterbi(lp, seq, 0.5, 1.0, 3.0)
    assert abs(score_d - score_s) < 1e-4
    np.testing.assert_array_equal(path_d, path_s)


def test_map_forward_matches_scalar():
    lp, seq = make_case(seed=2)
    score_d = mapping.map_to_sequence_forward(lp, seq, 0.5, 1.0, 3.0)
    score_s = scalar_map_forward(lp, seq, 0.5, 1.0, 3.0)
    assert abs(score_d - score_s) < 1e-3


@pytest.mark.parametrize("viterbi", [True, False])
@pytest.mark.parametrize("half", [1, 2, 5])
def test_map_banded_matches_scalar(viterbi, half):
    lp, seq = make_case(T=40, seqlen=25, seed=3)
    low, high = diagonal_band(40, 25, half=half)
    assert mapping.are_bounds_sane(low, high, 40, 25)
    got = mapping.map_to_sequence_banded(lp, seq, low, high, 0.2, 0.7, 3.0, viterbi=viterbi)
    want = scalar_map_banded(lp, seq, low, high, 0.2, 0.7, 3.0, viterbi)
    assert abs(got - want) < 1e-3


@pytest.mark.parametrize("viterbi", [True, False])
def test_map_banded_width_one_staircase(viterbi):
    """Degenerate band: exactly one allowed position per block."""
    T, seqlen = 30, 20
    lp, seq = make_case(T=T, seqlen=seqlen, seed=7)
    pos = np.minimum((np.arange(T) * seqlen) // T, seqlen - 1)
    low = pos.astype(np.int64)
    high = low + 1
    high[-1] = seqlen
    assert mapping.are_bounds_sane(low, high, T, seqlen)
    got = mapping.map_to_sequence_banded(lp, seq, low, high, 0.1, 0.9, 2.5,
                                         viterbi=viterbi)
    want = scalar_map_banded(lp, seq, low, high, 0.1, 0.9, 2.5, viterbi)
    assert abs(got - want) < 1e-3


@pytest.mark.parametrize("viterbi", [True, False])
def test_map_banded_first_block_seeds(viterbi):
    """Tiny case where the reference's first-block quirk (free step to
    position 1, single skip to position 2) decides the score."""
    rng = np.random.default_rng(11)
    T, seqlen, nst = 4, 5, 17
    lp = rng.standard_normal((T, nst)).astype(np.float32)
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True)).astype(np.float32)
    seq = rng.integers(0, nst - 1, size=seqlen)
    # make position 1's block-0 emission dominate so the seeded path wins
    lp[0, seq[1]] = 2.0
    low = np.zeros(T, dtype=np.int64)
    high = np.full(T, seqlen, dtype=np.int64)
    got = mapping.map_to_sequence_banded(lp, seq, low, high, 0.0, 0.5, 3.0,
                                         viterbi=viterbi)
    want = scalar_map_banded(lp, seq, low, high, 0.0, 0.5, 3.0, viterbi)
    assert abs(got - want) < 1e-3


@pytest.mark.parametrize("viterbi", [True, False])
def test_map_banded_empty_first_band(viterbi):
    """are_bounds_sane permits an EMPTY first band (low[0]==high[0]==0).
    The reference writes the position-0 seed anyway but its clipped read
    ranges never consume an out-of-band seed; the device version must
    drop it too (regression: it used to write init_win[0]
    unconditionally, letting block 1's stay/step consume it)."""
    rng = np.random.default_rng(23)
    T, seqlen, nst = 6, 4, 17
    lp = rng.standard_normal((T, nst)).astype(np.float32)
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True)).astype(np.float32)
    seq = rng.integers(0, nst - 1, size=seqlen)
    lp[0, seq[0]] = 5.0  # a consumed out-of-band seed would dominate
    low = np.array([0, 0, 1, 1, 2, 2], dtype=np.int64)
    high = np.array([0, 2, 2, 3, 4, 4], dtype=np.int64)
    assert mapping.are_bounds_sane(low, high, T, seqlen)
    got = mapping.map_to_sequence_banded(lp, seq, low, high, 0.1, 0.6, 2.0,
                                         viterbi=viterbi)
    want = scalar_map_banded(lp, seq, low, high, 0.1, 0.6, 2.0, viterbi)
    assert abs(got - want) < 1e-3


def test_full_band_viterbi_close_to_dense():
    """A full-width band (plus the start->end extra move) should recover
    the dense Viterbi score when the best path actually maps."""
    lp, seq = make_case(T=30, seqlen=12, seed=4)
    low = np.zeros(30, dtype=np.int64)
    high = np.full(30, 12, dtype=np.int64)
    dense = mapping.map_to_sequence_viterbi(lp, seq, 0.0, 0.0, 3.0)
    banded = mapping.map_to_sequence_banded(lp, seq, low, high, 0.0, 0.0, 3.0)
    # banded >= dense (it has one extra allowed transition)
    assert banded >= dense - 1e-4


def test_bounds_sanity():
    low = np.array([0, 1, 2])
    high = np.array([2, 3, 4])
    assert mapping.are_bounds_sane(low, high, 3, 4)
    assert not mapping.are_bounds_sane(low, high, 3, 5)  # last high != seqlen
    assert not mapping.are_bounds_sane(high, low, 3, 4)


# ------------------------------------------------------------------------ DTW

def scalar_squiggle_viterbi(sig, params, rate, prob_back, local_pen, skip_pen, minscore):
    npos = params.shape[0]
    nfstate = npos + 2
    nstate = npos + nfstate
    with np.errstate(divide="ignore"):
        move_back = np.log(prob_back)
    stay_back = np.log(0.5)
    from_back = np.log(0.5)
    scale = np.exp(params[:, 1])
    mp = (1 - prob_back) * (0.5 * (1 + np.tanh((params[:, 2] + np.log(rate)) / 2)))
    move_pen = np.zeros(nfstate)
    stay_pen = np.zeros(nfstate)
    move_pen[1:npos + 1] = np.log(mp)
    stay_pen[1:npos + 1] = np.log1p(-mp - prob_back)
    move_pen[0] = move_pen[nfstate - 1] = np.log(mp).mean()
    stay_pen[0] = stay_pen[nfstate - 1] = np.log1p(-mp - prob_back).mean()

    fwd = np.full(nstate, -BIG)
    fwd[0] = 0.0
    tb = np.zeros((len(sig), nstate), dtype=np.int64)
    for s, x in enumerate(sig):
        prev = fwd.copy()
        cur = np.full(nstate, -BIG)
        for st in range(nfstate):
            cur[st] = prev[st] + stay_pen[st]
            tb[s, st] = st
        for st in range(npos):
            cur[nfstate + st] = prev[nfstate + st] + stay_back
            tb[s, nfstate + st] = nfstate + st
        for st in range(1, nfstate):
            c = prev[st - 1] + move_pen[st - 1]
            if c > cur[st]:
                cur[st] = c
                tb[s, st] = st - 1
        for st in range(2, nfstate):
            c = prev[st - 2] + move_pen[st - 2] - skip_pen
            if c > cur[st]:
                cur[st] = c
                tb[s, st] = st - 2
        for destpos in range(1, npos):
            st = destpos + 1
            c = prev[0] + move_pen[0] - local_pen * destpos
            if c > cur[st]:
                cur[st] = c
                tb[s, st] = 0
        for origpos in range(npos - 1):
            st = nfstate - 1
            c = prev[origpos + 1] + move_pen[origpos + 1] - local_pen * (npos - 1 - origpos)
            if c > cur[st]:
                cur[st] = c
                tb[s, st] = origpos + 1
        if prob_back > 0:
            for st in range(1, npos):
                c = prev[st + 1] + move_back
                if c > cur[nfstate + st - 1]:
                    cur[nfstate + st - 1] = c
                    tb[s, nfstate + st - 1] = st + 1
            for st in range(1, npos):
                c = prev[nfstate + st - 1] + from_back
                if c > cur[st + 1]:
                    cur[st + 1] = c
                    tb[s, st + 1] = nfstate + st - 1
        for pos in range(npos):
            e = max(-minscore,
                    -abs(x - params[pos, 0]) / scale[pos] - params[pos, 1] - np.log(2))
            cur[pos + 1] += e
            cur[nfstate + pos] += e
        cur[0] -= local_pen
        cur[nfstate - 1] -= local_pen
        fwd = cur

    score = max(fwd[nfstate - 2], fwd[nfstate - 1])
    path = np.zeros(len(sig), dtype=np.int64)
    path[-1] = nfstate - 2 if fwd[nfstate - 2] > fwd[nfstate - 1] else nfstate - 1
    for s in range(len(sig) - 1, 0, -1):
        path[s - 1] = tb[s, path[s]]
    smin = 0
    while smin < len(sig) and path[smin] == 0:
        path[smin] = -1
        smin += 1
    smax = len(sig)
    while smax > 0 and path[smax - 1] == nfstate - 1:
        path[smax - 1] = -1
        smax -= 1
    seg = path[smin:smax]
    path[smin:smax] = np.where(seg >= nfstate, seg - nfstate, seg - 1)
    return score, path


def make_squiggle_case(npos=12, nsample=50, seed=0):
    rng = np.random.default_rng(seed)
    params = np.zeros((npos, 3), dtype=np.float32)
    params[:, 0] = rng.standard_normal(npos)          # current
    params[:, 1] = -1.0 + 0.1 * rng.standard_normal(npos)  # log sd
    params[:, 2] = -1.0 + 0.2 * rng.standard_normal(npos)  # -log dwell (logit-ish)
    # Signal roughly follows the squiggle with ~4 samples/pos
    sig = np.repeat(params[:, 0], nsample // npos + 1)[:nsample]
    sig = (sig + 0.1 * rng.standard_normal(nsample)).astype(np.float32)
    return sig, params


@pytest.mark.parametrize("prob_back", [0.0, 0.1])
def test_squiggle_match_viterbi_matches_scalar(prob_back):
    sig, params = make_squiggle_case(seed=1)
    score_d, path_d = squiggle_match_viterbi(sig, params, 1.0, prob_back, 2.0, 1.0, 5.0)
    score_s, path_s = scalar_squiggle_viterbi(sig, params, 1.0, prob_back, 2.0, 1.0, 5.0)
    assert abs(score_d - score_s) < 2e-3
    np.testing.assert_array_equal(path_d, path_s)


def test_squiggle_match_path_plausible():
    sig, params = make_squiggle_case(npos=10, nsample=60, seed=2)
    _, path = squiggle_match_viterbi(sig, params, 1.0, 0.0, 2.0, 1.0, 5.0)
    mapped = path[path >= 0]
    assert len(mapped) > 30
    # Monotone non-decreasing without back moves
    assert (np.diff(mapped) >= 0).all()
    assert mapped.max() == params.shape[0] - 1


def test_squiggle_match_forward_ge_viterbi():
    sig, params = make_squiggle_case(seed=3)
    v, _ = squiggle_match_viterbi(sig, params, 1.0, 0.05, 2.0, 1.0, 5.0)
    f = squiggle_match_forward(sig, params, 1.0, 0.05, 2.0, 1.0, 5.0)
    assert f >= v - 1e-3

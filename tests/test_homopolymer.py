"""Direct correctness tests of the homopolymer corrections.

The run-detection case analysis and the posterior-mean arithmetic are
tested against hand-built paths/posteriors where the expected result is
derived from the reference's documented behaviour:
  * findRuns cases 1a (XYYYY -> YYYYY|stay) and 1b/1c (ZXYYY -> stays*
    -> YYYYY), ref src/homopolymer.c:41-58 and :98-141;
  * homopolymer_path mean replacement, ref src/homopolymer.c:175-235
    (posterior index shifted one block from the path);
  * dwell_corrected_overlapper run-length arithmetic, ref
    src/decode.c:511-643;
  * homopolymer_dwell_correction scale calibration, ref src/decode.c:645-702.
"""

import numpy as np
import pytest

from scrappie_tpu.post.homopolymer import (
    HomopolymerMode,
    calibrated_dwell,
    dwell_corrected_overlapper,
    find_runs,
    homopolymer_dwell_correction,
    homopolymer_path,
    repeatblock,
)

KLEN = 5
NSTATE = 4 ** KLEN + 1
STAY = -1

# Y = C (base 1): the repeat kmer CCCCC and its truncations
REPK = repeatblock(1, KLEN)          # CCCCC = 341
XYYYY = 0 * 256 + repeatblock(1, 4)  # ACCCC: suffix CCCC, X=A != Y
ZXYYY = 0 * 256 + 0 * 64 + repeatblock(1, 3)  # AACCC: suffix CCC, X=A != Y
OTHER = 600                          # unrelated kmer, not matching any case


def test_find_runs_case_1a():
    # XYYYY followed by (YYYYY | stay)+: run starts at the first such
    # block and extends while blocks are YYYYY or stay.
    path = np.array([XYYYY, REPK, STAY, REPK, OTHER, OTHER, OTHER, OTHER])
    runs = find_runs(path, KLEN)
    assert (1, 3, 1) in runs
    assert len([r for r in runs if r[2] == 1]) == 1


def test_find_runs_case_1a_stay_first():
    # The run may begin with a stay (q == STAY)
    path = np.array([XYYYY, STAY, REPK, REPK, OTHER, OTHER, OTHER, OTHER])
    runs = find_runs(path, KLEN)
    assert (1, 3, 1) in runs


def test_find_runs_case_1a_excludes_x_equals_y():
    # CCCCC -> CCCCC is not an ambiguous ENTRY (p == repeatk excluded):
    # a pure continuation has no X base to anchor the run start.
    path = np.array([REPK, REPK, REPK, OTHER, OTHER, OTHER, OTHER, OTHER])
    runs = find_runs(path, KLEN)
    assert [r for r in runs if r[2] == 1] == []


def test_find_runs_case_1a_excludes_stay_prev():
    # p == STAY excluded even though STAY % fkm1 would match TTTT's
    # repeat pattern (ref comment "Exclude -1 at prev because its
    # remainder is the same as TTTT")
    repk_t = repeatblock(3, KLEN)
    path = np.array([STAY, repk_t, repk_t, OTHER, OTHER, OTHER, OTHER, OTHER])
    assert [r for r in find_runs(path, KLEN) if r[2] == 3] == []


def test_find_runs_case_1b_skip_entry():
    # ZXYYY followed directly by YYYYY (skip into the homopolymer):
    # run starts AT the first YYYYY.
    path = np.array([ZXYYY, REPK, REPK, STAY, OTHER, OTHER, OTHER, OTHER])
    runs = find_runs(path, KLEN)
    assert (1, 3, 1) in runs


def test_find_runs_case_1c_stays_then_repeat():
    # ZXYYY, stays, then YYYYY: run starts at the YYYYY (not the stays)
    path = np.array([ZXYYY, STAY, STAY, REPK, REPK, OTHER, OTHER, OTHER])
    runs = find_runs(path, KLEN)
    assert (3, 2, 1) in runs


def test_find_runs_case_1c_stays_without_repeat():
    # ZXYYY, stays, then something else: NOT a run
    path = np.array([ZXYYY, STAY, STAY, OTHER, OTHER, OTHER, OTHER, OTHER])
    assert [r for r in find_runs(path, KLEN) if r[2] == 1] == []


def _logpost_for_run(T, blocks, pr_values, runstate):
    """Posterior where normalised repeat probability at path position i
    (= logpost row i-1) equals pr_values for the given path positions."""
    lp = np.full((T, NSTATE), -30.0, dtype=np.float32)
    for i, pr in zip(blocks, pr_values):
        # choose psu, pru with pru/(pru+psu) == pr
        pru, psu = pr, 1.0 - pr
        lp[i - 1, runstate] = np.log(max(pru, 1e-12))
        lp[i - 1, NSTATE - 1] = np.log(max(psu, 1e-12))
    return lp


def test_homopolymer_path_mean_lengthens_run():
    # Ambiguous segment of 4 blocks with pr = .9 .9 .8 .45 -> mean 3.05
    # -> 3 repeats, Viterbi had 2 -> path rewritten to 3 repeats + 1 stay
    path = np.array([XYYYY, REPK, STAY, REPK, STAY, OTHER, OTHER, OTHER])
    T = len(path)
    lp = _logpost_for_run(T, [1, 2, 3, 4], [0.9, 0.9, 0.8, 0.45], REPK)
    out = homopolymer_path(lp, path.copy(), HomopolymerMode.MEAN)
    assert list(out[1:5]) == [REPK, REPK, REPK, STAY]
    # rest of the path untouched
    assert list(out[5:]) == [OTHER, OTHER, OTHER]


def test_homopolymer_path_mean_shortens_run():
    # pr = .4 .4 .3 .1 -> mean 1.2 -> 1 repeat, Viterbi had 3
    path = np.array([XYYYY, REPK, REPK, REPK, STAY, OTHER, OTHER, OTHER])
    T = len(path)
    lp = _logpost_for_run(T, [1, 2, 3, 4], [0.4, 0.4, 0.3, 0.1], REPK)
    out = homopolymer_path(lp, path.copy(), HomopolymerMode.MEAN)
    assert list(out[1:5]) == [REPK, STAY, STAY, STAY]


def test_homopolymer_path_mean_no_change_when_equal():
    # mean rounds to the Viterbi count -> path must be bit-identical
    # (including the ORDER of repeats/stays inside the segment)
    path = np.array([XYYYY, STAY, REPK, REPK, STAY, OTHER, OTHER, OTHER])
    T = len(path)
    lp = _logpost_for_run(T, [1, 2, 3, 4], [0.6, 0.6, 0.55, 0.2], REPK)
    out = homopolymer_path(lp, path.copy(), HomopolymerMode.MEAN)
    assert list(out) == list(path)


def test_homopolymer_path_nochange_mode():
    path = np.array([XYYYY, REPK, STAY, REPK, STAY, OTHER, OTHER, OTHER])
    lp = _logpost_for_run(len(path), [1, 2, 3, 4], [0.9] * 4, REPK)
    out = homopolymer_path(lp, path.copy(), HomopolymerMode.NOCHANGE)
    assert list(out) == list(path)


def test_homopolymer_path_rounding_half_up():
    # nmean = 2.5 rounds to 3 ((int)(nmean + 0.5) in the reference)
    path = np.array([XYYYY, REPK, STAY, STAY, STAY, OTHER, OTHER, OTHER])
    lp = _logpost_for_run(len(path), [1, 2, 3, 4],
                          [0.75, 0.75, 0.5, 0.5], REPK)
    out = homopolymer_path(lp, path.copy(), HomopolymerMode.MEAN)
    assert list(out[1:5]) == [REPK, REPK, REPK, STAY]


# ----------------------------------------------------------- dwell correction

def test_calibrated_dwell_round_half_away():
    assert calibrated_dwell(15.0, 0, 10.0, (0.0,) * 4) == 2  # 1.5 -> 2
    assert calibrated_dwell(14.9, 0, 10.0, (0.0,) * 4) == 1
    assert calibrated_dwell(3.0, 2, 10.0, (0.0, 0.0, 1.0, 0.0)) == 0
    assert calibrated_dwell(26.0, 1, 10.0, (0.0, 1.0, 0.0, 0.0)) == 3  # 2.5->3


def test_dwell_corrected_overlapper_run_length():
    # Path: ACCCC -> CCCCC x2 (+1 stay) -> CCCCA.  Entering the
    # homopolymer emits one C through the normal overlap AND counts its
    # dwell; the accumulated homopolymer dwell is 10 (entry) + 10 (stay)
    # + 10 (repeat) = 30; scale 10 -> 3 corrected C's; then
    # overlap(CCCCC,CCCCA)=1 emits the final A.
    path = np.array([XYYYY, REPK, STAY, REPK, 0])
    path[4] = (REPK << 2 | 0) & 1023  # CCCCA
    dwell = np.array([10.0, 10.0, 10.0, 10.0, 10.0])
    seq = dwell_corrected_overlapper(path, dwell, 1024, 10.0)
    assert seq == "ACCCC" + "C" + "CCC" + "A"


def test_dwell_corrected_overlapper_final_homopolymer():
    # Read ends inside the homopolymer: tail correction applies
    path = np.array([XYYYY, REPK, STAY, STAY])
    dwell = np.array([7.0, 12.0, 9.0, 9.0])
    # entry emits one C; hdwell = 12 + 9 + 9 = 30, scale 12 ->
    # round(2.5) = 3 (half away from zero)
    seq = dwell_corrected_overlapper(path, dwell, 1024, 12.0)
    assert seq == "ACCCC" + "C" + "CCC"


def test_dwell_corrected_overlapper_no_homopolymer_matches_overlapper():
    from scrappie_tpu.post.overlapper import overlapper

    rng = np.random.default_rng(1)
    # Avoid homopolymer kmers entirely: alternate arbitrary non-repeat kmers
    path = rng.integers(0, 1024, size=64)
    path[path % 5 == 0] = STAY
    for rep in (repeatblock(b, KLEN) for b in range(4)):
        path[path == rep] = OTHER
    if path[0] == STAY:
        path[0] = OTHER
    dwell = rng.integers(1, 30, size=64).astype(np.float64)
    assert dwell_corrected_overlapper(path, dwell, 1024, 3.7) == \
        overlapper(np.asarray(path), 1024)


def test_homopolymer_dwell_correction_scale():
    # Tiny event table: positions [0,0,1,2,2,3], states chosen so the
    # pos 0->1 and 1->2 and 2->3 moves are steps with state changes.
    lengths = np.array([4.0, 6.0, 5.0, 7.0, 3.0, 8.0])
    starts = np.cumsum(np.concatenate([[0.0], lengths[:-1]]))
    pos = np.array([0, 0, 1, 2, 2, 3])
    states = np.array([10, 10, 11, 12, 12, 13])
    path = np.array([XYYYY, STAY, REPK, REPK, STAY, (REPK << 2 | 0) & 1023])
    basecall_len = 7
    # steps: ev2 (adds evdwell of pos0 = 4+6), ev3 (adds 5), ev5 (adds 7+3)
    tot, nstep = (10 + 5 + 10), 3
    start_delta = starts[-1] - starts[0]
    prior = (lengths[-1] + start_delta) / basecall_len
    scale = (prior + tot) / (1.0 + nstep)
    # homopolymer: entry at ev2 emits one C and starts hdwell = 5 (ev2)
    # + 7 (ev3) + 3 (stay ev4) = 15 -> round(15/scale) corrected C's
    hlen = int(np.floor(15.0 / scale + 0.5))
    expect = "ACCCC" + "C" + "C" * hlen + "A"
    got = homopolymer_dwell_correction(lengths, starts, path, pos, states,
                                       1025, basecall_len)
    assert got == expect

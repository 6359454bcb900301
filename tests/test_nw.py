"""Needleman-Wunsch aligner vs a brute-force affine-gap oracle."""

import numpy as np
import pytest

from longtr_tpu.haplotype.nw import (GAPEXTEND, GAPOPEN, MATCH, MISMATCH,
                                     adjust_indels, nw_align)

RNG = np.random.default_rng(13)
BASES = np.array(list("ACGT"))


def brute_force_score(ref, read, use_ref_end_penalty=True):
    """O(3*n*m) affine DP returning only the optimal score (float32-exact)."""
    L1, L2 = len(ref), len(read)
    NEG = np.float32(-1e6)
    M = np.full((L2 + 1, L1 + 1), NEG, np.float32)
    Iref = np.full((L2 + 1, L1 + 1), NEG, np.float32)
    Iread = np.full((L2 + 1, L1 + 1), NEG, np.float32)
    M[0, 0] = 0
    for j in range(1, L1 + 1):
        Iref[0, j] = (-GAPOPEN - (j - 1) * GAPEXTEND if use_ref_end_penalty
                      else 0.0)
    for i in range(1, L2 + 1):
        Iread[i, 0] = -GAPOPEN - (i - 1) * GAPEXTEND
    for i in range(1, L2 + 1):
        for j in range(1, L1 + 1):
            s = MATCH if ref[j - 1] == read[i - 1] or "N" in (
                ref[j - 1], read[i - 1]) else MISMATCH
            M[i, j] = max(M[i - 1, j - 1], Iref[i - 1, j - 1],
                          Iread[i - 1, j - 1]) + s
            Iref[i, j] = max(M[i, j - 1] - GAPOPEN, Iref[i, j - 1] - GAPEXTEND,
                             Iread[i, j - 1] - GAPOPEN)
            Iread[i, j] = max(M[i - 1, j] - GAPOPEN, Iref[i - 1, j] - GAPOPEN,
                              Iread[i - 1, j] - GAPEXTEND)
    if use_ref_end_penalty:
        return max(M[L2, L1], Iref[L2, L1], Iread[L2, L1])
    return max(M[L2, :].max(), Iref[L2, :].max(), Iread[L2, :].max())


def mutate(seq, sub=0.05, ind=0.03):
    out = []
    for ch in seq:
        r = RNG.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.append(ch)
            out.append(str(RNG.choice(BASES)))
            continue
        out.append(ch if r > sub + ind else str(RNG.choice(BASES)))
    return "".join(out) or "A"


@pytest.mark.parametrize("trial", range(8))
def test_nw_score_matches_bruteforce(trial):
    ref = "".join(RNG.choice(BASES, RNG.integers(10, 60)))
    read = mutate(ref)
    ok, ra, da, score, cigar = nw_align(ref, read, True)
    want = brute_force_score(ref, read, True)
    assert score == pytest.approx(float(want), abs=1e-4)
    # alignment strings reconstruct the inputs
    assert ra.replace("-", "") == ref
    assert da.replace("-", "") == read
    # cigar consistency
    n_ref = sum(n for op, n in cigar if op in "=XD")
    n_read = sum(n for op, n in cigar if op in "=XI")
    assert n_ref == len(ref) and n_read == len(read)


def test_nw_identical():
    s = "ACGTACGTAC"
    ok, ra, da, score, cigar = nw_align(s, s)
    assert cigar == [("=", len(s))]
    assert score == pytest.approx(2.0 * len(s))


def test_adjust_indels_moves_deletion_right():
    # ref:  AAAB BBBC    alt deleted one B; deletion should shift toward the
    # repeat start boundary given matching context
    ref_al = "AAABBBBC"
    alt_al = "AAA-BBBC"
    ra, aa = adjust_indels(ref_al, alt_al, flank_end=0, repeat_start=6)
    assert ra.replace("-", "") == ref_al.replace("-", "")
    assert aa.count("-") == 1
    # deletion moved right compared to input
    assert aa.index("-") >= alt_al.index("-")

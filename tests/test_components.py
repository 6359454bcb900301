"""Unit tests for haplotype/cluster/POA/de Bruijn/regions/pedigree pieces."""

import numpy as np
import pytest

from longtr_tpu.haplotype.blocks import HapBlock, Haplotype, RepeatBlock
from longtr_tpu.haplotype.cluster import edit_distance_banded, greedy_clustering
from longtr_tpu.haplotype.debruijn import DebruijnGraph, calc_kmer_length
from longtr_tpu.haplotype.poa import poa_consensus
from longtr_tpu.models.stutter import default_stutter_model
from longtr_tpu.regions import Region, read_regions
from longtr_tpu.utils.stringops import condense_read_counts, order_by_length_and_sequence

RNG = np.random.default_rng(5)


# -- haplotype enumeration -------------------------------------------------

def make_hap(nopts):
    blocks = []
    pos = 0
    for i, n in enumerate(nopts):
        b = HapBlock(pos, pos + 10, "A" * 10)
        for k in range(1, n):
            b.add_alternate("A" * 10 + "C" * k)
        blocks.append(b)
        pos += 20
    return Haplotype(blocks)


def cpp_gray_order(nopts):
    """Direct transcription of Haplotype::next (Haplotype.cpp:157-196)."""
    n = len(nopts)
    factors = []
    ncombs = 1
    for i in range(n):
        factors.append(ncombs)
        ncombs *= nopts[i]
    counts = [0] * n
    dirs = [1] * n
    out = [tuple(counts)]
    for counter in range(1, ncombs):
        t = counter
        index = -1
        for j in range(n - 1, -1, -1):
            t %= factors[j]
            if t == 0:
                index = j
                break
        counts[index] += dirs[index]
        if counts[index] == 0 or counts[index] == nopts[index] - 1:
            dirs[index] *= -1
        out.append(tuple(counts))
    return out


@pytest.mark.parametrize("nopts", [[1, 3, 1], [2, 3, 2], [1, 5, 2], [4, 1, 3]])
def test_haplotype_enumeration_matches_cpp(nopts):
    hap = make_hap(nopts)
    assert hap.all_configs() == cpp_gray_order(nopts)
    # each step changes exactly one block
    cfgs = hap.all_configs()
    for a, b in zip(cfgs, cfgs[1:]):
        assert sum(x != y for x, y in zip(a, b)) == 1


def test_haps_to_alleles_roundtrip():
    hap = make_hap([1, 4, 2])
    h2a = hap.haps_to_alleles(1)
    for i, cfg in enumerate(hap.all_configs()):
        assert h2a[i] == cfg[1]


def test_repeat_block_artifact_prior():
    sm = default_stutter_model().with_period(2)
    rb = RepeatBlock(100, 120, "AC" * 10, 2, sm)
    assert rb.log_prob_pcr_artifact(0, 0) == pytest.approx(
        sm.log_stutter_pmf(20, 20))
    assert rb.log_prob_pcr_artifact(0, 2) == pytest.approx(
        sm.log_stutter_pmf(20, 22))
    assert rb.log_prob_pcr_artifact(0, 14) == -10e6  # beyond 6 repeats


# -- clustering / POA ------------------------------------------------------

def slow_edit_distance(a, b):
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=int)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return dp[n, m]


def test_edit_distance_matches_slow():
    bases = np.array(list("ACGT"))
    for _ in range(20):
        a = "".join(RNG.choice(bases, RNG.integers(5, 40)))
        b = "".join(RNG.choice(bases, RNG.integers(5, 40)))
        want = slow_edit_distance(a, b)
        got = edit_distance_banded(a, b, 100)
        assert got == want, (a, b)


def test_edit_distance_threshold_abort():
    a, b = "A" * 50, "C" * 50
    assert edit_distance_banded(a, b, 10) == 11


def test_greedy_clustering_groups_similar():
    seqs = ["ACGTACGTAA", "ACGTACGTAA", "ACGTACGTTA",
            "GGGGCCCCGG", "GGGGCCCCGA"]
    clusters = greedy_clustering(seqs, threshold=4)
    assert clusters is not None
    assert len(clusters) == 2


def test_poa_consensus_recovers_majority():
    truth = "ACGTACGTACGTACGTACGT"
    seqs = []
    for _ in range(11):
        s = list(truth)
        for _ in range(2):
            i = int(RNG.integers(len(s)))
            s[i] = str(RNG.choice(list("ACGT")))
        seqs.append("".join(s))
    seqs += [truth] * 8
    cons = poa_consensus(seqs)
    assert slow_edit_distance(cons, truth) <= 2


def test_poa_single_sequence():
    assert poa_consensus(["ACGT"]) == "ACGT"


# -- de Bruijn -------------------------------------------------------------

def test_calc_kmer_length_simple():
    seq = "ACGTACGTTTGCAGCTTACGGATCAAGGTCCATAGC"
    k = calc_kmer_length(seq, 10, 15)
    assert k is not None
    g = DebruijnGraph(k, seq)
    assert not g.has_cycles()


def test_calc_kmer_repetitive_fails():
    assert calc_kmer_length("AT" * 30, 10, 15) is None


def test_debruijn_path_enumeration():
    ref = "ACGTACGTTTGCAGCTTACGGATCAAGGTC"
    g = DebruijnGraph(10, ref)
    alt = ref[:14] + ("G" if ref[14] != "G" else "T") + ref[15:]
    for _ in range(5):
        g.add_string(alt)
        g.add_string(ref)
    g.prune_edges(0.02, 2)
    assert not g.has_cycles() and g.is_source_ok() and g.is_sink_ok()
    paths = g.enumerate_paths(2, 10)
    seqs = [p[0] for p in paths]
    assert ref in seqs
    assert alt in seqs


# -- regions / stringops ---------------------------------------------------

def test_read_regions_formats(tmp_path):
    p4 = tmp_path / "four.bed"
    p4.write_text("chr1\t101\t120\tAC\nchr1\t201\t230\tAGAT\tlocus2\n")
    regs = read_regions(str(p4))
    assert regs[0].start == 100 and regs[0].stop == 120
    assert regs[0].motif == "AC" and regs[0].period == 2
    assert regs[1].name == "locus2"
    # legacy 7-column HipSTR format
    p7 = tmp_path / "seven.bed"
    p7.write_text("chr1\t776605\t776633\t5\t5.8\tHuman_STR_211\tAAAAC\n")
    regs = read_regions(str(p7))
    assert regs[0].motif == "AAAAC" and regs[0].name == "Human_STR_211"
    assert regs[0].period == 5
    # slash-separated alternate motifs (test_regions_hg38.bed style)
    p7b = tmp_path / "slash.bed"
    p7b.write_text("chr1\t834912\t834988\t4\t19.25\tHuman_STR_232\tATCC/ACCC\n")
    regs = read_regions(str(p7b))
    assert regs[0].motif == "ATCC,ACCC" and regs[0].period == 4


def test_order_by_length_and_sequence():
    seqs = ["CCC", "AA", "B", "AB", "AAA"]
    assert order_by_length_and_sequence(seqs) == ["B", "AA", "AB", "AAA", "CCC"]


def test_condense_read_counts():
    assert condense_read_counts([-1, 0, -1, 2, 2, 1]) == "-1|2;0|1;1|1;2|2"
    assert condense_read_counts([]) == "."


# -- pedigree --------------------------------------------------------------

def test_extract_nuclear_families(tmp_path):
    fam = tmp_path / "trio.fam"
    fam.write_text(
        "FAM1\tCHILD1\tDAD1\tMOM1\n"
        "FAM1\tCHILD2\tDAD1\tMOM1\n"
        "FAM2\tKID\tPOP\tMAMA\n"
        "FAM3\tX1\t0\t0\n")
    from longtr_tpu.denovo.pedigree import extract_pedigree_nuclear_families
    fams = extract_pedigree_nuclear_families(
        str(fam), {"CHILD1", "CHILD2", "DAD1", "MOM1", "KID", "POP", "MAMA", "X1"})
    ids = sorted(f.family_id for f in fams)
    assert ids == ["FAM1", "FAM2"]
    f1 = [f for f in fams if f.family_id == "FAM1"][0]
    assert sorted(f1.children) == ["CHILD1", "CHILD2"]
    assert {f1.mother, f1.father} == {"MOM1", "DAD1"}


def test_native_edit_distance_matches_numpy():
    """The native C++ banded edit distance must be value-identical to the
    numpy transcription, including the T+1 early-abort, across random
    pairs, lengths, and thresholds."""
    import numpy as np
    from longtr_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")

    def numpy_ed(a, b, T):
        n, m = len(a), len(b)
        if abs(n - m) > T:
            return T + 1
        av = np.frombuffer(a.encode(), dtype=np.uint8)
        bv = np.frombuffer(b.encode(), dtype=np.uint8)
        prev = np.arange(m + 1, dtype=np.int32)
        jj = np.arange(1, m + 1, dtype=np.int32)
        for i in range(1, n + 1):
            cur = np.empty(m + 1, dtype=np.int32)
            cur[0] = i
            sub = prev[:-1] + (av[i - 1] != bv).astype(np.int32)
            base = np.minimum(sub, prev[1:] + 1)
            run = np.minimum.accumulate(base - jj)
            cur[1:] = np.minimum(base, run + jj)
            cur[1:] = np.minimum(cur[1:], cur[0] + jj)
            band = cur[1:] + np.abs((n - m) - (i - jj))
            if band.min() > T:
                return T + 1
            prev = cur
        return int(prev[m])

    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    for trial in range(120):
        n = int(rng.integers(1, 80))
        a = "".join(rng.choice(bases, size=n))
        if rng.random() < 0.5:
            b = list(a)
            for _ in range(int(rng.integers(0, 12))):
                k = int(rng.integers(0, len(b))) if b else 0
                op = rng.random()
                if op < 0.4 and b:
                    b[k] = str(rng.choice(bases))
                elif op < 0.7 and b:
                    del b[k]
                else:
                    b.insert(k, str(rng.choice(bases)))
            b = "".join(b)
        else:
            b = "".join(rng.choice(bases, size=int(rng.integers(1, 80))))
        T = int(rng.integers(1, 30))
        assert native.edit_distance_banded(a, b, T) == numpy_ed(a, b, T), \
            (a, b, T)


def test_bitparallel_edit_distance_matches_scalar_band():
    """The banded block-Myers path (round 4) must be value-identical to the
    retained scalar band DP across multi-block lengths (>64, >128), big
    thresholds, near-identical and unrelated pairs, and the T+1 clamp —
    including block admission/retirement boundaries (len crossing 64k)."""
    import numpy as np

    from longtr_tpu import native
    if native.get_lib() is None or \
            native.edit_distance_banded_scalar("A", "A", 1) is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(17)
    bases = np.array(list("ACGT"))
    for trial in range(800):
        n = int(rng.integers(0, 420))
        a = "".join(rng.choice(bases, size=n))
        if rng.random() < 0.6 and n:
            b = list(a)
            for _ in range(int(rng.integers(0, 40))):
                k = int(rng.integers(0, len(b))) if b else 0
                op = rng.random()
                if op < 0.4 and b:
                    b[k] = str(rng.choice(bases))
                elif op < 0.7 and b:
                    del b[k]
                else:
                    b.insert(k, str(rng.choice(bases)))
            b = "".join(b)
        else:
            b = "".join(rng.choice(bases, size=int(rng.integers(0, 420))))
        T = int(rng.integers(0, 200))
        assert native.edit_distance_banded(a, b, T) == \
            native.edit_distance_banded_scalar(a, b, T), (len(a), len(b), T)
    # directed block-boundary cases
    for a, b, T in [("A" * 64, "A" * 64, 5), ("A" * 65, "A" * 64, 1),
                    ("A" * 128, "A" * 128, 0), ("ACGT" * 32, "ACGT" * 32, 3),
                    ("A" * 1000, "A" * 999, 700), ("A" * 64, "C" * 64, 64),
                    ("A" * 64, "C" * 64, 63), ("A", "C", 0)]:
        assert native.edit_distance_banded(a, b, T) == \
            native.edit_distance_banded_scalar(a, b, T), (len(a), len(b), T)

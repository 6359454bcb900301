"""Mode-B (stutter HMM) tests: component behavior + homopolymer e2e."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import (Locus, make_genome, write_bed, write_sample_bam)  # noqa: E402

from longtr_tpu.haplotype.blocks import HapBlock, Haplotype, RepeatBlock  # noqa: E402
from longtr_tpu.io.fasta import write_fasta  # noqa: E402
from longtr_tpu.io.vcf import VCFReader  # noqa: E402
from longtr_tpu.models.stutter import default_stutter_model  # noqa: E402
from longtr_tpu.pipeline.alignment import Alignment  # noqa: E402
from longtr_tpu.pipeline.mode_b import ModeBAligner, calc_seed_base  # noqa: E402

RNG = np.random.default_rng(31)


def make_homopolymer_hap(copies_list, flank_l="ACGTTGCAGC", flank_r="GTCAGGCTAT"):
    sm = default_stutter_model().with_period(1)
    start = 100
    blocks = [HapBlock(start - len(flank_l), start, flank_l)]
    rb = RepeatBlock(start, start + copies_list[0], "T" * copies_list[0], 1, sm)
    for c in copies_list[1:]:
        rb.add_alternate("T" * c)
    blocks.append(rb)
    blocks.append(HapBlock(start + copies_list[0],
                           start + copies_list[0] + len(flank_r), flank_r))
    return Haplotype(blocks), flank_l, flank_r


def read_for(copies, flank_l, flank_r, start=100):
    seq = flank_l + "T" * copies + flank_r
    aln = Alignment(start - len(flank_l), start + copies + len(flank_r) - 1,
                    False, False, "r", "I" * len(seq), seq, seq)
    ref_copies = 12
    cig = [("=", len(flank_l))]
    if copies == ref_copies:
        cig = [("=", len(seq))]
    elif copies > ref_copies:
        cig = [("=", len(flank_l) + ref_copies), ("I", copies - ref_copies),
               ("=", len(flank_r))]
    else:
        cig = [("=", len(flank_l) + copies), ("D", ref_copies - copies),
               ("=", len(flank_r))]
    aln.cigar = cig
    return aln


def test_mode_b_prefers_matching_allele():
    hap, fl, fr = make_homopolymer_hap([12, 9, 15])
    aligner = ModeBAligner(hap)
    h2a = hap.haps_to_alleles(1)
    for true_allele, copies in ((0, 12), (1, 9), (2, 15)):
        aln = read_for(copies, fl, fr)
        seed = calc_seed_base(aln, aligner.repeat_starts, aligner.repeat_ends,
                              hap.blocks[0].start, hap.blocks[-1].end)
        assert seed >= 0
        scores = aligner.score_read(aln, seed)
        best = int(np.argmax(scores))
        assert h2a[best] == true_allele, (copies, scores)
        assert np.all(scores <= 1e-9)


def test_mode_b_stutter_tolerance():
    # A read one unit off the true allele should still favor it over a
    # distant allele (stutter PMF absorbs +/-1).
    hap, fl, fr = make_homopolymer_hap([12, 4])
    aligner = ModeBAligner(hap)
    h2a = hap.haps_to_alleles(1)
    aln = read_for(11, fl, fr)   # 11 T's: closer to 12 than 4
    seed = calc_seed_base(aln, aligner.repeat_starts, aligner.repeat_ends,
                          hap.blocks[0].start, hap.blocks[-1].end)
    scores = aligner.score_read(aln, seed)
    assert h2a[int(np.argmax(scores))] == 0


def test_calc_seed_base_avoids_repeat():
    hap, fl, fr = make_homopolymer_hap([12])
    aligner = ModeBAligner(hap)
    aln = read_for(12, fl, fr)
    seed = calc_seed_base(aln, aligner.repeat_starts, aligner.repeat_ends,
                          hap.blocks[0].start, hap.blocks[-1].end)
    # seed must not fall inside the repeat block [100, 112)
    pos = aln.start + seed  # all-= cigar -> direct mapping
    assert not (100 <= pos < 112)


def test_e2e_homopolymer_with_stutter_align(tmp_path):
    """Full pipeline on a homopolymer locus with --stutter-align-len."""
    loci = [Locus("chr1", 1000, "T", 14, "HOMO_T")]
    genome = make_genome(RNG, loci)
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, loci)
    genotypes = {"S1": {"HOMO_T": (14, 18)}}
    bam = str(tmp_path / "S1.bam")
    write_sample_bam(bam, genome, loci, genotypes["S1"], "S1", RNG,
                     coverage=24)
    out = str(tmp_path / "calls.vcf.gz")
    from longtr_tpu.cli import main as cli_main
    assert cli_main(["--bams", bam, "--fasta", fasta, "--regions", bed,
                     "--tr-vcf", out, "--min-reads", "5",
                     "--stutter-align-len", "25", "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    gt = v.genotype("S1")
    assert gt is not None
    lens = sorted(len(v.alleles[a]) for a in gt[:2])
    ref_extra = len(v.ref) - 14
    assert [x - ref_extra for x in lens] == [14, 18]


def test_align_bulk_bit_identical_to_scalar():
    """Vectorized StutterAligner.align_bulk vs the scalar walk: exact
    equality over random homopolymer/periodic blocks, reads, artifact
    sizes, in both math modes (the bulk path feeds every artifact table)."""
    import numpy as np
    from longtr_tpu.haplotype.blocks import RepeatBlock
    from longtr_tpu.models.stutter import StutterModel
    from longtr_tpu.ops.stutter_hmm import StutterAligner
    from longtr_tpu.utils import mathops

    rng = np.random.default_rng(42)
    for fidelity in (False, True):
        mathops.set_ref_fidelity(fidelity)
        try:
            for trial in range(20):
                period = int(rng.integers(1, 3))
                units = int(rng.integers(6, 20))
                model = StutterModel(0.9, 0.05, 0.05, 0.85, 0.02, 0.01,
                                     "N" * period)
                base = "".join(rng.choice(list("ACGT"), period))
                bseq = base * units
                if rng.random() < 0.3:      # imperfect repeat
                    p = int(rng.integers(0, len(bseq)))
                    bseq = bseq[:p] + "ACGT"[int(rng.integers(4))] + \
                        bseq[p + 1:]
                blk = RepeatBlock(100, 100 + len(bseq), bseq, period, model)
                sa = StutterAligner(bseq, period, True, blk.repeat_info)
                L = int(rng.integers(len(bseq) + 8, len(bseq) + 60))
                seg = "".join(rng.choice(list("ACGT"), L))
                lw = -rng.uniform(2.0, 6.0, L)
                lc = -rng.uniform(1e-4, 1e-2, L)
                sa.load_read(L, seg, list(lw), list(lc))
                blen = len(bseq)
                for D in range(blk.max_del, blk.max_ins + 1, period):
                    jj = np.arange(L)
                    ok = jj + 1 >= blen + D
                    if D < 0:
                        ok &= (L - 1 - jj) + D >= 0
                    if D == 0:
                        ok = jj >= 0
                    jb = jj[ok]
                    if not jb.size:
                        continue
                    got = sa.align_bulk(L - 1 - jb, D)
                    want = np.array([sa.align(min(blen + D, j + 1), j,
                                              L - 1 - j, D)[0]
                                     for j in jb])
                    assert np.array_equal(got, want), (fidelity, trial, D)
        finally:
            mathops.set_ref_fidelity(False)


def test_align_short_batch_bit_identical_to_scalar():
    """align_short_batch (shared masked descent over varying base_len)
    vs the scalar walk: exact equality across the short-prefix regime."""
    import numpy as np
    from longtr_tpu.haplotype.blocks import RepeatBlock
    from longtr_tpu.models.stutter import StutterModel
    from longtr_tpu.ops.stutter_hmm import StutterAligner
    from longtr_tpu.utils import mathops

    rng = np.random.default_rng(43)
    for fidelity in (False, True):
        mathops.set_ref_fidelity(fidelity)
        try:
            for trial in range(20):
                period = int(rng.integers(1, 3))
                units = int(rng.integers(6, 20))
                model = StutterModel(0.9, 0.05, 0.05, 0.85, 0.02, 0.01,
                                     "N" * period)
                base = "".join(rng.choice(list("ACGT"), period))
                bseq = base * units
                if rng.random() < 0.4:      # imperfect repeat
                    p = int(rng.integers(0, len(bseq)))
                    bseq = bseq[:p] + "ACGT"[int(rng.integers(4))] + \
                        bseq[p + 1:]
                blk = RepeatBlock(100, 100 + len(bseq), bseq, period, model)
                sa = StutterAligner(bseq, period, True, blk.repeat_info)
                blen = len(bseq)
                L = int(rng.integers(max(blen, 10), blen + 40))
                seg = "".join(rng.choice(list("ACGT"), L))
                lw = -rng.uniform(2.0, 6.0, L)
                lc = -rng.uniform(1e-4, 1e-2, L)
                sa.load_read(L, seg, list(lw), list(lc))
                for D in range(blk.max_del, blk.max_ins + 1, period):
                    if D == 0 or blen + D < 0:
                        continue
                    jj = np.arange(L)
                    # every non-bulk column, incl. deletion offset+D<0
                    short = jj + 1 < blen + D
                    if D < 0:
                        short |= (L - 1 - jj) + D < 0
                    js = jj[short]
                    if not js.size:
                        continue
                    got = sa.align_short_batch(js, D)
                    want = np.array(
                        [sa.align(min(blen + D, j + 1), j, L - 1 - j, D)[0]
                         for j in js])
                    assert np.array_equal(got, want), (fidelity, trial, D)
        finally:
            mathops.set_ref_fidelity(False)


def test_fast_lse_cols_edge_cases():
    """fast_lse_cols matches per-column fast_lse, including all -inf
    columns (the guard path) and IMPOSSIBLE sentinels."""
    import numpy as np
    from longtr_tpu.ops.stutter_hmm import (IMPOSSIBLE, fast_lse,
                                            fast_lse_cols)

    rng = np.random.default_rng(9)
    E = rng.uniform(-50, 0, size=(7, 12))
    E[0, 3] = -np.inf
    E[:, 5] = -np.inf                       # whole column dropped
    E[2, 7] = IMPOSSIBLE
    got = fast_lse_cols(list(E))
    for c in range(E.shape[1]):
        want = fast_lse(E[:, c])
        if np.isfinite(want):
            assert got[c] == want, c
        else:
            assert not np.isfinite(got[c]), c


def test_fast_lse_cols_edge_cases_fidelity():
    """Same edge cases in reference-fidelity mode: the Mineiro column
    variant must match the scalar variant per column and must not emit
    numpy invalid-cast warnings on all-(-inf) columns (the NaN-diff guard,
    utils/fastapprox.fast_log_sum_exp_cols)."""
    import warnings

    from longtr_tpu.ops.stutter_hmm import (IMPOSSIBLE, fast_lse,
                                            fast_lse_cols)
    from longtr_tpu.utils import mathops

    rng = np.random.default_rng(9)
    E = rng.uniform(-50, 0, size=(7, 12))
    E[0, 3] = -np.inf
    E[:, 5] = -np.inf                       # whole column dropped
    E[2, 7] = IMPOSSIBLE
    mathops.set_ref_fidelity(True)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = fast_lse_cols(list(E))
            per_col = [fast_lse(E[:, c]) for c in range(E.shape[1])]
    finally:
        mathops.set_ref_fidelity(False)
    for c, want in enumerate(per_col):
        if np.isfinite(want):
            assert got[c] == want, c
        else:
            assert not np.isfinite(got[c]), c


def test_mode_b_parallel_builds_match_serial(tmp_path, monkeypatch):
    """Deferred mode-B dispatch (table prep on build workers, device finish
    on the main thread) must produce byte-identical VCFs to
    LONGTR_SERIAL_BUILD=1 on a multi-locus homopolymer catalog."""
    import gzip

    from longtr_tpu.cli import main as cli_main

    rng = np.random.default_rng(17)
    loci = [Locus("chr1", 1000 + 400 * i, "T", 11 + (i % 5), f"HOMO{i}")
            for i in range(8)]
    genome = make_genome(rng, loci)
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, loci)
    genotypes = {l.name: (l.ref_copies, l.ref_copies + (2 if i % 2 else 0))
                 for i, l in enumerate(loci)}
    bam = str(tmp_path / "S1.bam")
    write_sample_bam(bam, genome, loci, genotypes, "S1", rng, coverage=20)
    base = ["--bams", bam, "--fasta", fasta, "--regions", bed,
            "--min-reads", "5", "--stutter-align-len", "25", "--quiet"]

    def body(p):
        return [ln for ln in
                gzip.decompress(open(p, "rb").read()).decode().splitlines()
                if not ln.startswith("##command")]

    par = str(tmp_path / "par.vcf.gz")
    assert cli_main(base + ["--tr-vcf", par]) == 0
    monkeypatch.setenv("LONGTR_SERIAL_BUILD", "1")
    ser = str(tmp_path / "ser.vcf.gz")
    assert cli_main(base + ["--tr-vcf", ser]) == 0
    assert body(par) == body(ser)
    assert sum(1 for ln in body(par) if not ln.startswith("#")) == len(loci)


def test_genotype_direct_call_runs_deferred_finish():
    """SeqStutterGenotyper.genotype() (the library entry) must execute a
    deferred mode-B finish itself: genotype_prepare defers the device
    dispatch for the cross-locus scheduler, but a direct caller has no
    scheduler (regression: _pool_scores was never set -> AttributeError)."""
    from longtr_tpu.pipeline.seq_genotyper import SeqStutterGenotyper

    gt = object.__new__(SeqStutterGenotyper)
    scores = np.zeros((3, 2))
    ran = []

    def prepare(max_total_haplotypes=1000):
        gt._mode_b_finish = lambda: (ran.append(1), scores)[1]
        return True, None

    gt.genotype_prepare = prepare
    gt.genotype_finalize = lambda **kw: True
    assert gt.genotype() is True
    assert ran == [1]
    assert gt._pool_scores is scores
    assert gt._mode_b_finish is None

"""SNP-VCF phasing path: trees, per-read factors, and the e2e pipeline."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import standard_fixture  # noqa: E402

from longtr_tpu.io.bgzf import BgzfWriter  # noqa: E402
from longtr_tpu.io.vcf import VCFReader  # noqa: E402
from longtr_tpu.pipeline.snp_phasing import (SNP, SNPTree,  # noqa: E402
                                             create_snp_trees)


def test_snp_tree_queries():
    snps = [SNP(10, "A", "G"), SNP(20, "C", "T"), SNP(30, "G", "A")]
    tree = SNPTree(snps)
    assert [s.pos for s in tree.find_contained(10, 30)] == [10, 20, 30]
    assert [s.pos for s in tree.find_contained(11, 29)] == [20]
    assert tree.find_contained(31, 40) == []


def write_snp_vcf(path, genome, samples, rng, skip_span=None, spacing=(40, 120),
                  chroms=("chr1",)):
    """Phased het SNPs along the given chroms; hap1 carries ALT at every SNP.
    snp_positions returned for chroms[0] only (chr1, what the tests probe)."""
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(samples)]
    snp_positions = []
    for chrom in chroms:
        chrom_seq = genome[chrom]
        pos = 300
        while pos < len(chrom_seq) - 300:
            pos += int(rng.integers(*spacing))
            if skip_span and chrom == chroms[0] and \
                    skip_span[0] <= pos <= skip_span[1]:
                continue
            if pos >= len(chrom_seq) - 300:
                break
            ref = chrom_seq[pos]  # 0-based
            alt = "ACGT"[("ACGT".index(ref.upper()) + 1) % 4]
            gts = "\t".join("1|0" for _ in samples)
            lines.append(f"{chrom}\t{pos + 1}\tsnp{chrom}_{pos}\t{ref.upper()}"
                         f"\t{alt}\t.\t.\t.\tGT\t{gts}")
            if chrom == chroms[0]:
                snp_positions.append(pos)
    w = BgzfWriter(path)
    w.write("\n".join(lines) + "\n")
    w.close()
    return snp_positions


def test_create_snp_trees_and_factors(tmp_path):
    rng = np.random.default_rng(11)
    fx = standard_fixture(str(tmp_path), rng=rng)
    snp_path = str(tmp_path / "snps.vcf.gz")
    positions = write_snp_vcf(snp_path, fx["genome"],
                              ["SAMP1", "SAMP2", "SAMP3"], rng)
    vcf = VCFReader(snp_path)
    from longtr_tpu.regions import Region, RegionGroup
    region = Region("chr1", 1000, 1020, "AC", "STR_AC")
    ok, sample_indices, trees = create_snp_trees(
        "chr1", 0, 3000, [region], 15, vcf)
    assert ok and set(sample_indices) == {"SAMP1", "SAMP2", "SAMP3"}
    tree = trees[sample_indices["SAMP1"]]
    # SNPs within 15bp of the TR are skipped
    for s in tree.snps:
        assert not (1000 - 15 <= s.pos + 1 <= 1020 + 15)


def test_e2e_with_snp_vcf(tmp_path):
    """Reads simulated from hap1/hap2 phase against a phased SNP VCF."""
    rng = np.random.default_rng(21)
    fx = standard_fixture(str(tmp_path), rng=rng)
    # Build a SNP VCF where ALT is on hap1. Reads in the fixture don't carry
    # SNP alleles (they're reference-derived), so phasing factors will favor
    # hap2 for every read; the pipeline should still run end-to-end and
    # produce DSNP>0.
    snp_path = str(tmp_path / "snps.vcf.gz")
    write_snp_vcf(snp_path, fx["genome"], ["SAMP1", "SAMP2", "SAMP3"], rng)
    out = str(tmp_path / "calls_snp.vcf.gz")
    from longtr_tpu.cli import main as cli_main
    argv = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--tr-vcf", out, "--min-reads", "5",
            "--snp-vcf", snp_path, "--quiet"]
    assert cli_main(argv) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    assert int(v.get_info("DSNP")) > 0
    # Genotypes still correct for the AC locus
    for sample, g in fx["genotypes"].items():
        gt = v.genotype(sample)
        assert gt is not None
        lens = tuple(sorted(len(v.alleles[a]) for a in gt[:2]))
        ref_extra = len(v.ref) - 20
        want = tuple(sorted(2 * c for c in g["STR_AC"]))
        assert tuple(x - ref_extra for x in lens) == want


def test_e2e_with_fam_pedigree_filter(tmp_path):
    """--fam wires pedigree-based SNP filtering (hipstr_main.cpp:581-594):
    with every SNP an identical ambiguous het in all trio members, haplotype
    transmission cannot be inferred, so the family's SNPs are cleared
    (snp_tree.cpp create_snp_trees tracker branch) and DSNP drops to 0."""
    rng = np.random.default_rng(33)
    fx = standard_fixture(str(tmp_path), rng=rng)
    snp_path = str(tmp_path / "snps.vcf.gz")
    # every catalog chromosome must appear in the SNP VCF: with --fam the
    # tracker's advance() onto a missing chromosome is FATAL upstream
    # (haplotype_tracker.cpp:90-92; test_pipeline_record_parity covers it)
    write_snp_vcf(snp_path, fx["genome"], ["SAMP1", "SAMP2", "SAMP3"], rng,
                  chroms=("chr1", "chr2", "chr3"))
    fam_path = str(tmp_path / "trio.fam")
    with open(fam_path, "w") as fh:
        fh.write("FAM1\tSAMP1\tSAMP2\tSAMP3\n")
    out = str(tmp_path / "calls_fam.vcf.gz")
    from longtr_tpu.cli import main as cli_main
    argv = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--tr-vcf", out, "--min-reads", "5",
            "--snp-vcf", snp_path, "--fam", fam_path, "--quiet"]
    assert cli_main(argv) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    assert int(v.get_info("DSNP")) == 0

    # --fam without --snp-vcf is a usage error (hipstr_main.cpp:583-584)
    import pytest
    with pytest.raises(SystemExit):
        cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                  "--regions", fx["bed"],
                  "--tr-vcf", str(tmp_path / "x.vcf.gz"),
                  "--fam", fam_path, "--quiet"])


def test_region_low_edge_matches_tabix_semantics(tmp_path):
    """The reference queries tabix with 1-BASED regions ("chrom:start" /
    "chrom:start-end", vcf_reader.h:222-227), so a SNP at POS == start is
    INSIDE the window.  Our 0-based VCFReader.set_region callers must pass
    start-1 to match — a straight pass-through silently narrows every SNP
    window by 1bp at the low edge (found by a reference-semantics audit
    after the std::map campaign findings)."""
    import numpy as np

    from longtr_tpu.denovo.haplotype_tracker import HaplotypeTracker
    from longtr_tpu.denovo.pedigree import NuclearFamily
    from longtr_tpu.io.vcf import VCFReader
    from longtr_tpu.pipeline.snp_phasing import create_snp_trees

    rng = np.random.default_rng(3)
    chrom_seq = "".join(rng.choice(list("ACGT"), size=4000))
    genome = {"chr1": chrom_seq}
    samples = ["MOM", "DAD", "KID"]

    # one SNP exactly at the window's low edge: POS1 == window_start
    window_start = 1200          # the value callers hand to create_snp_trees
    snp_pos0 = window_start - 1  # POS1 == 1200
    path = str(tmp_path / "edge.vcf.gz")
    ref = chrom_seq[snp_pos0].upper()
    alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(samples),
             f"chr1\t{snp_pos0 + 1}\tsnp\t{ref}\t{alt}\t.\t.\t.\tGT\t"
             + "\t".join("1|0" for _ in samples)]
    w = BgzfWriter(path)
    w.write("\n".join(lines) + "\n")
    w.close()

    vcf = VCFReader(path)
    ok, sample_indices, trees = create_snp_trees(
        "chr1", window_start, window_start + 500, [], 15, vcf)
    assert ok
    # the edge SNP must be in every sample's tree (reference includes it)
    found = trees[sample_indices["MOM"]].find_contained(snp_pos0, snp_pos0)
    assert found, "SNP at POS == window start must be inside the window"

    # HaplotypeTracker::advance: same edge via "chrom:start"
    vcf2 = VCFReader(path)
    fam = NuclearFamily("F1", "MOM", "DAD", ["KID"])
    tracker = HaplotypeTracker([fam], vcf2, window_size=500)
    # position such that start_of_window == POS1 of the SNP
    tracker.advance("chr1", snp_pos0 + 1 + 500, set())
    assert tracker.num_stored_snps() == 1, \
        "SNP at POS == start_of_window must be tracked"

"""End-to-end pipeline test: synthetic genome/BAMs → VCF with known truth."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import standard_fixture  # noqa: E402

from longtr_tpu.cli import main as cli_main  # noqa: E402
from longtr_tpu.io.vcf import VCFReader  # noqa: E402


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("synth"))
    return standard_fixture(tmpdir)


def run_cli(fixture, out_vcf, extra=()):
    argv = ["--bams", ",".join(fixture["bams"]),
            "--fasta", fixture["fasta"],
            "--regions", fixture["bed"],
            "--tr-vcf", out_vcf,
            "--min-reads", "5", "--quiet"] + list(extra)
    assert cli_main(argv) == 0
    return VCFReader(out_vcf)


def genotype_lengths(variant, sample):
    gt = variant.genotype(sample)
    assert gt is not None, f"missing genotype for {sample}"
    a, b, phased = gt
    return tuple(sorted((len(variant.alleles[a]), len(variant.alleles[b]))))


def expected_lengths(fixture, locus, sample):
    ref_len = locus.stop - locus.start
    g = fixture["genotypes"][sample][locus.name]
    return tuple(sorted(len(locus.motif) * c for c in g)), ref_len


def check_all_genotypes(fixture, vcf):
    variants = {}
    for chrom in ("chr1", "chr2", "chr3"):
        vcf.set_region(chrom, 0)
        while True:
            v = vcf.get_next_variant()
            if v is None:
                break
            variants[v.vid] = v
    assert len(variants) == len(fixture["loci"])
    for locus in fixture["loci"]:
        v = variants[locus.name]
        # VCF REF spans [START..END] per the INFO fields; the repeat portion
        # must reproduce each sample's simulated allele lengths.
        start = int(v.get_info("START"))
        end = int(v.get_info("END"))
        pad = (start - v.pos - 1) + (len(v.ref) - (end - v.pos))
        for sample in fixture["genotypes"]:
            want, _ = expected_lengths(fixture, locus, sample)
            got = genotype_lengths(v, sample)
            got = tuple(x - (len(v.ref) - (locus.stop - locus.start)) for x in got)
            assert got == want, (locus.name, sample, got, want)


def test_e2e_unphased(fixture, tmp_path):
    out = str(tmp_path / "calls.vcf.gz")
    vcf = run_cli(fixture, out)
    assert set(vcf.get_samples()) == {"SAMP1", "SAMP2", "SAMP3"}
    check_all_genotypes(fixture, vcf)


def test_e2e_phased_bam(fixture, tmp_path):
    out = str(tmp_path / "calls_phased.vcf.gz")
    vcf = run_cli(fixture, out, extra=["--phased-bam"])
    check_all_genotypes(fixture, vcf)
    # Phased mode: PDP should reflect per-haplotype read counts
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    pdp = v.sample_field("SAMP1", "PDP")
    assert pdp is not None and "|" in pdp


def test_e2e_info_fields(fixture, tmp_path):
    out = str(tmp_path / "calls_info.vcf.gz")
    vcf = run_cli(fixture, out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v.get_info("START") is not None
    assert v.get_info("END") is not None
    assert int(v.get_info("DP")) > 0
    assert v.get_info("MOTIF") == "AC"
    assert int(v.get_info("AN")) == 6
    # Q should be high for clean simulated reads
    for s in ("SAMP1", "SAMP2", "SAMP3"):
        q = float(v.sample_field(s, "Q"))
        assert q > 0.9, (s, q)


def test_e2e_with_errors(tmp_path_factory, tmp_path):
    tmpdir = str(tmp_path_factory.mktemp("synth_err"))
    fx = standard_fixture(tmpdir, rng=np.random.default_rng(7), sub_rate=0.002)
    out = str(tmp_path / "calls_err.vcf.gz")
    vcf = run_cli(fx, out)
    check_all_genotypes(fx, vcf)


def test_e2e_cohort_scale(tmp_path_factory, tmp_path):
    """16-sample cohort through the multi-reader, posterior, and VCF
    emission width: all samples called, all genotypes correct, sample
    columns in header order.  (48-sample x 200-locus validated in
    benchmarks/loci_throughput.py --samples; this is the CI-sized
    version.)"""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(__file__))
    from synth import Locus, make_genome, write_bed, write_fasta, \
        write_sample_bam

    rng = np.random.default_rng(1234)
    tmpdir = str(tmp_path_factory.mktemp("synth_cohort"))
    loci = [
        Locus("chr1", 1000, "AC", 10, "STR_AC"),
        Locus("chr1", 2000, "AGAT", 8, "STR_AGAT"),
        Locus("chr2", 1500, "TTTA", 9, "STR_TTTA"),
    ]
    genome = make_genome(rng, loci)
    fasta = os.path.join(tmpdir, "genome.fa")
    write_fasta(fasta, {c: genome[c] for c in sorted(genome)})
    bed = os.path.join(tmpdir, "regions.bed")
    write_bed(bed, loci)
    genotypes = {}
    bams = []
    for k in range(16):
        sample = f"C{k:02d}"
        gts = {}
        for loc in loci:
            a = loc.ref_copies + int(rng.integers(-2, 3))
            b = loc.ref_copies + int(rng.integers(-2, 3))
            gts[loc.name] = (a, b)
        genotypes[sample] = gts
        path = os.path.join(tmpdir, sample + ".bam")
        write_sample_bam(path, genome, loci, gts, sample, rng, coverage=20)
        bams.append(path)
    fx = dict(loci=loci, genome=genome, fasta=fasta, bed=bed,
              genotypes=genotypes, bams=bams)
    out = str(tmp_path / "cohort.vcf.gz")
    vcf = run_cli(fx, out)
    assert set(vcf.get_samples()) == set(genotypes)
    check_all_genotypes(fx, vcf)

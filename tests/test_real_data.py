"""Real-HiFi e2e in CI: a slice of the reference's bundled HG002/3/4 trio.

The full 39-locus run lives in benchmarks/real_data_smoke.py; this keeps a
fast 6-locus slice in the suite so real 10-25kb reads (real base
qualities, HP tags, the 7-column HipSTR BED format, multi-sample
--bam-samps mapping) are exercised on every test run, with a Mendelian
consistency assertion as the truth check (reference analog
src/pedigree.cpp Mendelian machinery)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

TEST_DATA = "/root/reference/test_data"


@pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                    reason="bundled trio data unavailable")
def test_real_trio_slice(tmp_path):
    from real_data_smoke import reconstruct_reference

    from longtr_tpu.cli import main as cli_main
    from longtr_tpu.denovo.pedigree import NuclearFamily
    from longtr_tpu.io.fasta import write_fasta
    from longtr_tpu.io.vcf import VCFReader

    n_loci = 6
    bams = [os.path.join(TEST_DATA, f"HG00{i}_sample_reads.bam")
            for i in (2, 3, 4)]
    bed_in = os.path.join(TEST_DATA, "test_regions_hg38.bed")
    loci = []
    with open(bed_in) as fh:
        lines = fh.readlines()
    for ln in lines[:n_loci]:
        f = ln.split()
        loci.append((f[0], int(f[1]), int(f[2])))
    genome = reconstruct_reference(bams, loci, None)
    fasta = str(tmp_path / "est_ref.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "regions.bed")
    with open(bed, "w") as fh:
        fh.writelines(lines[:n_loci])

    out = str(tmp_path / "trio.vcf.gz")
    rc = cli_main(["--bams", ",".join(bams), "--fasta", fasta,
                   "--regions", bed, "--tr-vcf", out,
                   "--bam-samps", "HG002,HG003,HG004",
                   "--bam-libs", "HG002,HG003,HG004",
                   "--min-reads", "5", "--max-tr-len", "10000",
                   "--skip-assembly", "--phased-bam", "--quiet"])
    assert rc == 0

    fam = NuclearFamily("trio", mother="HG004", father="HG003",
                        children=["HG002"])
    reader = VCFReader(out)
    n_rec = n_full = n_mendel = 0
    for chrom in reader.chromosomes():
        reader.set_region(chrom, 0)
        while (var := reader.get_next_variant()) is not None:
            n_rec += 1
            if fam.is_missing_genotype(var):
                continue
            n_full += 1
            if fam.is_mendelian(var):
                n_mendel += 1
    assert n_rec >= n_loci - 1           # at most one gated locus in slice
    assert n_full >= 3
    assert n_mendel >= n_full - 1        # near-perfect on this easy slice

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


@pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                    reason="bundled trio data unavailable")
def test_real_trio_slice_from_cram(tmp_path):
    """Same slice via CRAM input: convert the real HiFi BAMs with our CRAM
    writer (rANS on real 10-25kb sequences) and require a byte-identical
    VCF to the BAM-input run (io/cram.py vs io/bam.py differential)."""
    from real_data_smoke import reconstruct_reference

    from longtr_tpu.cli import main as cli_main
    from longtr_tpu.io.bam import BamReader
    from longtr_tpu.io.bgzf import bgzf_open_text
    from longtr_tpu.io.cram import CramWriter
    from longtr_tpu.io.fasta import FastaReader, write_fasta

    n_loci = 6
    bams = [os.path.join(TEST_DATA, f"HG00{i}_sample_reads.bam")
            for i in (2, 3, 4)]
    bed_in = os.path.join(TEST_DATA, "test_regions_hg38.bed")
    with open(bed_in) as fh:
        lines = fh.readlines()
    loci = [(f[0], int(f[1]), int(f[2]))
            for f in (ln.split() for ln in lines[:n_loci])]
    genome = reconstruct_reference(bams, loci, None)
    fasta = str(tmp_path / "est_ref.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "regions.bed")
    with open(bed, "w") as fh:
        fh.writelines(lines[:n_loci])

    crams = []
    fr = FastaReader(fasta)
    for bam in bams:
        r = BamReader(bam)
        cram = str(tmp_path / (os.path.basename(bam)[:-4] + ".cram"))
        w = CramWriter(cram, r.header.text, r.header.ref_names,
                       r.header.ref_lengths)
        for rid, name in enumerate(r.header.ref_names):
            if name in genome:
                w.set_reference(rid, fr.get_sequence(name))
        spans = {}
        for chrom, s, e in loci:
            lo, hi = spans.get(chrom, (s, e))
            spans[chrom] = (min(lo, s), max(hi, e))
        while (rec := r.get_next_alignment()) is not None:
            span = spans.get(rec.ref_name)
            # keep only reads near the slice loci (full conversion is
            # exercised by tests/test_cram.py; this keeps CI fast)
            if span and rec.pos < span[1] + 2000 and \
                    rec.end_pos > span[0] - 2000:
                w.save_alignment(rec)
        w.close()
        r.close()
        crams.append(cram)

    def run(inputs, out_name):
        out = str(tmp_path / out_name)
        rc = cli_main(["--bams", ",".join(inputs), "--fasta", fasta,
                       "--regions", bed, "--tr-vcf", out,
                       "--bam-samps", "HG002,HG003,HG004",
                       "--bam-libs", "HG002,HG003,HG004",
                       "--min-reads", "5", "--max-tr-len", "10000",
                       "--skip-assembly", "--phased-bam", "--quiet"])
        assert rc == 0
        return [ln for ln in bgzf_open_text(out) if not ln.startswith("##")]

    assert run(crams, "cram.vcf.gz") == run(bams, "bam.vcf.gz")

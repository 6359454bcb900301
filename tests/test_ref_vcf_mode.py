"""--ref-vcf mode: candidate alleles come from a reference panel VCF."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import Locus, make_genome, write_bed, write_sample_bam  # noqa: E402

from longtr_tpu.io.bgzf import BgzfWriter  # noqa: E402
from longtr_tpu.io.fasta import write_fasta  # noqa: E402
from longtr_tpu.io.vcf import VCFReader  # noqa: E402

RNG = np.random.default_rng(55)


def write_panel_vcf(path, genome, locus, alt_copies):
    """Panel VCF whose record spans exactly the repeat (START/END INFO)."""
    chrom_seq = genome[locus.chrom]
    ref = chrom_seq[locus.start: locus.stop]
    alts = [locus.motif * c for c in alt_copies]
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    lines.append(
        f"{locus.chrom}\t{locus.start + 1}\t{locus.name}\t{ref}\t"
        f"{','.join(alts)}\t.\t.\t"
        f"START={locus.start + 1};END={locus.stop};PERIOD={len(locus.motif)}")
    w = BgzfWriter(path)
    w.write("\n".join(lines) + "\n")
    w.close()


def test_ref_vcf_alleles_used(tmp_path):
    locus = Locus("chr1", 1000, "AC", 10, "STR_AC")
    genome = make_genome(RNG, [locus])
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, [locus])
    bam = str(tmp_path / "S1.bam")
    write_sample_bam(bam, genome, [locus], {"STR_AC": (10, 13)}, "S1", RNG,
                     coverage=20)
    panel = str(tmp_path / "panel.vcf.gz")
    # panel contains ref (10 copies) + alts 13 and 7 copies
    write_panel_vcf(panel, genome, locus, [13, 7])

    out = str(tmp_path / "calls.vcf.gz")
    from longtr_tpu.cli import main as cli_main
    assert cli_main(["--bams", bam, "--fasta", fasta, "--regions", bed,
                     "--tr-vcf", out, "--ref-vcf", panel,
                     "--min-reads", "5", "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    # Panel alleles define the candidate set: with ref-vcf mode no pruning
    # happens (seq_stutter_genotyper.cpp:636), so the 7-copy allele must
    # still be present even though no sample carries it.
    lens = sorted(len(a) for a in v.alleles)
    ref_extra = len(v.ref) - 20
    assert [x - ref_extra for x in lens] == [14, 20, 26]
    gt = v.genotype("S1")
    got = sorted(len(v.alleles[a]) - ref_extra for a in gt[:2])
    assert got == [20, 26]


def test_ref_vcf_missing_locus_fails_gracefully(tmp_path):
    locus = Locus("chr1", 1000, "AC", 10, "STR_AC")
    genome = make_genome(RNG, [locus])
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, [locus])
    bam = str(tmp_path / "S1.bam")
    write_sample_bam(bam, genome, [locus], {"STR_AC": (10, 10)}, "S1", RNG)
    # empty panel: no record for the locus
    panel = str(tmp_path / "panel.vcf.gz")
    w = BgzfWriter(panel)
    w.write("##fileformat=VCFv4.1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    w.close()
    out = str(tmp_path / "calls.vcf.gz")
    from longtr_tpu.cli import main as cli_main
    assert cli_main(["--bams", bam, "--fasta", fasta, "--regions", bed,
                     "--tr-vcf", out, "--ref-vcf", panel,
                     "--min-reads", "5", "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    assert vcf.get_next_variant() is None  # locus skipped, run completes


def test_ref_vcf_round_trip_reproduces_genotypes(tmp_path):
    """Re-genotyping against our own emitted VCF as the reference panel
    reproduces the original calls (the panel-mode loop users run for
    population-consistent allele sets)."""
    import gzip

    from synth import standard_fixture

    from longtr_tpu.cli import main as cli_main

    fx = standard_fixture(str(tmp_path))
    base = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--use-unpaired", "--quiet"]
    first = str(tmp_path / "first.vcf.gz")
    assert cli_main(base + ["--tr-vcf", first]) == 0
    second = str(tmp_path / "second.vcf.gz")
    assert cli_main(base + ["--tr-vcf", second, "--ref-vcf", first]) == 0

    def gts(p):
        out = {}
        for ln in gzip.decompress(open(p, "rb").read()).decode().splitlines():
            if ln.startswith("#"):
                continue
            c = ln.split("\t")
            out[(c[0], c[1])] = [s.split(":")[0] for s in c[9:]]
        return out
    a, b = gts(first), gts(second)
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], k

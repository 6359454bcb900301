"""Workflow e2e tests: EM stutter learning from the CLI, VNTR/ONT-style
runs with custom alignment params, and checkpoint/resume."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import (Locus, add_errors, make_genome, sample_haplotype_read,
                   standard_fixture, write_bed, write_sample_bam)  # noqa: E402

from longtr_tpu.cli import main as cli_main  # noqa: E402
from longtr_tpu.io.bam import BamRecord  # noqa: E402
from longtr_tpu.io.bam_write import BamWriter, build_bai  # noqa: E402
from longtr_tpu.io.fasta import write_fasta  # noqa: E402
from longtr_tpu.io.vcf import VCFReader  # noqa: E402

RNG = np.random.default_rng(66)


def test_em_learning_from_cli(tmp_path):
    """--no-def-stutter-model triggers per-locus EM; --stutter-out persists
    the learned models in the --stutter-in format."""
    fx = standard_fixture(str(tmp_path))
    out = str(tmp_path / "calls.vcf.gz")
    stut = str(tmp_path / "stutter.txt")
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out,
                     "--no-def-stutter-model", "--stutter-out", stut,
                     "--min-reads", "5", "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    assert vcf.get_next_variant() is not None
    # learned model file round-trips as --stutter-in
    from longtr_tpu.models.stutter import StutterModel
    models = StutterModel.read_models(stut)
    assert len(models) >= 3
    out2 = str(tmp_path / "calls2.vcf.gz")
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out2,
                     "--stutter-in", stut, "--min-reads", "5", "--quiet"]) == 0
    vcf2 = VCFReader(out2)
    vcf2.set_region("chr1", 0)
    v = vcf2.get_next_variant()
    assert v is not None
    for s in fx["genotypes"]:
        assert v.genotype(s) is not None


def test_vntr_high_error_custom_params(tmp_path):
    """BASELINE config 5 analog: long VNTR motif, elevated error rate,
    custom --alignment-params, --max-tr-len."""
    motif = "ACGGTCATGG"  # 10bp motif
    loci = [Locus("chr1", 1000, motif, 15, "VNTR_1")]   # 150bp repeat
    genome = make_genome(RNG, loci, chrom_len=4000)
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, loci)
    bam = str(tmp_path / "S1.bam")
    write_sample_bam(bam, genome, loci, {"VNTR_1": (15, 18)}, "S1", RNG,
                     coverage=30, sub_rate=0.02)   # ONT-ish substitutions
    out = str(tmp_path / "calls.vcf.gz")
    assert cli_main(["--bams", bam, "--fasta", fasta, "--regions", bed,
                     "--tr-vcf", out, "--min-reads", "5",
                     "--max-tr-len", "1000",
                     "--alignment-params=-1.5,-0.3,-1.5,-0.3,-0.0001,-8.0,-8.0",
                     "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    gt = v.genotype("S1")
    assert gt is not None
    ref_extra = len(v.ref) - 150
    lens = sorted(len(v.alleles[a]) - ref_extra for a in gt[:2])
    assert lens == [150, 180], lens


def test_checkpoint_resume(tmp_path):
    fx = standard_fixture(str(tmp_path))
    ckpt = str(tmp_path / "progress.txt")
    out1 = str(tmp_path / "part1.vcf.gz")
    base = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--min-reads", "5", "--quiet"]
    # First run: only chr1 (simulates a partial run), checkpointing
    assert cli_main(base + ["--tr-vcf", out1, "--chrom", "chr1",
                            "--checkpoint", ckpt]) == 0
    done = open(ckpt).read().splitlines()
    assert len(done) == 2 and all(k.startswith("chr1:") for k in done)
    # Resume over the full catalog: chr1 loci are skipped
    out2 = str(tmp_path / "part2.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out2, "--checkpoint", ckpt]) == 0
    body = [ln for ln in __import__("longtr_tpu.io.bgzf", fromlist=["bgzf_open_text"])
            .bgzf_open_text(out2) if not ln.startswith("#")]
    chroms = {ln.split("\t")[0] for ln in body}
    assert chroms == {"chr2", "chr3"}
    assert len(open(ckpt).read().splitlines()) == 4


def test_pass_and_filt_bam_outputs(tmp_path):
    """--pass-bam collects genotyping reads with a PF tag; --filt-bam
    collects rejected reads with an FT reason tag (bam_processor.cpp:20-55,
    323-443)."""
    from longtr_tpu.io.bam import BamReader

    fx = standard_fixture(str(tmp_path))
    out = str(tmp_path / "calls.vcf.gz")
    pass_bam = str(tmp_path / "pass.bam")
    filt_bam = str(tmp_path / "filt.bam")
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out,
                     "--pass-bam", pass_bam, "--filt-bam", filt_bam,
                     "--use-unpaired", "--quiet"]) == 0
    r = BamReader(pass_bam)
    n_pass = 0
    while (rec := r.get_next_alignment()) is not None:
        n_pass += 1
        assert rec.get_tag("PF") == "1"
    assert n_pass == 240  # 4 loci x 3 samples x 20 reads, all clean

    # Force rejections with an unreachable MAPQ threshold.
    out2 = str(tmp_path / "calls2.vcf.gz")
    filt2 = str(tmp_path / "filt2.bam")
    assert cli_main(["--bams", fx["bams"][0], "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out2,
                     "--filt-bam", filt2, "--min-mapq", "99",
                     "--use-unpaired", "--quiet"]) == 0
    r = BamReader(filt2)
    reasons = set()
    n_filt = 0
    while (rec := r.get_next_alignment()) is not None:
        n_filt += 1
        reasons.add(rec.get_tag("FT"))
    assert n_filt == 80 and reasons == {"LOW_MAPQ"}


def test_haploid_chroms_e2e(tmp_path):
    """--haploid-chrs emits single-allele genotypes on the named chromosome
    and diploid genotypes elsewhere (hipstr_main.cpp:562-579 wiring)."""
    import gzip

    fx = standard_fixture(str(tmp_path))
    out = str(tmp_path / "hap.vcf.gz")
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out,
                     "--haploid-chrs", "chr2", "--use-unpaired",
                     "--quiet"]) == 0
    recs = [ln.split("\t") for ln in
            gzip.decompress(open(out, "rb").read()).decode().splitlines()
            if not ln.startswith("#")]
    assert recs
    saw_hap = saw_dip = False
    for cols in recs:
        gt = cols[9].split(":")[0]
        if cols[0] == "chr2":
            assert "|" not in gt and "/" not in gt, gt
            saw_hap = True
        elif gt != ".":
            assert "|" in gt, gt
            saw_dip = True
    assert saw_hap and saw_dip


def test_optional_format_fields_e2e(tmp_path):
    """--output-gls/--output-pls/--output-phased-gls/--output-filters add
    the GL/PL/PHASEDGL/FILTER FORMAT fields (genotyper.cpp:339-346 flags)."""
    import gzip

    fx = standard_fixture(str(tmp_path))
    out = str(tmp_path / "fmt.vcf.gz")
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out,
                     "--output-gls", "--output-pls", "--output-phased-gls",
                     "--output-filters", "--use-unpaired", "--quiet"]) == 0
    recs = [ln.split("\t") for ln in
            gzip.decompress(open(out, "rb").read()).decode().splitlines()
            if not ln.startswith("#")]
    assert recs
    fmt = recs[0][8].split(":")
    for key in ("GL", "PL", "PHASEDGL", "FILTER"):
        assert key in fmt, fmt
    # and that hiding works symmetrically
    out2 = str(tmp_path / "fmt2.vcf.gz")
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out2,
                     "--hide-allreads", "--hide-mallreads",
                     "--use-unpaired", "--quiet"]) == 0
    recs2 = [ln.split("\t") for ln in
             gzip.decompress(open(out2, "rb").read()).decode().splitlines()
             if not ln.startswith("#")]
    fmt2 = recs2[0][8].split(":")
    assert "ALLREADS" not in fmt2 and "MALLREADS" not in fmt2
    for key in ("GL", "PL", "PHASEDGL", "FILTER"):
        assert key not in fmt2


def test_hifi_indel_error_reads(tmp_path):
    """Reads with realistic indel + substitution errors still genotype
    correctly through trimming, CIGAR expansion, candidate generation and
    the pair-HMM (indels are what the Dindel transition model is for)."""
    from synth import (Locus, add_errors, add_indel_errors, make_genome,
                       sample_haplotype_read, write_bed)
    from longtr_tpu.io.bam import BamRecord
    from longtr_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(77)
    loci = [Locus("chr1", 1000, "AGAT", 10, "L0"),
            Locus("chr1", 2500, "AC", 12, "L1")]
    genome = make_genome(rng, loci, chrom_len=5000)
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, loci)
    gts = {"L0": (10, 13), "L1": (12, 12)}
    recs = []
    for loc in loci:
        for hap in range(2):
            copies = gts[loc.name][hap]
            for k in range(15):
                pos, seq, cigar = sample_haplotype_read(
                    genome, loc, copies, flank=300)
                seq, cigar = add_errors(rng, seq, cigar, sub_rate=0.01)
                seq, cigar = add_indel_errors(rng, seq, cigar, rate=0.01)
                recs.append(BamRecord(
                    name=f"r_{loc.name}_{hap}_{k}", flag=0, ref_id=0,
                    pos=pos, mapq=60, cigar=cigar, mate_ref_id=-1,
                    mate_pos=-1, tlen=0, seq=seq, qual="J" * len(seq),
                    tags={"RG": "rg1", "HP": hap + 1}, ref_name="chr1"))
    recs.sort(key=lambda r: r.pos)
    bam = str(tmp_path / "S1.bam")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
           "@SQ\tSN:chr1\tLN:5000\n"
           "@RG\tID:rg1\tSM:S1\tLB:lib1\n")
    w = BamWriter(bam, hdr, ["chr1"], [5000])
    for rec in recs:
        w.save_alignment(rec)
    w.close()
    build_bai(bam)
    out = str(tmp_path / "calls.vcf.gz")
    assert cli_main(["--bams", bam, "--fasta", fasta, "--regions", bed,
                     "--tr-vcf", out, "--min-reads", "5", "--use-unpaired",
                     "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    got = {}
    while (v := vcf.get_next_variant()) is not None:
        gt = v.genotype("S1")
        assert gt is not None
        lens = sorted(len(v.alleles[a]) for a in gt[:2])
        got[v.pos] = lens
    # L0 at 1000: alleles 40 vs 52bp (+pad); L1 at 2500: 24bp hom (+pad)
    l0 = got[min(got)]
    l1 = got[max(got)]
    assert l0[1] - l0[0] == 12      # 3 extra AGAT copies
    assert l1[0] == l1[1]           # homozygous


def test_misc_cli_gates(tmp_path):
    """--skip-genotyping (no VCF needed), --chrom restriction and the
    --max-reads locus gate."""
    import gzip

    fx = standard_fixture(str(tmp_path))
    base = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--use-unpaired", "--quiet"]

    # --skip-genotyping: runs the read pipeline without a VCF
    pass_bam = str(tmp_path / "pass.bam")
    assert cli_main(base + ["--skip-genotyping", "--pass-bam", pass_bam]) == 0
    assert os.path.getsize(pass_bam) > 0

    # --chrom: only chr2 loci emitted
    out = str(tmp_path / "chr2.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out, "--chrom", "chr2"]) == 0
    recs = [ln for ln in
            gzip.decompress(open(out, "rb").read()).decode().splitlines()
            if not ln.startswith("#")]
    assert recs and all(r.split("\t")[0] == "chr2" for r in recs)

    # --min-reads above coverage: every locus rejected for too few reads
    # (the too-many gate counts paired reads only, exactly like the
    # reference bam_processor.cpp:217, so it cannot trip on unpaired data)
    out2 = str(tmp_path / "toofew.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out2, "--min-reads", "1000"]) == 0
    recs2 = [ln for ln in
             gzip.decompress(open(out2, "rb").read()).decode().splitlines()
             if not ln.startswith("#")]
    assert recs2 == []


def test_paired_end_reads_e2e(tmp_path):
    """Paired spanning mates (no --use-unpaired): mate pairing in the
    filter (bam_processor.cpp:323-345) and the weight-0 second-mate rule
    in the genotyper (seq_stutter_genotyper.cpp:484-506)."""
    from synth import Locus, make_genome, sample_haplotype_read, write_bed
    from longtr_tpu.io.bam import BamRecord
    from longtr_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(88)
    loc = Locus("chr1", 1000, "AGAT", 10, "L0")
    genome = make_genome(rng, [loc], chrom_len=4000)
    fasta = str(tmp_path / "g.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "r.bed")
    write_bed(bed, [loc])
    recs = []
    for hap, copies in ((0, 10), (1, 13)):
        for k in range(12):
            name = f"tmpl_{hap}_{k}"
            pos1, seq1, cig1 = sample_haplotype_read(genome, loc, copies,
                                                     flank=300)
            pos2, seq2, cig2 = sample_haplotype_read(genome, loc, copies,
                                                     flank=250)
            seq2 = seq2[:len(seq2) - 50]
            cig2 = [("M", len(seq2))] if len(cig2) == 1 else cig2
            # trim the tail op to keep the CIGAR consistent
            total = sum(n for op, n in cig2 if op in "MIS=X")
            if total != len(seq2):
                op, n = cig2[-1]
                cig2[-1] = (op, n - (total - len(seq2)))
            flags1 = 0x1 | 0x40   # paired, first mate
            flags2 = 0x1 | 0x80   # paired, second mate
            recs.append(BamRecord(name=name, flag=flags1, ref_id=0, pos=pos1,
                                  mapq=60, cigar=cig1, mate_ref_id=0,
                                  mate_pos=pos2, tlen=0, seq=seq1,
                                  qual="J" * len(seq1), tags={"RG": "rg1"},
                                  ref_name="chr1", mate_ref_name="chr1"))
            recs.append(BamRecord(name=name, flag=flags2, ref_id=0, pos=pos2,
                                  mapq=60, cigar=cig2, mate_ref_id=0,
                                  mate_pos=pos1, tlen=0, seq=seq2,
                                  qual="J" * len(seq2), tags={"RG": "rg1"},
                                  ref_name="chr1", mate_ref_name="chr1"))
    recs.sort(key=lambda r: r.pos)
    bam = str(tmp_path / "S1.bam")
    hdr = ("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:4000\n"
           "@RG\tID:rg1\tSM:S1\tLB:lib1\n")
    w = BamWriter(bam, hdr, ["chr1"], [4000])
    for rec in recs:
        w.save_alignment(rec)
    w.close()
    build_bai(bam)
    out = str(tmp_path / "calls.vcf.gz")
    assert cli_main(["--bams", bam, "--fasta", fasta, "--regions", bed,
                     "--tr-vcf", out, "--min-reads", "5", "--quiet"]) == 0
    vcf = VCFReader(out)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    gt = v.genotype("S1")
    assert gt is not None
    lens = sorted(len(v.alleles[a]) for a in gt[:2])
    assert lens[1] - lens[0] == 12   # 3 extra AGAT copies
    assert int(v.get_info("DP")) >= 20   # paired reads were used

"""DenovoFinder tests on synthetic trio VCFs with known mutation status."""

import math

import numpy as np
import pytest

from longtr_tpu.io.bgzf import BgzfWriter
from longtr_tpu.io.vcf import VCFReader


def write_trio_str_vcf(path, gts, gl_field="GL", num_alleles=3):
    """One STR record; gts maps sample -> (a, b). GLs strongly favor the GT."""
    samples = ["MOM", "DAD", "KID"]
    A = num_alleles

    def gl_string(a, b):
        vals = []
        for i in range(A):
            for j in range(i + 1):
                vals.append(0.0 if {i, j} == {a, b} or
                            (i == j == a == b) else -8.0)
        return ",".join(f"{v:.2f}" for v in vals)

    def pgl_string(a, b):
        vals = []
        for i in range(A):
            for j in range(A):
                vals.append(0.0 if (i, j) in ((a, b), (b, a)) else -8.0)
        return ",".join(f"{v:.2f}" for v in vals)

    alleles = ["ACACAC", "ACAC", "ACACACAC"][:A]
    header = ("##fileformat=VCFv4.1\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
              + "\t".join(samples) + "\n")
    info = "START=1001;END=1006;PERIOD=2;BPDIFFS=" + \
        ",".join(str(len(a) - len(alleles[0])) for a in alleles[1:])
    fmt = "GT:" + gl_field
    cols = []
    for s in samples:
        a, b = gts[s]
        g = gl_string(a, b) if gl_field == "GL" else pgl_string(a, b)
        sep = "|" if gl_field == "PHASEDGL" else "/"
        cols.append(f"{a}{sep}{b}:{g}")
    rec = ("chr1\t1001\tSTR1\t" + alleles[0] + "\t" + ",".join(alleles[1:])
           + "\t.\t.\t" + info + "\t" + fmt + "\t" + "\t".join(cols) + "\n")
    w = BgzfWriter(path)
    w.write(header + rec)
    w.close()


def write_fam(path):
    with open(path, "w") as fh:
        fh.write("FAM1\tKID\tDAD\tMOM\n")
    return str(path)


def run_trio(tmp_path, gts):
    str_vcf = str(tmp_path / "str.vcf.gz")
    out_vcf = str(tmp_path / "denovo.vcf.gz")
    write_trio_str_vcf(str_vcf, gts)
    fam = write_fam(tmp_path / "trio.fam")
    from longtr_tpu.denovo.cli import main
    assert main(["--fam", fam, "--str-vcf", str_vcf, "--denovo-vcf", out_vcf,
                 "--uniform-prior", "--log", str(tmp_path / "log.txt")]) == 0
    vcf = VCFReader(out_vcf)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    nomut, denovo, other = (float(x) for x in
                            v.samples["KID"][: 3])
    return nomut, denovo, other


def test_trio_consistent_inheritance(tmp_path):
    # KID carries one allele from each parent -> no mutation strongly favored
    # over de novo.
    nomut, denovo, other = run_trio(tmp_path, {
        "MOM": (0, 1), "DAD": (0, 0), "KID": (0, 1)})
    assert nomut > denovo + 3
    # "other" (mutation to an allele already in a parent) can coincide with
    # the inherited genotype, AND the reference's hybrid-base streaming LSE
    # (mathops.cpp:73-85: natural exp/log over log10 terms) inflates the
    # many-term OTHER sum more than the NOMUT sum — the compiled reference
    # emits OTHER (-1.423) > NOMUT (-1.514) on this very input
    # (execution-proven: test_denovo_parity.py::test_trio_directed_byte_identical
    # is byte-identical against src/denovos/trio_denovo_scanner.cpp here).
    assert other > nomut > other - 1


def test_trio_denovo_mutation(tmp_path):
    # KID carries allele 2 absent from both parents -> de novo favored
    nomut, denovo, other = run_trio(tmp_path, {
        "MOM": (0, 1), "DAD": (0, 1), "KID": (0, 2)})
    assert denovo > nomut + 3
    assert denovo > other + 1


def test_trio_other_mutation(tmp_path):
    # KID homozygous 1 while DAD can only donate 0 -> "other" mutation
    # (mutated allele present in a parent)
    nomut, denovo, other = run_trio(tmp_path, {
        "MOM": (1, 1), "DAD": (0, 0), "KID": (1, 1)})
    assert other > nomut + 3
    assert other > denovo + 1


def test_joint_scanner_with_snp_transmission(tmp_path):
    """Family-joint mode: phased GLs + SNP haplotype transmission."""
    str_vcf = str(tmp_path / "str.vcf.gz")
    out_vcf = str(tmp_path / "denovo.vcf.gz")
    write_trio_str_vcf(str_vcf, {"MOM": (0, 1), "DAD": (0, 0), "KID": (1, 0)},
                       gl_field="PHASEDGL")
    fam = write_fam(tmp_path / "trio.fam")
    # SNP VCF: KID hap1 matches MOM hap2 (carrying allele 1), hap2 matches DAD
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tMOM\tDAD\tKID"]
    # Need enough informative SNPs that every *wrong* child-parent pairing
    # has distance >= MIN_SECOND_BEST_SCORE=100 (denovo_scanner.h:18).
    rng = np.random.default_rng(3)
    pos = 500
    for _ in range(600):
        pos += int(rng.integers(30, 80))
        mom = (0, 1)
        dad = (int(rng.integers(2)), int(rng.integers(2)))
        kid = (mom[1], dad[0])
        lines.append(f"chr1\t{pos}\tsnp{pos}\tA\tG\t.\t.\t.\tGT\t"
                     f"{mom[0]}|{mom[1]}\t{dad[0]}|{dad[1]}\t{kid[0]}|{kid[1]}")
    snp_vcf = str(tmp_path / "snps.vcf.gz")
    w = BgzfWriter(snp_vcf)
    w.write("\n".join(lines) + "\n")
    w.close()

    from longtr_tpu.denovo.cli import main
    assert main(["--fam", fam, "--str-vcf", str_vcf, "--denovo-vcf", out_vcf,
                 "--snp-vcf", snp_vcf, "--uniform-prior",
                 "--log", str(tmp_path / "log.txt")]) == 0
    vcf = VCFReader(out_vcf)
    vcf.set_region("chr1", 0)
    v = vcf.get_next_variant()
    assert v is not None
    fields = v.samples["FAM1"]
    assert fields[0] == "KID"
    nomut = float(fields[1])
    denovo = float(fields[3])
    # Inheritance is consistent -> no mutation favored
    assert nomut > denovo + 3


def test_full_chain_longtr_to_denovofinder(tmp_path):
    """longtr --output-gls output feeds denovofinder directly."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import standard_fixture

    from longtr_tpu.cli import main as longtr_main
    from longtr_tpu.denovo.cli import main as denovo_main

    fx = standard_fixture(str(tmp_path))
    calls = str(tmp_path / "calls.vcf.gz")
    assert longtr_main(["--bams", ",".join(fx["bams"]), "--fasta",
                        fx["fasta"], "--regions", fx["bed"],
                        "--tr-vcf", calls, "--output-gls",
                        "--use-unpaired", "--quiet"]) == 0
    fam = str(tmp_path / "trio.fam")
    with open(fam, "w") as fh:
        fh.write("FAM1\tSAMP1\tSAMP2\tSAMP3\n")
    out = str(tmp_path / "denovo.vcf.gz")
    assert denovo_main(["--fam", fam, "--str-vcf", calls,
                        "--denovo-vcf", out, "--uniform-prior",
                        "--log", str(tmp_path / "log.txt")]) == 0
    vcf = VCFReader(out)
    n = 0
    for chrom in ("chr1", "chr2", "chr3"):
        vcf.set_region(chrom, 0)
        while (v := vcf.get_next_variant()) is not None:
            vals = v.samples.get("SAMP1")
            assert vals is not None
            if vals[0] != ".":   # untestable loci emit missing, like upstream
                assert float(vals[0]) <= 0.0   # a valid log10 likelihood
                n += 1
    assert n >= 1  # at least one locus produced a testable trio record

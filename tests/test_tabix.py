"""Tabix (.tbi) indexed VCF streaming: lazy reader equals eager reader,
and the full pipeline accepts an indexed SNP VCF (the reference streams
these through htslib tabix; vcf_reader.h:22-120)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from synth import standard_fixture  # noqa: E402
from test_snp_phasing import write_snp_vcf  # noqa: E402

from longtr_tpu.io.tabix import TbiIndex, build_tbi  # noqa: E402
from longtr_tpu.io.vcf import VCFReader  # noqa: E402


def _fixture(tmp_path):
    rng = np.random.default_rng(11)
    fx = standard_fixture(str(tmp_path), rng=rng)
    snp = str(tmp_path / "snps.vcf.gz")
    write_snp_vcf(snp, fx["genome"], ["SAMP1", "SAMP2", "SAMP3"], rng)
    return fx, snp


def test_lazy_reader_matches_eager(tmp_path):
    fx, snp = _fixture(tmp_path)
    eager = VCFReader(snp)
    build_tbi(snp)
    lazy = VCFReader(snp)
    assert lazy._tbi is not None and eager._tbi is None
    assert lazy.get_samples() == eager.get_samples()
    assert lazy.has_chromosome("chr1") and not lazy.has_chromosome("chrX")
    for start, end in ((0, None), (500, 1200), (1500, 1501), (2900, 4000),
                       (99999, None)):
        eager.set_region("chr1", start, end)
        lazy.set_region("chr1", start, end)
        a, b = [], []
        while (v := eager.get_next_variant()) is not None:
            a.append((v.pos, v.alleles[0], v.samples["SAMP1"]))
        while (v := lazy.get_next_variant()) is not None:
            b.append((v.pos, v.alleles[0], v.samples["SAMP1"]))
        assert a == b, (start, end)
    # abandoning an iterator mid-stream must not corrupt the next query
    lazy.set_region("chr1", 500, 1200)
    lazy.get_next_variant()
    lazy.set_region("chr1", 0, None)
    n = 0
    while lazy.get_next_variant() is not None:
        n += 1
    eager.set_region("chr1", 0, None)
    m = 0
    while eager.get_next_variant() is not None:
        m += 1
    assert n == m


def test_index_round_trip_structure(tmp_path):
    _fx, snp = _fixture(tmp_path)
    path = build_tbi(snp)
    idx = TbiIndex(path)
    assert idx.names == ["chr1"]
    assert idx.chunks_for(idx.ref_id("chr1"), 0, 1 << 29)
    assert idx.chunks_for(idx.ref_id("chr1"), 10_000_000, 10_000_001) == []


def test_e2e_with_indexed_snp_vcf(tmp_path):
    """Pipeline output with a .tbi-indexed SNP VCF equals the unindexed run."""
    import gzip

    from longtr_tpu.cli import main as cli_main

    fx, snp = _fixture(tmp_path)
    base = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--min-reads", "5",
            "--snp-vcf", snp, "--quiet"]
    out1 = str(tmp_path / "eager.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out1]) == 0
    build_tbi(snp)
    out2 = str(tmp_path / "lazy.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out2]) == 0

    def body(p):
        return [ln for ln in
                gzip.decompress(open(p, "rb").read()).decode().splitlines()
                if not ln.startswith("##command")]

    assert body(out1) == body(out2)

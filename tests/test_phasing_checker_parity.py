"""PhasingChecker parity against the compiled reference.

Drives the full `phasingchecker` CLI and diffs its bgzf-decompressed table
against the compiled check_phasing.cpp flow (ro_check_phasing: real
HaplotypeTracker + DiploidEditDistance + pedigree + readRegions, the
post-arg main body of /root/reference/src/check_phasing.cpp:129-226).
"""

import gzip
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ref_oracle import check_phasing, get_lib  # noqa: E402
from test_denovo_parity import (_write_both, synth_families,  # noqa: E402
                                synth_snp_vcf)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="reference oracle unavailable")


def run_pair(tmp_path, tag, famlines, snp_text, bed_text):
    fam = str(tmp_path / f"{tag}.fam")
    with open(fam, "w") as fh:
        fh.write("\n".join(famlines) + "\n")
    snp_gz = str(tmp_path / f"{tag}_snp.vcf.gz")
    snp_plain = str(tmp_path / f"{tag}_snp.vcf")
    _write_both(snp_text, snp_gz, snp_plain)
    bed = str(tmp_path / f"{tag}.bed")
    with open(bed, "w") as fh:
        fh.write(bed_text)

    out_ours = str(tmp_path / f"{tag}_ours.txt.gz")
    from longtr_tpu.denovo.phasing_checker import main
    assert main(["--fam", fam, "--snp-vcf", snp_gz, "--regions", bed,
                 "--out", out_ours]) == 0
    ours = gzip.open(out_ours, "rb").read().decode()

    out_ref = str(tmp_path / f"{tag}_ref.txt")
    check_phasing(fam, snp_plain, bed, out_ref)
    ref = open(out_ref).read()
    return ours, ref


def _cohort(seed):
    rng = np.random.default_rng(seed)
    famlines, samples, fams = synth_families(rng, max_fams=3, max_kids=3)
    n_snps = int(rng.integers(150, 800))
    snp_text, last = synth_snp_vcf(rng, samples, fams, n_snps=n_snps)
    # region BED spanning the SNP window: mix of 4- and 5-column rows,
    # deliberately UNSORTED (both sides orderRegions)
    rows = []
    for r in range(int(rng.integers(2, 9))):
        start = int(rng.integers(200, max(last, 400)))
        stop = start + int(rng.integers(10, 60))
        row = f"chr1\t{start}\t{stop}\tAC"
        if rng.random() < 0.5:
            row += f"\tL{r}"
        rows.append(row)
    rng.shuffle(rows)
    return famlines, snp_text, "\n".join(rows) + "\n"


@pytest.mark.parametrize("seed", range(8))
def test_phasing_checker_byte_identical(tmp_path, seed):
    famlines, snp_text, bed_text = _cohort(300 + seed)
    ours, ref = run_pair(tmp_path, f"p{seed}", famlines, snp_text, bed_text)
    assert ours == ref
    # cohorts must actually exercise the distance table
    assert any("PASS" in l or "FAIL" in l for l in ref.splitlines()[1:])


def test_phasing_checker_mixed_pass_fail(tmp_path):
    """A consistent trio (PASS expected away from SNP gaps) and a random
    family in one run: both verdict branches exercised and byte-identical."""
    rng = np.random.default_rng(909)
    famlines = ["FAM0\tK0_0\tD0\tM0", "FAM1\tK1_0\tD1\tM1"]
    fams = [("FAM0", ["K0_0"], "M0", "D0"), ("FAM1", ["K1_0"], "M1", "D1")]
    samples = ["M0", "D0", "K0_0", "M1", "D1", "K1_0"]
    snp_text, last = synth_snp_vcf(rng, samples, fams, n_snps=600)
    # defeat inference for FAM1 by shuffling its child's genotypes
    lines = snp_text.splitlines()
    out_lines = lines[:2]
    for l in lines[2:]:
        cols = l.split("\t")
        if rng.random() < 0.5:
            cols[-1] = f"{int(rng.integers(2))}|{int(rng.integers(2))}"
        out_lines.append("\t".join(cols))
    snp_text = "\n".join(out_lines) + "\n"
    bed_text = "".join(f"chr1\t{p}\t{p + 20}\tAC\tR{p}\n"
                       for p in range(500, last, max(1, last // 6)))
    ours, ref = run_pair(tmp_path, "mix", famlines, snp_text, bed_text)
    assert ours == ref
    body = "\n".join(ref.splitlines()[1:])
    assert "PASS" in body and "FAIL" in body

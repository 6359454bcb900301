"""Record-level parity on the reference's OWN bundled real-data fixture.

The HG002/HG003/HG004 HiFi trio (40 loci, /root/reference/test_data, the
option set of its job.sh) is the strongest record-parity evidence available
in this environment: real 10-25kb reads, real base qualities, real HP
phasing tags, a 2.9kb VNTR, and rescue-path loci.  The production CLI runs
in fidelity mode with genotyper-construction capture and every written
record is replayed through the compiled reference emission chain
(seq_stutter_genotyper.cpp:883-1402) and compared byte for byte — the
closest this snapshot can get to BASELINE's "bit-identical tr_calls.vcf.gz
on test_data" (the reference binary itself is unbuildable here: htslib/spoa
are Makefile network clones).

~75s: the dominant cost is the compiled reference re-genotyping real HiFi
loci.  A faster 6-locus e2e slice lives in test_real_data.py.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

import tests.ref_oracle as ro  # noqa: E402

TEST_DATA = "/root/reference/test_data"

pytestmark = [
    pytest.mark.skipif(ro.get_lib() is None,
                       reason="reference oracle unavailable"),
    pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                       reason="bundled trio data unavailable"),
    pytest.mark.slow,
]


def test_real_trio_all_records_byte_identical(tmp_path, monkeypatch):
    from real_data_smoke import reconstruct_reference

    from longtr_tpu.io.fasta import write_fasta
    from test_pipeline_record_parity import _run_and_compare

    bams = [os.path.join(TEST_DATA, f"HG00{i}_sample_reads.bam")
            for i in (2, 3, 4)]
    bed_in = os.path.join(TEST_DATA, "test_regions_hg38.bed")
    with open(bed_in) as fh:
        lines = fh.readlines()
    loci = [(f[0], int(f[1]), int(f[2])) for f in (l.split() for l in lines)]
    assert len(loci) == 40

    # the snapshot lacks hg38; reconstruct the reference over each window by
    # pileup majority vote (benchmarks/real_data_smoke.py:21) — both sides
    # see the same estimate, so parity is unaffected
    genome = reconstruct_reference(bams, loci, None)
    fasta = str(tmp_path / "est_ref.fa")
    write_fasta(fasta, genome)
    bed = str(tmp_path / "regions.bed")
    with open(bed, "w") as fh:
        fh.writelines(lines)

    skip_log = []
    n = _run_and_compare(
        tmp_path, monkeypatch, bams, fasta, bed,
        extra_args=["--bam-samps", "HG002,HG003,HG004",
                    "--bam-libs", "HG002,HG003,HG004",
                    "--max-tr-len", "10000",
                    "--skip-assembly", "--phased-bam"],
        skip_log=skip_log)
    # the bundled fixture produces 38 records (2 loci emit none on both
    # sides); every one must have been byte-checked, none spoa-skipped
    assert n == 38, (n, skip_log)
    assert not skip_log, skip_log

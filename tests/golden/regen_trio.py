"""Regenerate tests/golden/trio_fidelity.vcf.gz (the committed golden).

BASELINE's acceptance artifact is "bit-identical tr_calls.vcf.gz on
test_data" (/root/reference/test_data/job.sh).  The golden file is the
production CLI's fidelity-mode output on the bundled HG002/3/4 trio
(full 40-locus BED, job.sh option set), with the two volatile header
lines (##command=, ##reference= — they embed temp paths) replaced by
fixed placeholders.  `tests/test_golden_trio.py` byte-compares fresh
runs against it in seconds, without the compiled oracle.

Regeneration POLICY: the golden may only be refreshed from a tree where
the slow oracle audit passes — this script therefore runs
`pytest tests/test_real_trio_record_parity.py` FIRST (the compiled
reference replays every emitted record byte-for-byte) and refuses to
write the golden if it fails.  `--no-verify` skips that step for local
experimentation only; never commit a golden produced with it.

Usage: python tests/golden/regen_trio.py [--no-verify]
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "trio_fidelity.vcf.gz")

COMMAND_PLACEHOLDER = "##command=<normalized: see tests/golden/regen_trio.py>"
REFERENCE_PLACEHOLDER = "##reference=<normalized: pileup-estimated hg38 windows>"


def normalize(lines):
    """Replace the volatile header lines with fixed placeholders."""
    out = []
    for ln in lines:
        if ln.startswith("##command="):
            out.append(COMMAND_PLACEHOLDER + "\n")
        elif ln.startswith("##reference="):
            out.append(REFERENCE_PLACEHOLDER + "\n")
        else:
            out.append(ln if ln.endswith("\n") else ln + "\n")
    return out


def generate_trio_fidelity_vcf(tmpdir):
    """Run the production CLI (fidelity mode, job.sh option set) on the
    bundled trio; returns the normalized decompressed VCF text.  The
    fixture and option set come from the ONE shared definition
    (benchmarks/real_data_smoke.py: build_trio_fixture + TRIO_ARGS)."""
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from real_data_smoke import TRIO_ARGS, build_trio_fixture

    from longtr_tpu.cli import main as cli_main
    from longtr_tpu.io.bgzf import bgzf_open_text

    bams, fasta, bed = build_trio_fixture(tmpdir)
    out = os.path.join(tmpdir, "trio_fid.vcf.gz")
    rc = cli_main(["--bams", ",".join(bams), "--fasta", fasta,
                   "--regions", bed, "--tr-vcf", out,
                   "--min-reads", "5", "--quiet", "--ref-fidelity"]
                  + TRIO_ARGS)
    assert rc == 0, f"CLI failed rc={rc}"
    return "".join(normalize(list(bgzf_open_text(out))))


def main():
    if "--no-verify" not in sys.argv:
        print("running the oracle audit (test_real_trio_record_parity, "
              "~75s) before touching the golden...", flush=True)
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             os.path.join(REPO, "tests", "test_real_trio_record_parity.py")],
            cwd=REPO).returncode
        if rc != 0:
            print("ORACLE AUDIT FAILED — golden NOT regenerated", flush=True)
            return 1

    import jax
    jax.config.update("jax_platforms", "cpu")
    from longtr_tpu.io.bgzf import BgzfWriter
    with tempfile.TemporaryDirectory() as tmpdir:
        text = generate_trio_fidelity_vcf(tmpdir)
    w = BgzfWriter(GOLDEN)
    w.write(text.encode())
    w.close()
    n_rec = sum(1 for ln in text.splitlines() if not ln.startswith("#"))
    print(f"wrote {GOLDEN}: {len(text)} bytes, {n_rec} records", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

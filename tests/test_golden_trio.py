"""Fast byte-gate against the committed golden trio VCF (VERDICT r4 #3).

BASELINE's acceptance artifact is "bit-identical tr_calls.vcf.gz on
test_data" (/root/reference/test_data/job.sh).  The slow oracle test
(`test_real_trio_record_parity.py`, ~75s) replays every record through the
compiled reference; this test pins the SAME output against a committed
golden file in seconds, with no oracle build — so any regression in the
full production chain (IO → filters → genotyper → VCF emission) on real
HiFi data surfaces immediately, and the inspectable artifact the
acceptance criterion asks for lives in the tree
(tests/golden/trio_fidelity.vcf.gz).

The golden is regenerated ONLY via tests/golden/regen_trio.py, which
refuses to write it unless the oracle audit passes first.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from golden.regen_trio import (GOLDEN, generate_trio_fidelity_vcf,  # noqa: E402
                               normalize)

TEST_DATA = "/root/reference/test_data"

pytestmark = pytest.mark.skipif(not os.path.isdir(TEST_DATA),
                                reason="bundled trio data unavailable")


def test_trio_fidelity_output_matches_committed_golden(tmp_path):
    from longtr_tpu.io.bgzf import bgzf_open_text

    assert os.path.exists(GOLDEN), (
        "golden missing — run tests/golden/regen_trio.py")
    want = "".join(normalize(list(bgzf_open_text(GOLDEN))))
    got = generate_trio_fidelity_vcf(str(tmp_path))
    # byte-compare the normalized decompressed text (the two ##command=/
    # ##reference= header lines embed temp paths and are placeholdered on
    # both sides; every other byte, header included, must match)
    assert got == want, "trio fidelity VCF drifted from committed golden"
    n_rec = sum(1 for ln in got.splitlines() if not ln.startswith("#"))
    assert n_rec == 38

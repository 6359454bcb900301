"""BamAlignment::TrimAlignment parity vs the compiled reference
(bam_io.cpp:267-372 via the trim oracle, tests/ref_oracle/libref_trim.so).

The read-trimming CIGAR surgery that precedes left-alignment — boundary
walks on both ends, run splitting, whole-repeat-deletion detection — is the
last piece of bam_io the main oracle could not reach (htslib-backed file);
the trim oracle compiles bam_io.cpp in place against stub htslib headers
and this suite fuzzes our run-level transcription against it.
"""

import types

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.io.bam import BamRecord
from longtr_tpu.pipeline.alignment import FLANK_SIZE

pytestmark = pytest.mark.skipif(ro.get_trim_lib() is None,
                                reason="trim oracle unavailable")

BASES = "ACGT"


def our_trim(seq, quals, cigar, pos, end_pos, lo, hi):
    rec = types.SimpleNamespace(seq=seq, qual=quals, cigar=list(cigar),
                                pos=pos, end_pos=end_pos, deleted=False)
    BamRecord.trim_alignment(rec, lo, hi)
    return dict(pos=rec.pos, end_pos=rec.end_pos, seq=rec.seq,
                quals=rec.qual, cigar=list(rec.cigar), deleted=rec.deleted,
                length=len(rec.seq))


def random_aligned_read(rng, pos):
    ops = []
    if rng.random() < 0.3:
        ops.append(("H", int(rng.integers(1, 6))))
    if rng.random() < 0.4:
        ops.append(("S", int(rng.integers(1, 15))))
    ops.append(("=", int(rng.integers(30, 200))))
    for _ in range(int(rng.integers(0, 8))):
        kind = str(rng.choice(["=", "X", "I", "D"]))
        ops.append((kind, int(rng.integers(1, 30))))
        if kind in "ID":
            ops.append(("=", int(rng.integers(1, 60))))
    if rng.random() < 0.4:
        ops.append(("S", int(rng.integers(1, 15))))
    if rng.random() < 0.2:
        ops.append(("H", int(rng.integers(1, 6))))
    merged = []
    for op, n in ops:
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + n)
        else:
            merged.append((op, n))
    read_len = sum(n for op, n in merged if op not in "DH")
    ref_span = sum(n for op, n in merged if op in "M=XD")
    seq = "".join(rng.choice(list(BASES), size=read_len))
    quals = "".join(chr(33 + int(q)) for q in rng.integers(5, 41, read_len))
    return seq, quals, merged, pos, pos + ref_span


def test_trim_alignment_fuzz_matches_reference():
    for trial in range(300):
        rng = np.random.default_rng(9000 + trial)
        pos = int(rng.integers(0, 2000))
        seq, quals, cigar, pos, end_pos = random_aligned_read(rng, pos)
        # left_align_reads calls with (region_start - FLANK_SIZE, clamped
        # to 1) .. region_stop + FLANK_SIZE (genotyper_bam_processor.cpp:61)
        mid = int(rng.integers(pos - 50, end_pos + 50))
        width = int(rng.integers(0, 120))
        region_start = mid
        region_stop = mid + width
        lo = region_start - FLANK_SIZE if region_start > FLANK_SIZE else 1
        hi = region_stop + FLANK_SIZE
        want = ro.trim_alignment(seq, quals, cigar, pos, end_pos, lo, hi)
        got = our_trim(seq, quals, cigar, pos, end_pos, lo, hi)
        for key in ("pos", "end_pos", "seq", "quals", "cigar", "deleted",
                    "length"):
            assert want[key] == got[key], (trial, key, want, got)


def test_trim_alignment_whole_repeat_deletion():
    """A deletion spanning the entire repeat body must set `deleted` in
    both implementations (the <DEL> allele trigger)."""
    rng = np.random.default_rng(77)
    for trial in range(40):
        flank = 250
        rep_len = int(rng.integers(5, 40))
        region_start = 1000
        region_stop = region_start + rep_len
        # read: matches up to the repeat, deletes it entirely, matches after
        pre = int(rng.integers(30, flank))
        post = int(rng.integers(30, flank))
        extra_del = int(rng.integers(0, 8))
        cigar = [("=", pre), ("D", rep_len + extra_del), ("=", post)]
        pos = region_start - pre - (extra_del if rng.random() < 0.5 else 0)
        ref_span = pre + rep_len + extra_del + post
        read_len = pre + post
        seq = "".join(rng.choice(list(BASES), size=read_len))
        quals = "I" * read_len
        lo = region_start - FLANK_SIZE
        hi = region_stop + FLANK_SIZE
        want = ro.trim_alignment(seq, quals, cigar, pos, pos + ref_span,
                                 lo, hi)
        got = our_trim(seq, quals, cigar, pos, pos + ref_span, lo, hi)
        assert want == {**got, "length": got["length"]}, trial
        assert want["deleted"] == got["deleted"]

"""Property tests: run-level CIGAR trimming equals the per-base originals.

The production implementations (BamRecord.trim_alignment,
trim_read_for_hapalign) use run-level arithmetic; these oracles are the
original base-at-a-time walks, which are themselves transcriptions of the
reference C++ (bam_io.cpp:267-372, HapAligner.cpp:346-465)."""

import numpy as np

from longtr_tpu.io.bam import FLANK_SIZE, BamRecord
from longtr_tpu.pipeline.seq_genotyper import trim_read_for_hapalign


def oracle_trim_alignment(rec, min_read_start, max_read_stop):
    cigar = [list(c) for c in rec.cigar]
    ltrim = 0
    start_pos = rec.pos
    while start_pos < min_read_start and cigar:
        op = cigar[0][0]
        if op in "M=X":
            ltrim += 1
            start_pos += 1
        elif op == "D":
            start_pos += 1
        elif op in "IS":
            ltrim += 1
        elif op == "H":
            pass
        if cigar[0][1] == 1:
            cigar.pop(0)
        else:
            cigar[0][1] -= 1
    repeat_pointer = start_pos
    repeat_start = min_read_start + FLANK_SIZE
    repeat_end = max_read_stop - FLANK_SIZE
    deletion_size = 0
    tmp = [list(c) for c in cigar]
    while (repeat_pointer >= min_read_start and repeat_pointer < repeat_end
           and tmp):
        op = tmp[0][0]
        if op in "M=X":
            repeat_pointer += 1
        elif op == "D":
            if repeat_pointer >= repeat_start:
                deletion_size += 1
            repeat_pointer += 1
        if tmp[0][1] == 1:
            tmp.pop(0)
        else:
            tmp[0][1] -= 1
    deleted = deletion_size >= (repeat_end - repeat_start)
    rtrim = 0
    end_pos = rec.end_pos
    while end_pos > max_read_stop and cigar:
        op = cigar[-1][0]
        if op in "M=X":
            rtrim += 1
            end_pos -= 1
        elif op == "D":
            end_pos -= 1
        elif op in "IS":
            rtrim += 1
        elif op == "H":
            pass
        if cigar[-1][1] == 1:
            cigar.pop()
        else:
            cigar[-1][1] -= 1
    seq = rec.seq[ltrim: len(rec.seq) - rtrim]
    return (seq, start_pos, end_pos, [tuple(c) for c in cigar], deleted)


def oracle_trim_read_for_hapalign(aln, repeat_start, repeat_end,
                                  indel_flank_len):
    padding = indel_flank_len
    min_read_start = repeat_start - padding
    max_read_stop = repeat_end + padding
    start_pos = aln.start + 1
    end_pos = aln.stop + 1
    ltrim = rtrim = 0
    cigar = [list(c) for c in aln.cigar]

    def pop_front():
        if cigar[0][1] == 1:
            cigar.pop(0)
        else:
            cigar[0][1] -= 1

    def pop_back():
        if cigar[-1][1] == 1:
            cigar.pop()
        else:
            cigar[-1][1] -= 1

    while start_pos <= min_read_start and cigar:
        op = cigar[0][0]
        if op in "M=X":
            ltrim += 1
            start_pos += 1
        elif op == "D":
            start_pos += 1
        elif op in "IS":
            ltrim += 1
        pop_front()
    mid = start_pos
    while mid > min_read_start and mid <= min_read_start + padding and cigar:
        op = cigar[0][0]
        if op in "M=X":
            mid += 1
        elif op == "D":
            ltrim -= 1
            mid += 1
        pop_front()
    while end_pos > max_read_stop and cigar:
        op = cigar[-1][0]
        if op in "M=X":
            rtrim += 1
            end_pos -= 1
        elif op == "D":
            end_pos -= 1
        elif op in "IS":
            rtrim += 1
        pop_back()
    mid = end_pos
    while mid > max_read_stop - padding and mid <= max_read_stop and cigar:
        op = cigar[-1][0]
        if op in "M=X":
            mid -= 1
        elif op == "D":
            rtrim -= 1
            mid -= 1
        pop_back()
    ltrim = max(ltrim, 0)
    rtrim = max(rtrim, 0)
    seq = aln.sequence
    return seq[ltrim: len(seq) - rtrim]


class _Aln:
    def __init__(self, start, cigar, sequence):
        self.start = start
        self.stop = start + sum(n for op, n in cigar if op in "M=XD") - 1
        self.cigar = cigar
        self.sequence = sequence


def _random_cigar(rng, want_hard=False):
    ops = []
    if want_hard and rng.random() < 0.5:
        ops.append(("H", int(rng.integers(1, 5))))
    if rng.random() < 0.4:
        ops.append(("S", int(rng.integers(1, 8))))
    prev = None
    for _ in range(int(rng.integers(1, 8))):
        op = str(rng.choice(["M", "=", "X", "I", "D"]))
        if op == prev or (prev in ("I", "D") and op in ("I", "D")):
            op = "M"
        ops.append((op, int(rng.integers(1, 40))))
        prev = op
    if ops[-1][0] in ("I", "D"):
        ops.append(("M", int(rng.integers(1, 20))))
    if rng.random() < 0.4:
        ops.append(("S", int(rng.integers(1, 8))))
    if want_hard and rng.random() < 0.5:
        ops.append(("H", int(rng.integers(1, 5))))
    return ops


def test_trim_alignment_matches_oracle():
    rng = np.random.default_rng(13)
    for trial in range(400):
        cigar = _random_cigar(rng, want_hard=True)
        read_len = sum(n for op, n in cigar if op in "M=XIS")
        pos = int(rng.integers(0, 300))
        rec = BamRecord(name="r", flag=0, ref_id=0, pos=pos, mapq=60,
                        cigar=list(cigar), mate_ref_id=-1, mate_pos=-1,
                        tlen=0, seq="A" * read_len, qual="J" * read_len,
                        tags={}, ref_name="chr1")
        lo = int(rng.integers(0, 400))
        hi = lo + int(rng.integers(2 * FLANK_SIZE + 1, 2 * FLANK_SIZE + 300))
        want = oracle_trim_alignment(rec, lo, hi)
        rec2 = BamRecord(name="r", flag=0, ref_id=0, pos=pos, mapq=60,
                         cigar=list(cigar), mate_ref_id=-1, mate_pos=-1,
                         tlen=0, seq="A" * read_len, qual="J" * read_len,
                         tags={}, ref_name="chr1")
        rec2.trim_alignment(lo, hi)
        got = (rec2.seq, rec2.pos, rec2.end_pos, rec2.cigar, rec2.deleted)
        assert got == want, (trial, cigar, pos, lo, hi, got, want)


def test_trim_read_for_hapalign_matches_oracle():
    rng = np.random.default_rng(14)
    for trial in range(400):
        cigar = [(op, n) for op, n in _random_cigar(rng) if op != "H"]
        read_len = sum(n for op, n in cigar if op in "M=XIS")
        start = int(rng.integers(0, 200))
        aln = _Aln(start, cigar, "A" * read_len)
        rs = int(rng.integers(0, 300))
        re = rs + int(rng.integers(1, 120))
        pad = int(rng.integers(1, 12))
        want = oracle_trim_read_for_hapalign(aln, rs, re, pad)
        got = trim_read_for_hapalign(aln, rs, re, pad)
        assert got == want, (trial, cigar, start, rs, re, pad)

"""Alignment trace records + stitching into reference coordinates.

Reference: src/SeqAlignment/AlignmentTraceback.{h,cpp} — an
``AlignmentTrace`` accumulates per-block data (stutter size, repeat/flank
sequences, flank SNPs/indels) from a retraced read-vs-haplotype alignment,
and ``stitch_alignment_trace`` composes read→haplotype and haplotype→ref
alignment strings into a reference-frame Alignment.

In the reference fork the mode-B retrace that feeds this is disabled
(HapAligner::retrace returns NULL, HapAligner.cpp:601-810), so these paths
are dormant there; they are implemented here for the viz/assembly
workstreams and validated on synthetic compositions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from longtr_tpu.pipeline.alignment import Alignment


@dataclass
class AlignmentTrace:
    num_blocks: int
    stutter_sizes: dict = field(default_factory=dict)   # block -> size
    str_seqs: dict = field(default_factory=dict)        # block -> sequence
    flank_seqs: dict = field(default_factory=dict)      # block -> sequence
    flank_indels: list = field(default_factory=list)    # (pos, size)
    flank_snps: list = field(default_factory=list)      # (pos, base)
    flank_ins: int = 0
    flank_del: int = 0
    hap_aln: str = ""
    traced_aln: Alignment = None

    def add_str_data(self, block, size, seq):
        self.stutter_sizes[block] = size
        self.str_seqs[block] = seq

    def add_flank_data(self, block, seq):
        self.flank_seqs[block] = seq

    def has_stutter(self):
        return any(v != 0 for v in self.stutter_sizes.values())

    def total_stutter_size(self):
        return sum(self.stutter_sizes.values())

    def stutter_size(self, block):
        return self.stutter_sizes.get(block, 0)

    def str_seq(self, block):
        return self.str_seqs.get(block, "")

    def flank_seq(self, block):
        return self.flank_seqs.get(block, "")


def _stitch(hap_aln: str, read_aln: str, h_index: int, r_index: int,
            increment: int) -> str:
    """AlignmentTraceback.cpp:7-52."""
    out = []
    while 0 <= r_index < len(read_aln):
        if read_aln[r_index] == "S":
            out.append("S")
            r_index += increment
            continue
        assert 0 <= h_index < len(hap_aln)
        h = hap_aln[h_index]
        r = read_aln[r_index]
        if h == "D":
            if r == "I":
                out.append("M")
                r_index += increment
                h_index += increment
            else:
                out.append("D")
                h_index += increment
        elif r == "I":
            out.append("I")
            r_index += increment
        elif r == "D":
            if h == "M":
                out.append("D")
            elif h != "I":
                raise RuntimeError("Logical error in stitch_alignment_trace()")
            r_index += increment
            h_index += increment
        elif r == "M":
            if h not in "MI":
                raise RuntimeError("Logical error in stitch_alignment_trace()")
            out.append(h)
            r_index += increment
            h_index += increment
        else:
            raise RuntimeError("Logical error in stitch_alignment_trace()")
    return "".join(out)


def stitch_alignment_trace(hap_start: int, hap_aln_to_ref: str,
                           read_aln_to_hap: str, hap_index: int,
                           seed_base: int, orig_aln: Alignment) -> Alignment:
    """AlignmentTraceback.cpp:55-150: compose into a reference-frame Alignment."""
    hap_aln_index = 0
    seed_pos = hap_start
    while hap_index > 0 and hap_aln_index < len(hap_aln_to_ref):
        ch = hap_aln_to_ref[hap_aln_index]
        if ch in "MI":
            hap_index -= 1
        if ch in "MD":
            seed_pos += 1
        hap_aln_index += 1
    while hap_aln_index < len(hap_aln_to_ref) and \
            hap_aln_to_ref[hap_aln_index] == "D":
        hap_aln_index += 1
    assert hap_aln_index != len(hap_aln_to_ref)

    read_aln_index = 0
    while seed_base > 0 and read_aln_index < len(read_aln_to_hap):
        if read_aln_to_hap[read_aln_index] in "MIS":
            seed_base -= 1
        read_aln_index += 1
    while read_aln_index < len(read_aln_to_hap) and \
            read_aln_to_hap[read_aln_index] == "D":
        read_aln_index += 1
    assert read_aln_index != len(read_aln_to_hap)

    left = _stitch(hap_aln_to_ref, read_aln_to_hap, hap_aln_index - 1,
                   read_aln_index - 1, -1)[::-1]
    right = _stitch(hap_aln_to_ref, read_aln_to_hap, hap_aln_index + 1,
                    read_aln_index + 1, 1)
    full = left + "M" + right
    # leading insertions become soft clips
    chars = list(full)
    for i in range(len(chars)):
        if chars[i] == "I":
            chars[i] = "S"
        else:
            break
    full = "".join(chars)

    start = stop = seed_pos
    for ch in left:
        if ch in "DM":
            start -= 1
    for ch in right:
        if ch in "DM":
            stop += 1

    cigar = []
    for ch in full:
        if cigar and cigar[-1][0] == ch:
            cigar[-1][1] += 1
        else:
            cigar.append([ch, 1])

    read_index = 0
    aln_chars = []
    bases = orig_aln.sequence
    for ch in full:
        if ch == "S":
            read_index += 1
        elif ch in "MI":
            aln_chars.append(bases[read_index])
            read_index += 1
        elif ch == "D":
            aln_chars.append("-")
        else:
            raise RuntimeError("Invalid char in stitch_alignment_trace()")

    new_aln = Alignment(start, stop, False, orig_aln.deleted, "TRACE",
                        orig_aln.base_qualities, orig_aln.sequence,
                        "".join(aln_chars))
    new_aln.cigar = [(op, n) for op, n in cigar]
    return new_aln

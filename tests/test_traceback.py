"""stitch_alignment_trace composition (AlignmentTraceback.cpp)."""

from longtr_tpu.pipeline.alignment import Alignment
from longtr_tpu.pipeline.traceback import AlignmentTrace, stitch_alignment_trace


def make_read(seq, start=100):
    return Alignment(start, start + len(seq) - 1, False, False, "r",
                     "I" * len(seq), seq, seq)


def test_stitch_all_match():
    # hap == ref (all M), read == hap (all M) -> pure match alignment
    read = make_read("ACGTACGT")
    hap_aln = "M" * 20
    read_aln = "M" * 8
    out = stitch_alignment_trace(100, hap_aln, read_aln, hap_index=5,
                                 seed_base=3, orig_aln=read)
    assert out.cigar == [("M", 8)]
    assert out.start == 102  # seed at hap_index 5 -> ref 105; 3 left matches
    assert out.alignment == read.sequence


def test_stitch_hap_insertion_projects_to_read_insertion():
    # haplotype has an insertion vs ref at hap positions 4-5
    read = make_read("ACGTACGT")
    hap_aln = "MMMMIIMMMMMMMM"
    read_aln = "M" * 8
    out = stitch_alignment_trace(100, hap_aln, read_aln, hap_index=7,
                                 seed_base=4, orig_aln=read)
    ops = "".join(op * n for op, n in out.cigar)
    assert "I" in ops
    # read consumes 8 bases total across M/I/S
    assert sum(n for op, n in out.cigar if op in "MIS") == 8


def test_stitch_read_deletion_vs_hap():
    # read has a deletion in the middle relative to the haplotype
    read = make_read("ACGTACG")
    hap_aln = "M" * 16
    read_aln = "MMMDMMMM"
    out = stitch_alignment_trace(100, hap_aln, read_aln, hap_index=6,
                                 seed_base=3, orig_aln=read)
    assert ("D", 1) in [tuple(c) for c in out.cigar]
    assert "-" in out.alignment


def test_trace_record_accessors():
    t = AlignmentTrace(3)
    t.add_str_data(1, 2, "ACAC")
    t.add_flank_data(0, "GGG")
    assert t.has_stutter()
    assert t.total_stutter_size() == 2
    assert t.str_seq(1) == "ACAC"
    assert t.flank_seq(0) == "GGG"
    assert t.stutter_size(2) == 0

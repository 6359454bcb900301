"""left_align_reads parity vs the compiled reference
(genotyper_bam_processor.cpp:38-168 via the trim oracle).

The full post-filter read conversion — overlap gate, real TrimAlignment,
whole-repeat <DEL> alignments, per-base =/X CIGAR expansion against the
(case-folded) chromosome, alignment-string construction, soft-clip
discards, HP haplotype-tag counting, PF pass-through — runs as compiled
reference code; both our native C++ batch path and the pure-Python
fallback must produce identical Alignment lists.
"""

import re
import types

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.io.bam import BamRecord
from longtr_tpu.pipeline.alignment import left_align_reads
from longtr_tpu.regions import Region, RegionGroup

pytestmark = pytest.mark.skipif(ro.get_trim_lib() is None,
                                reason="trim oracle unavailable")

BASES = "ACGT"


class FakeRec:
    def __init__(self, d):
        self.seq = d["seq"]
        self.qual = d["qual"]
        self.name = d["name"]
        self.pos = d["pos"]
        self.end_pos = d["end_pos"]
        self.is_reverse = bool(d.get("rev"))
        self.cigar = [(op, int(n)) for n, op in
                      re.findall(r"(\d+)([=XIDSHM])", d["cigar"])]
        self.length = len(self.seq)
        self.deleted = False
        self.tags = {}
        if d.get("hp"):
            self.tags["HP"] = d["hp"]
        self.pass_two = [c == "1" for c in d["pf"]]

    def get_tag(self, name, default=None):
        return self.tags.get(name, default)

    trim_alignment = BamRecord.trim_alignment


def make_locus(rng, n_samples=2, n_reads=8, period=3, n_units=8, flank=260):
    motif = "".join(rng.choice(list(BASES), size=period))
    chrom = "".join(rng.choice(list(BASES), size=2 * flank + 400))
    rs = flank + 100
    rep = motif * n_units
    re_ = rs + len(rep)
    chrom = chrom[:rs] + rep + chrom[rs:]
    # lowercase a stretch: the reference upper-cases chrom_seq on compare
    lo = rs - 40
    chrom = chrom[:lo] + chrom[lo:lo + 20].lower() + chrom[lo + 20:]
    reads = [[] for _ in range(n_samples)]
    for s in range(n_samples):
        for k in range(n_reads):
            kind = rng.random()
            if kind < 0.15:     # not fully overlapping -> discarded
                pos = re_ + int(rng.integers(1, 30))
                span = int(rng.integers(20, 60))
                cigar = f"{span}="
            elif kind < 0.3:    # soft-clipped within window -> discarded
                pos = rs - int(rng.integers(30, 60))
                span = len(rep) + int(rng.integers(60, 90))
                cigar = f"5S{span}="
            elif kind < 0.45:   # whole-repeat deletion -> <DEL>
                pre = int(rng.integers(20, 50))
                post = int(rng.integers(20, 50))
                pos = rs - pre
                cigar = f"{pre}={len(rep)}D{post}="
                span = pre + len(rep) + post
            else:               # spanning read with mismatches/indels
                pre = int(rng.integers(20, 80))
                post = int(rng.integers(20, 80))
                pos = rs - pre
                mid = len(rep) + int(rng.integers(-2, 3)) * period
                mid = max(mid, period)
                ops = f"{pre}="
                if mid < len(rep):
                    ops += f"{mid}={len(rep) - mid}D"
                elif mid > len(rep):
                    ops += f"{len(rep)}={mid - len(rep)}I"
                else:
                    ops += f"{mid}="
                ops += f"{post}="
                cigar = ops
                span = pre + len(rep) + post if mid <= len(rep) else \
                    pre + len(rep) + post
                span = sum(int(n) for n, op in
                           re.findall(r"(\d+)([=XMD])", cigar))
            read_len = sum(int(n) for n, op in
                           re.findall(r"(\d+)([=XIS])", cigar))
            seq = "".join(rng.choice(list(BASES), size=read_len))
            if rng.random() < 0.3:   # some mismatching bases -> X expansion
                i = int(rng.integers(0, read_len))
                seq = seq[:i] + "N" + seq[i + 1:]
            qual = "".join(chr(33 + int(q))
                           for q in rng.integers(5, 41, read_len))
            reads[s].append(dict(
                seq=seq, qual=qual, name=f"s{s}r{k}", cigar=cigar, pos=pos,
                end_pos=pos + span, rev=bool(rng.random() < 0.5),
                hp=int(rng.integers(0, 3)), pf="1",
                log_p1=float(-rng.uniform(0, 2)),
                log_p2=float(-rng.uniform(0, 2))))
    return chrom, rs, re_, motif, reads


def run_ours(chrom, rs, re_, motif, reads):
    group = RegionGroup.single(Region("chr1", rs, re_, motif))
    samples_reads = [[FakeRec(d) for d in s] for s in reads]
    p1 = [[d["log_p1"] for d in s] for s in reads]
    p2 = [[d["log_p2"] for d in s] for s in reads]
    left, f1, f2, np1, np2 = left_align_reads(group, chrom, samples_reads,
                                              p1, p2)
    alns = [dict(start=a.start, stop=a.stop, rev=a.rev_strand,
                 deleted=a.deleted, name=a.name, seq=a.sequence,
                 quals=a.base_qualities, aln=a.alignment,
                 cigar=list(a.cigar), use_for_haps=list(a.use_for_haps))
            for a in left]
    pairs = [(s, v) for s, vals in enumerate(f1) for v in vals]
    return alns, pairs, list(np1), list(np2)


def test_left_align_fuzz_matches_reference(monkeypatch):
    for trial in range(25):
        rng = np.random.default_rng(6000 + trial)
        chrom, rs, re_, motif, reads = make_locus(rng)
        want = ro.left_align(chrom, "chr1", rs, re_, motif, reads)
        got = run_ours(chrom, rs, re_, motif, reads)
        assert got[0] == want[0], trial
        assert got[1] == want[1], trial
        assert (got[2], got[3]) == (want[2], want[3]), trial
        # the pure-Python fallback must agree too
        monkeypatch.setenv("LONGTR_NO_NATIVE", "1")
        try:
            got_py = run_ours(chrom, rs, re_, motif, reads)
        finally:
            monkeypatch.delenv("LONGTR_NO_NATIVE")
        assert got_py == got, trial

"""Read-filter + mate-pairing parity vs the COMPILED reference
(bam_processor.cpp read_and_filter_reads, :188-487).

The chain that decides WHICH reads enter genotyping — overlap/mate-rescue
gates, hard-clip gate, N-base / quality / MAPQ / spanning ladder, min-flank
haplotype-generation marks (PF), the XA/SA alternate-mapping unique-pairing
logic with AS/XS score guards, per-file mate caches, unpaired-read
resolution, and read-group grouping — runs as compiled reference code over
a queue-fed stub reader; our transcription (pipeline/filters.py) must make
identical decisions on identical synthetic read streams.
"""

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.config import Config
from longtr_tpu.pipeline.filters import read_and_filter_reads
from longtr_tpu.regions import Region, RegionGroup

pytestmark = pytest.mark.skipif(ro.get_lib() is None,
                                reason="reference oracle unavailable")

BASES = "ACGT"


class FakeRec:
    def __init__(self, d):
        self.pos = d["pos"]
        self.end_pos = d["end_pos"]
        self.seq = d["seq"]
        self.qual = d["qual"]
        self.name = d["name"]
        self.mapq = d.get("mapq", 60)
        self.mate_pos = d.get("mate_pos", 0)
        self.is_paired = bool(d.get("paired"))
        self.is_mapped = bool(d.get("mapped", True))
        self.is_first_mate = bool(d.get("first_mate", True))
        self.filename = f"F{d.get('file', 0)}"
        self.ref_name = "ref"
        self.cigar = [(op, int(num)) for num, op in
                      __import__("re").findall(r"(\d+)([=XIDSH])",
                                               d["cigar"])]
        self.n_cigar = len(self.cigar)
        self.length = len(self.seq)
        self.tags = {}
        for key, tag in (("rg", "RG"), ("xa", "XA"), ("sa", "SA")):
            if d.get(key):
                self.tags[tag] = d[key]
        for key, tag in (("as_score", "AS"), ("xs_score", "XS")):
            if key in d:
                self.tags[tag] = d[key]

    def starts_with_hard_clip(self):
        return bool(self.cigar) and self.cigar[0][0] == "H"

    def ends_with_hard_clip(self):
        return bool(self.cigar) and self.cigar[-1][0] == "H"

    def get_tag(self, name, default=None):
        return self.tags.get(name, default)

    def has_tag(self, name):
        return name in self.tags


class FakeReader:
    def __init__(self, recs):
        self._recs = list(recs)
        self._i = 0

    def get_next_alignment(self):
        if self._i >= len(self._recs):
            return None
        r = self._recs[self._i]
        self._i += 1
        return r


def run_both(reads, region_start, region_end, motif, rg_to_sample,
             use_bam_rgs=True, **knobs):
    want_groups, want_too_many = ro.filter_reads(
        reads, region_start, region_end, motif, rg_to_sample,
        use_bam_rgs=use_bam_rgs, **{k: v for k, v in knobs.items()})

    cfg = Config()
    cfg.require_spanning = bool(knobs.get("require_spanning", 1))
    cfg.require_paired_reads = bool(knobs.get("require_paired", 0))
    cfg.min_mapq = knobs.get("min_mapq", 20.0)
    cfg.min_sum_qual_log_prob = knobs.get("min_sum_qual", 30.0)
    cfg.min_flank = knobs.get("min_flank", 5)
    cfg.max_total_reads = knobs.get("max_total_reads", 1_000_000)

    recs = [FakeRec(d) for d in reads]
    for i, r in enumerate(recs):
        r._xi = i
    group = RegionGroup.single(Region("ref", region_start, region_end,
                                      motif))
    rg_names, paired_by_rg, mates_by_rg, unpaired_by_rg, counters = \
        read_and_filter_reads(FakeReader(recs), group, rg_to_sample, cfg,
                              use_bam_rgs)

    got_groups = []
    for g, name in enumerate(rg_names):
        paired = [(r._xi, m._xi, "".join("1" if b else "0"
                                         for b in r.pass_two))
                  for r, m in zip(paired_by_rg[g], mates_by_rg[g])]
        unpaired = [(r._xi, "".join("1" if b else "0" for b in r.pass_two))
                    for r in unpaired_by_rg[g]]
        got_groups.append((name, paired, unpaired))
    return (want_groups, want_too_many), \
        (got_groups, bool(counters.too_many_reads))


def mk_read(rng, rs, re_, name, file=0, rg="G0", **kw):
    """A read around the [rs, re_) region with a simple CIGAR."""
    span = int(rng.integers(20, 120))
    pos = int(rng.integers(max(0, rs - 80), re_ + 40))
    n_soft = int(rng.integers(0, 8)) if rng.random() < 0.3 else 0
    cigar = (f"{n_soft}S" if n_soft else "") + f"{span}="
    if rng.random() < 0.15:
        cigar += f"{int(rng.integers(1, 5))}D{int(rng.integers(5, 20))}="
    ref_span = sum(int(n) for n, op in
                   __import__("re").findall(r"(\d+)([=XMD])", cigar))
    read_len = n_soft + sum(
        int(n) for n, op in __import__("re").findall(r"(\d+)([=XI])", cigar))
    seq = "".join(rng.choice(list(BASES), size=read_len))
    if rng.random() < 0.08:
        i = int(rng.integers(0, len(seq)))
        seq = seq[:i] + "N" + seq[i + 1:]
    qual = "".join(chr(33 + int(q)) for q in rng.integers(5, 41, read_len))
    d = dict(seq=seq, qual=qual, name=name, cigar=cigar, pos=pos,
             end_pos=pos + ref_span, mapq=int(rng.integers(0, 61)),
             file=file, rg=rg)
    d.update(kw)
    return d


def test_filter_parity_basic_stream():
    rng = np.random.default_rng(1)
    rs, re_ = 500, 530
    reads = [mk_read(rng, rs, re_, f"r{i}") for i in range(60)]
    rg_map = {"F0G0": "S0"}
    want, got = run_both(reads, rs, re_, "AC", rg_map)
    assert want == got


def test_filter_parity_mate_pairs_and_alt_mappings():
    rng = np.random.default_rng(2)
    rs, re_ = 500, 530
    reads = []
    for i in range(25):
        # STR read + mate with shared name; some carry XA/SA alt mappings
        kw = dict(paired=True, first_mate=True,
                  mate_pos=int(rng.integers(400, 700)))
        if rng.random() < 0.4:
            kw["xa"] = f"alt{int(rng.integers(1, 3))},+{int(rng.integers(100, 2000))},50=,2;"
        if rng.random() < 0.3:
            kw["as_score"] = int(rng.integers(40, 60))
            kw["xs_score"] = int(rng.integers(30, 60))
        reads.append(mk_read(rng, rs, re_, f"p{i}", **kw))
        mate_kw = dict(paired=True, first_mate=False,
                       mate_pos=reads[-1]["pos"])
        if rng.random() < 0.3:
            mate_kw["sa"] = f"ref,{int(rng.integers(100, 5000))},+,60=,60,0;"
        reads.append(mk_read(rng, rs, re_, f"p{i}", **mate_kw))
    rng.shuffle(reads)
    rg_map = {"F0G0": "S0"}
    want, got = run_both(reads, rs, re_, "AC", rg_map)
    assert want == got


def test_filter_parity_multi_file_multi_rg():
    rng = np.random.default_rng(3)
    rs, re_ = 500, 530
    reads = []
    for i in range(50):
        f = int(rng.integers(0, 3))
        rg = f"G{int(rng.integers(0, 2))}"
        reads.append(mk_read(rng, rs, re_, f"r{i}", file=f, rg=rg,
                             paired=bool(rng.random() < 0.5),
                             mate_pos=int(rng.integers(400, 700))))
    # reader yields by file (ORDER_ALNS_BY_FILE)
    reads.sort(key=lambda d: d["file"])
    rg_map = {f"F{f}G{g}": f"S{f}_{g}" for f in range(3) for g in range(2)}
    want, got = run_both(reads, rs, re_, "AC", rg_map)
    assert want == got


def test_filter_parity_knob_sweep():
    rng = np.random.default_rng(4)
    rs, re_ = 500, 530
    reads = [mk_read(rng, rs, re_, f"r{i}") for i in range(40)]
    rg_map = {"F0G0": "S0"}
    for knobs in (dict(require_spanning=0),
                  dict(min_mapq=40.0),
                  dict(min_sum_qual=25.0),
                  dict(min_flank=20),
                  dict(require_paired=1),
                  dict(max_total_reads=5)):
        want, got = run_both(reads, rs, re_, "AC", rg_map, **knobs)
        assert want == got, knobs


def test_filter_parity_hard_clips_and_unmapped():
    rng = np.random.default_rng(5)
    rs, re_ = 500, 530
    reads = []
    for i in range(30):
        kw = {}
        if rng.random() < 0.3:
            kw["cigar"] = f"3H{int(rng.integers(30, 80))}="
        if rng.random() < 0.15:
            kw["mapped"] = False
        r = mk_read(rng, rs, re_, f"r{i}", **{k: v for k, v in kw.items()
                                              if k != "cigar"})
        if "cigar" in kw:
            span = int(kw["cigar"].split("H")[1][:-1])
            r["cigar"] = kw["cigar"]
            r["end_pos"] = r["pos"] + span
            r["seq"] = r["seq"][:span].ljust(span, "A")
            r["qual"] = r["qual"][:span].ljust(span, "I")
        reads.append(r)
    rg_map = {"F0G0": "S0"}
    want, got = run_both(reads, rs, re_, "AC", rg_map)
    assert want == got


def test_filter_parity_fuzz():
    rs, re_ = 500, 530
    for trial in range(25):
        rng = np.random.default_rng(100 + trial)
        reads = []
        n_pairs = int(rng.integers(0, 15))
        for i in range(n_pairs):
            kw = dict(paired=True, first_mate=True,
                      mate_pos=int(rng.integers(400, 700)))
            if rng.random() < 0.5:
                kw["xa"] = ";".join(
                    f"{rng.choice(['ref', 'alt1', 'ref_1_alt'])},"
                    f"{'+' if rng.random() < 0.5 else '-'}"
                    f"{int(rng.integers(100, 3000))},50=,2"
                    for _ in range(rng.integers(1, 3))) + ";"
            if rng.random() < 0.4:
                kw["as_score"] = int(rng.integers(30, 60))
                kw["xs_score"] = int(rng.integers(30, 60))
            reads.append(mk_read(rng, rs, re_, f"p{i}", **kw))
            if rng.random() < 0.8:   # mate present most of the time
                reads.append(mk_read(rng, rs, re_, f"p{i}", paired=True,
                                     first_mate=bool(rng.random() < 0.3),
                                     mate_pos=reads[-1]["pos"]))
        for i in range(int(rng.integers(0, 20))):
            reads.append(mk_read(rng, rs, re_, f"u{i}",
                                 paired=bool(rng.random() < 0.3),
                                 mate_pos=int(rng.integers(400, 700)),
                                 file=int(rng.integers(0, 2))))
        reads.sort(key=lambda d: d["file"])
        rg_map = {f"F{f}G0": f"S{f}" for f in range(2)}
        want, got = run_both(reads, rs, re_, "ACG", rg_map)
        assert want == got, trial


def test_filter_parity_both_mates_pass_keeps_first():
    """When BOTH mates of a pair pass filters and overlap the region, the
    reference's std::map::insert keeps the FIRST-seen read as the unpaired
    candidate (the second insert is a no-op, bam_processor.cpp:376) — a
    dict-assignment transcription keeps the last instead.  Found by the
    randomized filter-parity campaign (seed 80005)."""
    rng = np.random.default_rng(10)
    rs, re_ = 500, 540
    reads = []
    for i in range(6):
        # same-name pairs where both ends overlap the region and pass;
        # get_valid_pairings fails (mate_pos mismatch), so both flow into
        # potential_strs via the same aln_key
        a = mk_read(rng, rs, re_, f"q{i}", paired=True, first_mate=True,
                    mate_pos=int(rng.integers(400, 700)))
        b = mk_read(rng, rs, re_, f"q{i}", paired=True, first_mate=False,
                    mate_pos=int(rng.integers(400, 700)))
        # force both to span the region so both take the pass_one path
        for d in (a, b):
            span = (re_ - rs) + 80
            d["pos"] = rs - 40
            d["cigar"] = f"{span}="
            d["end_pos"] = d["pos"] + span
            d["seq"] = "".join(rng.choice(list(BASES), size=span))
            d["qual"] = "I" * span
            d["mapq"] = 60
        reads += [a, b]
    want, got = run_both(reads, rs, re_, "AC", {"F0G0": "S0"})
    assert want == got


def test_filter_parity_unpaired_order_is_key_sorted():
    """The reference iterates potential_strs (std::map) in sorted-aln_key
    order, which sets both the unpaired read order and, through the
    reverse RG fan-out, the read-group discovery order — insertion order
    diverges for interleaved read groups.  Found by the campaign (seed
    80025)."""
    rng = np.random.default_rng(11)
    rs, re_ = 500, 540
    reads = []
    # names chosen so sorted order != arrival order, spread across two RGs
    for i, name in enumerate(["zz", "mm", "aa", "rr", "bb", "kk"]):
        reads.append(mk_read(rng, rs, re_, name, rg=f"G{i % 2}"))
    rg_map = {"F0G0": "S0", "F0G1": "S1"}
    want, got = run_both(reads, rs, re_, "AC", rg_map)
    assert want == got

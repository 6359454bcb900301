"""Byte-level VCF record parity against the COMPILED reference emission chain.

Round-2 proved component-level bit-parity (pair-HMM LLs, posteriors, GLs,
stutter PMF, ...).  This suite closes the loop at the product boundary: the
oracle runs the reference's real ``SeqStutterGenotyper`` — constructor/init
(seq_stutter_genotyper.cpp:484-506), ``genotype()`` (:598-665) and
``write_vcf_record`` (:883-1402) — on synthetic loci and captures the
uncompressed record text; our pipeline (``pipeline/seq_genotyper.py`` +
``pipeline/vcf_record.py``) runs on identical inputs in reference-fidelity
math mode; the records must match BYTE FOR BYTE (position and full text).

Scenarios: multi-allelic, haploid, phased factors, ``<DEL>`` whole-repeat
deletions, flank SNPs/insertions/deletions, mate pairs (second-mate LL
combining), stutter-artifact reads, empty samples, extra VCF sample columns,
FILTERS/GL/PL/HQ flag permutations, custom alignment-model parameters, the
too-many-haplotypes abort, and a randomized fuzz sweep.

The oracle drives the genotyper with ``reassemble_flanks=false`` even
though the reference production call site hardcodes 1
(genotyper_bam_processor.cpp:294): driving the compiled chain with the
hardcoded value SEGFAULTS (assemble_flanks indexes an empty traced_alns
vector — verified by execution, see PARITY.md), so entry-at-genotyper
with the reassembly no-op is the deepest level at which the reference
itself can run.

Mode B (``--stutter-align-len`` != 0) is deliberately excluded: the
reference's emission-side retrace is structurally broken upstream —
``trace_optimal_aln`` hardcodes the short path for every period
(HapAligner.cpp:999) and ``HapAligner::retrace`` is commented out with
``return NULL;`` as a ``std::string`` (HapAligner.cpp:601-810) — so any
SWITCH_OLD_ALIGN_LEN != 0 run of the compiled reference emission aborts
(assertions HapAligner.cpp:117/:950 or std::logic_error).  Verified with the
oracle; recorded in PARITY.md.  Mode-B *scoring* parity is covered
bit-exactly in test_ref_oracle.py.
"""

import re

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.models.stutter import StutterModel
from longtr_tpu.pipeline.alignment import Alignment
from longtr_tpu.pipeline.seq_genotyper import SeqStutterGenotyper
from longtr_tpu.pipeline.vcf_record import OutputFlags, write_vcf_record
from longtr_tpu.regions import Region, RegionGroup
from longtr_tpu.utils import mathops

pytestmark = pytest.mark.skipif(ro.get_lib() is None,
                                reason="reference oracle unavailable")

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(rng.choice(list(BASES)) for _ in range(n))


def compress_cigar(expanded):
    out = []
    for op in expanded:
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + 1)
        else:
            out.append((op, 1))
    return out


def make_read(chrom, rs, re_, allele, flank, name, rng, qual_jitter=False,
              log_p1=0.0, log_p2=0.0, flank_snp=None, flank_ins=None,
              flank_del=None):
    """A left-aligned read spanning the STR with the given allele sequence.

    flank_snp/flank_ins/flank_del: offset into the left flank at which to
    mutate / insert one base / delete one base."""
    rep = chrom[rs:re_]
    lf = chrom[rs - flank:rs]
    rf = chrom[re_:re_ + flank]
    lf_ops = ["="] * len(lf)
    if flank_snp is not None:
        old = lf[flank_snp]
        new = BASES[(BASES.index(old) + 1) % 4]
        lf = lf[:flank_snp] + new + lf[flank_snp + 1:]
        lf_ops[flank_snp] = "X"
    if flank_ins is not None:
        lf = lf[:flank_ins] + "A" + lf[flank_ins:]
        lf_ops.insert(flank_ins, "I")
    if flank_del is not None:
        lf = lf[:flank_del] + lf[flank_del + 1:]
        lf_ops[flank_del] = "D"
    if len(allele) == len(rep):
        rep_ops = ["=" if a == b else "X" for a, b in zip(allele, rep)]
    elif len(allele) < len(rep):
        rep_ops = ["="] * len(allele) + ["D"] * (len(rep) - len(allele))
    else:
        rep_ops = ["="] * len(rep) + ["I"] * (len(allele) - len(rep))
    expanded = lf_ops + rep_ops + ["="] * len(rf)
    cig = compress_cigar(expanded)
    seq = lf + allele + rf
    span = sum(n for op, n in cig if op in "=XMD")
    aln_str = ""
    qi = 0
    for op, num in cig:
        if op == "D":
            aln_str += "-" * num
        else:
            aln_str += seq[qi:qi + num]
            qi += num
    quals = "".join(chr(33 + int(rng.integers(20, 41))) for _ in seq) \
        if qual_jitter else "I" * len(seq)
    return dict(seq=seq, quals=quals, aln=aln_str, name=name,
                start=rs - flank, stop=rs - flank + span - 1,
                cigar="".join(f"{n}{op}" for op, n in cig),
                log_p1=log_p1, log_p2=log_p2)


def run_case(seed=0, period=3, n_units=8, deltas=(1,), n_samples=2,
             reads_per_allele=4, haploid=False, phased=False,
             flags_kw=None, qual_jitter=False, flank=60, special=None,
             extra_sample_names=(), empty_samples=(), aln_params=None,
             max_total_haplotypes=1000):
    """Drive the compiled reference and our pipeline on identical inputs.

    Returns (oracle_records, our_records) as lists of (pos, record_text)."""
    rng = np.random.default_rng(seed)
    motif = rand_seq(rng, period)
    chrom = rand_seq(rng, 2 * flank + 200)
    rs = flank + 50
    rep = motif * n_units
    re_ = rs + len(rep)
    chrom = chrom[:rs] + rep + chrom[rs:]

    stutter = (0.9, 0.05, 0.05, 0.9, 0.01, 0.01)
    sample_names = [f"S{i}" for i in range(n_samples)]
    reads = []
    for s in range(n_samples):
        alleles = [rep, motif * (n_units + deltas[s % len(deltas)])]
        rd = []
        if s not in empty_samples:
            for k in range(reads_per_allele):
                for ai, al in enumerate(alleles):
                    lp1, lp2 = 0.0, 0.0
                    if phased:
                        lp1 = float(-rng.uniform(0.01, 3.0)) if ai else 0.0
                        lp2 = 0.0 if ai else float(-rng.uniform(0.01, 3.0))
                    rd.append(make_read(chrom, rs, re_, al, flank,
                                        f"s{s}r{k}a{ai}", rng, qual_jitter,
                                        lp1, lp2))
        reads.append(rd)
    ctx = dict(chrom=chrom, rs=rs, re_=re_, motif=motif, rep=rep,
               flank=flank, rng=rng, make_read=make_read)
    if special is not None:
        special(reads, ctx)
    vcf_sample_names = sample_names + list(extra_sample_names)

    fl = dict(gls=1, pls=1, allreads=1, mallreads=1, filters=0,
              phased_gls=0, hap_data=0)
    if flags_kw:
        fl.update(flags_kw)
    n_p1s = [int(rng.integers(0, 5)) for _ in range(n_samples)]
    n_p2s = [int(rng.integers(0, 5)) for _ in range(n_samples)]

    ro.set_genotyper_flags(gls=fl["gls"], pls=fl["pls"],
                           phased_gls=fl["phased_gls"],
                           allreads=fl["allreads"], mallreads=fl["mallreads"],
                           filters=fl["filters"], hap_data=fl["hap_data"])
    want_recs, _want_log = ro.genotype_locus(
        chrom, "chr7", rs, re_, motif, reads, sample_names, stutter,
        haploid=haploid, n_p1s=n_p1s, n_p2s=n_p2s,
        vcf_sample_names=vcf_sample_names, aln_params=aln_params,
        max_total_haplotypes=max_total_haplotypes)

    mathops.set_ref_fidelity(True)
    try:
        our_alns, p1s, p2s = [], [], []
        for s in range(n_samples):
            sp1, sp2 = [], []
            for r in reads[s]:
                cig = [(op, int(num))
                       for num, op in re.findall(r"(\d+)([=XIDM])",
                                                 r["cigar"])]
                our_alns.append(Alignment(
                    r["start"], r["stop"], False, False, r["name"],
                    r["quals"], r["seq"], alignment=r["aln"], cigar=cig,
                    use_for_haps=[True]))
                sp1.append(r["log_p1"])
                sp2.append(r["log_p2"])
            p1s.append(sp1)
            p2s.append(sp2)
        region = Region("chr7", rs, re_, motif)
        group = RegionGroup.single(region)
        model = StutterModel(*stutter, motif=motif)
        gt = SeqStutterGenotyper(group, haploid, our_alns, p1s, p2s,
                                 n_p1s, n_p2s, sample_names, chrom,
                                 [model], alignment_params=aln_params)
        got_recs = []

        class Capture:
            def add_vcf_record(self, chrom_, pos_, text_):
                got_recs.append((pos_, text_))

        if gt.genotype(max_total_haplotypes=max_total_haplotypes):
            flags = OutputFlags()
            flags.gls = bool(fl["gls"])
            flags.pls = bool(fl["pls"])
            flags.phased_gls = bool(fl["phased_gls"])
            flags.allreads = bool(fl["allreads"])
            flags.mallreads = bool(fl["mallreads"])
            flags.filters = bool(fl["filters"])
            flags.haplotype_data = bool(fl["hap_data"])
            write_vcf_record(gt, vcf_sample_names, flags, Capture())
    finally:
        mathops.set_ref_fidelity(False)
    return want_recs, got_recs


def assert_case(**kw):
    want, got = run_case(**kw)
    assert len(want) == len(got), \
        f"record count: ref={len(want)} ours={len(got)} for {kw}"
    for (wp, wt), (gp, gtxt) in zip(want, got):
        assert wp == gp, f"record pos: ref={wp} ours={gp} for {kw}"
        if wt != gtxt:
            wf, gf = wt.split("\t"), gtxt.split("\t")
            diffs = [f"field {i}: ref={a!r} ours={b!r}"
                     for i, (a, b) in enumerate(zip(wf, gf)) if a != b]
            raise AssertionError(
                f"record text differs for {kw}:\n" + "\n".join(diffs))


# ---------------------------------------------------------------------------
# Basic matrix: ploidy x phasing x allele structure x flags x period
# ---------------------------------------------------------------------------

def test_record_parity_diploid_basic():
    assert_case(seed=1)


def test_record_parity_homopolymer():
    assert_case(seed=2, period=1, n_units=14)


def test_record_parity_period6():
    assert_case(seed=3, period=6, n_units=5)


def test_record_parity_multiallelic():
    assert_case(seed=4, deltas=(1, -1))
    assert_case(seed=5, deltas=(2, -1), n_samples=4)


def test_record_parity_haploid():
    assert_case(seed=6, haploid=True)
    assert_case(seed=14, haploid=True, qual_jitter=True, deltas=(1, -1))


def test_record_parity_phased_factors():
    assert_case(seed=7, phased=True)
    assert_case(seed=9, qual_jitter=True, phased=True, deltas=(1, -2))


def test_record_parity_flag_permutations():
    assert_case(seed=10, flags_kw=dict(gls=0, pls=0, allreads=0, mallreads=0))
    assert_case(seed=11, flags_kw=dict(filters=1))
    assert_case(seed=12, flags_kw=dict(hap_data=1))
    assert_case(seed=13, flags_kw=dict(phased_gls=1), phased=True)


def test_record_parity_vntr_scale():
    assert_case(seed=40, n_units=30, period=5, flank=80)


def test_record_parity_custom_alignment_params():
    assert_case(seed=50,
                aln_params=[-1.2, -0.5, -0.9, -0.4, -0.0001, -9.5, -9.5])


def test_record_parity_max_haps_abort():
    # both sides must refuse to genotype (0 records)
    want, got = run_case(seed=55, max_total_haplotypes=1)
    assert want == [] and got == []


# ---------------------------------------------------------------------------
# Special read structures
# ---------------------------------------------------------------------------

def _sp_del_whole(reads, ctx):
    """Reads deleting the entire repeat -> '<DEL>' allele in the record."""
    for k in range(4):
        reads[0].append(ctx["make_read"](
            ctx["chrom"], ctx["rs"], ctx["re_"], "", ctx["flank"],
            f"delr{k}", ctx["rng"]))


def _sp_flank_ins(reads, ctx):
    for k in range(3):
        reads[1].append(ctx["make_read"](
            ctx["chrom"], ctx["rs"], ctx["re_"], ctx["rep"], ctx["flank"],
            f"fi{k}", ctx["rng"], flank_ins=20))


def _sp_flank_del(reads, ctx):
    for k in range(3):
        reads[1].append(ctx["make_read"](
            ctx["chrom"], ctx["rs"], ctx["re_"], ctx["rep"], ctx["flank"],
            f"fd{k}", ctx["rng"], flank_del=25))


def _sp_flank_snp(reads, ctx):
    for k in range(4):
        reads[0].append(ctx["make_read"](
            ctx["chrom"], ctx["rs"], ctx["re_"], ctx["rep"], ctx["flank"],
            f"fs{k}", ctx["rng"], flank_snp=15))


def _sp_mates(reads, ctx):
    """Consecutive same-name reads: the second-mate LL-combining path."""
    for s in range(len(reads)):
        pair = [ctx["make_read"](ctx["chrom"], ctx["rs"], ctx["re_"],
                                 ctx["rep"], ctx["flank"], "mate_pair",
                                 ctx["rng"]) for _ in range(2)]
        reads[s].extend(pair)


def _sp_stutter_read(reads, ctx):
    """One low-support stutter-contraction read (not an allele candidate)."""
    motif = ctx["motif"]
    al = motif * (len(ctx["rep"]) // len(motif) - 1)
    reads[0].append(ctx["make_read"](
        ctx["chrom"], ctx["rs"], ctx["re_"], al, ctx["flank"], "stut",
        ctx["rng"]))


def test_record_parity_del_allele():
    assert_case(seed=20, special=_sp_del_whole)
    assert_case(seed=29, special=_sp_del_whole, haploid=True)


def test_record_parity_flank_indels():
    assert_case(seed=21, special=_sp_flank_ins)
    assert_case(seed=22, special=_sp_flank_del)
    assert_case(seed=30, special=_sp_flank_ins, flags_kw=dict(filters=1))


def test_record_parity_flank_snp():
    assert_case(seed=23, special=_sp_flank_snp, qual_jitter=True)


def test_record_parity_mate_pairs():
    assert_case(seed=24, special=_sp_mates, phased=True)


def test_record_parity_stutter_read():
    assert_case(seed=25, special=_sp_stutter_read)


def test_record_parity_missing_samples():
    assert_case(seed=26, empty_samples=(1,))
    assert_case(seed=27, extra_sample_names=("GHOST",))
    assert_case(seed=28, empty_samples=(0,), extra_sample_names=("ZZ",),
                flags_kw=dict(filters=1))


def _sp_n_bases(reads, ctx):
    """A read carrying 'N' bases (marked X against the reference)."""
    import re as _re
    c = ctx
    r = ctx["make_read"](c["chrom"], c["rs"], c["re_"], c["rep"], c["flank"],
                         "nn", c["rng"])
    for col in (5, 30):
        r["seq"] = r["seq"][:col] + "N" + r["seq"][col + 1:]
        r["aln"] = r["aln"][:col] + "N" + r["aln"][col + 1:]
    ops = []
    for num, op in _re.findall(r"(\d+)([=XIDSH])", r["cigar"]):
        ops += [op] * int(num)
    qi, out = 0, []
    for op in ops:
        if op == "D":
            out.append(op)
            continue
        out.append("X" if (qi in (5, 30) and op in "=X") else op)
        qi += 1
    comp = []
    for op in out:
        if comp and comp[-1][0] == op:
            comp[-1][1] += 1
        else:
            comp.append([op, 1])
    r["cigar"] = "".join(f"{n}{op}" for op, n in comp)
    reads[0].append(r)


def _sp_qual_extremes(reads, ctx):
    """Reads at the phred extremes (q=0 '!', q=93 '~', q=2 '#')."""
    c = ctx
    for k, q in enumerate(["!", "~", "#"]):
        r = ctx["make_read"](c["chrom"], c["rs"], c["re_"], c["rep"],
                             c["flank"], f"q{k}", c["rng"])
        r["quals"] = q * len(r["seq"])
        reads[1].append(r)


def test_record_parity_adversarial_bases_and_quals():
    assert_case(seed=70, special=_sp_n_bases)
    assert_case(seed=71, special=_sp_qual_extremes)


def test_record_parity_sample_counts():
    assert_case(seed=72, n_samples=1)
    assert_case(seed=73, n_samples=8, reads_per_allele=2)


# ---------------------------------------------------------------------------
# Randomized sweep
# ---------------------------------------------------------------------------

def test_record_parity_fuzz():
    rng = np.random.default_rng(777)
    for trial in range(24):
        kw = dict(
            seed=int(rng.integers(10_000, 1_000_000)),
            period=int(rng.integers(1, 7)),
            n_units=int(rng.integers(5, 16)),
            deltas=tuple(int(d) for d in rng.choice(
                [-2, -1, 1, 2], size=rng.integers(1, 3), replace=False)),
            n_samples=int(rng.integers(1, 5)),
            reads_per_allele=int(rng.integers(2, 6)),
            haploid=bool(rng.random() < 0.25),
            phased=bool(rng.random() < 0.5),
            qual_jitter=bool(rng.random() < 0.7),
            flank=int(rng.integers(40, 90)),
        )
        assert_case(**kw)

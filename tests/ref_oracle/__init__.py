"""Reference-source oracle: compiles htslib-free sources from the read-only
reference checkout (/root/reference/src) together with a C-ABI wrapper into a
test-only shared library, so parity tests can assert against *actual compiled
reference code* instead of hand transcriptions (VERDICT r1 item 1).

Nothing from the reference tree is copied into this repository; the build
reads the sources in place.  If the reference checkout or g++ is missing the
loader returns None and dependent tests skip.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_REF_SRC = "/root/reference/src"
_LIB_PATH = os.path.join(_DIR, "libref_oracle.so")

_REF_SOURCES = [
    "bam_processor.cpp",
    "pcr_duplicates.cpp",
    "seq_stutter_genotyper.cpp",
    "em_stutter_genotyper.cpp",
    "extract_indels.cpp",
    "snp_phasing_quality.cpp",
    "read_pooler.cpp",
    "mathops.cpp",
    "genotyper.cpp",
    "stutter_model.cpp",
    "region.cpp",
    "stringops.cpp",
    "zalgorithm.cpp",
    "debruijn_graph.cpp",
    "directed_graph.cpp",
    "base_quality.cpp",
    "pedigree.cpp",
    "haplotype_tracker.cpp",
    "snp_tree.cpp",
    "denovos/denovo_allele_priors.cpp",
    "denovos/trio_denovo_scanner.cpp",
    "denovos/denovo_scanner.cpp",
    "SeqAlignment/HapAligner.cpp",
    "SeqAlignment/Haplotype.cpp",
    "SeqAlignment/HapBlock.cpp",
    "SeqAlignment/NeedlemanWunsch.cpp",
    "SeqAlignment/StutterAlignerClass.cpp",
    "SeqAlignment/AlignmentTraceback.cpp",
    "SeqAlignment/HaplotypeGenerator.cpp",
]

_lib = None
_build_failed = False


def _build():
    srcs = [os.path.join(_REF_SRC, s) for s in _REF_SOURCES]
    cmd = [
        "g++", "-std=c++11", "-O2", "-fPIC", "-shared",
        # neutralize the htslib-backed headers (see stub_*.h)
        "-include", os.path.join(_DIR, "stub_bam_io.h"),
        "-include", os.path.join(_DIR, "stub_fasta_reader.h"),
        "-include", os.path.join(_DIR, "stub_vcf_layer.h"),
        "-I", _REF_SRC,
        "-I", _DIR,   # provides the spoa/ stub header
        # the reference Makefile builds with default FP behavior; keep it
        "-o", _LIB_PATH,
        os.path.join(_DIR, "wrapper.cc"),
        # real vcf_input.cpp with read_vcf_alleles renamed (see shim)
        os.path.join(_DIR, "vcf_input_shim.cc"), *srcs,
        "-ldl",   # spoa stub dlopens the production POA
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """The oracle library, or None if the reference tree/g++ is absent."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.isdir(_REF_SRC):
        _build_failed = True
        return None
    newest_src = max(
        (os.path.getmtime(os.path.join(_REF_SRC, s)) for s in _REF_SOURCES),
        default=0.0)
    wrapper_mtime = max(
        os.path.getmtime(os.path.join(_DIR, f)) for f in
        ("wrapper.cc", "stub_bam_io.h", "stub_fasta_reader.h",
         "stub_vcf_layer.h", "vcf_input_shim.cc",
         os.path.join("spoa", "spoa.hpp")))
    stale = (not os.path.exists(_LIB_PATH)
             or os.path.getmtime(_LIB_PATH) < max(newest_src, wrapper_mtime))
    if stale:
        try:
            _build()
        except Exception:
            if not os.path.exists(_LIB_PATH):
                _build_failed = True
                return None
    # The spoa stub's GenerateConsensus dlopens the PRODUCTION consensus
    # (ltr_poa_consensus) so rescue-path loci can be replayed through the
    # compiled reference chain with the same cluster-consensus function.
    try:
        from longtr_tpu import native as _ltr_native
        if _ltr_native.get_lib() is not None:
            os.environ.setdefault(
                "LONGTR_NATIVE_SO",
                os.path.join(os.path.dirname(_ltr_native.__file__),
                             "liblongtr_native.so"))
    except Exception:
        pass
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None

    f = ctypes.c_float
    d = ctypes.c_double
    i = ctypes.c_int
    i32p = ctypes.POINTER(ctypes.c_int32)
    fp = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    s = ctypes.c_char_p

    for name in ("ro_fastlog", "ro_fastexp", "ro_fasterlog", "ro_fasterexp"):
        fn = getattr(lib, name)
        fn.restype = f
        fn.argtypes = [f]
    for name in ("ro_fastlog_arr", "ro_fastexp_arr", "ro_fasterlog_arr",
                 "ro_fasterexp_arr"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [fp, fp, ctypes.c_long]

    lib.ro_int_log.restype = d
    lib.ro_int_log.argtypes = [i]
    lib.ro_log_sum_exp_vec.restype = d
    lib.ro_log_sum_exp_vec.argtypes = [dp, ctypes.c_long]
    lib.ro_log_sum_exp2.restype = d
    lib.ro_log_sum_exp2.argtypes = [d, d]
    lib.ro_log_sum_exp3.restype = d
    lib.ro_log_sum_exp3.argtypes = [d, d, d]
    lib.ro_fast_log_sum_exp2.restype = d
    lib.ro_fast_log_sum_exp2.argtypes = [d, d]
    lib.ro_fast_log_sum_exp_vec.restype = d
    lib.ro_fast_log_sum_exp_vec.argtypes = [dp, ctypes.c_long]

    lib.ro_stutter_log_pmf.restype = d
    lib.ro_stutter_log_pmf.argtypes = [d, d, d, d, d, d, i, i, i]

    lib.ro_z_prefix.restype = i
    lib.ro_z_prefix.argtypes = [s, s, ip, ctypes.c_long]
    lib.ro_z_suffix.restype = i
    lib.ro_z_suffix.argtypes = [s, s, ip, ctypes.c_long]

    lib.ro_db_kmer_length.restype = i
    lib.ro_db_kmer_length.argtypes = [s, i, i]
    lib.ro_db_paths.restype = i
    lib.ro_db_paths.argtypes = [i, s, s, i32p, i, d, i, i, i, s,
                                ctypes.c_long, i32p]

    lib.ro_hap_aligner_scores.restype = i
    lib.ro_hap_aligner_scores.argtypes = [
        s, ctypes.c_int32, s, s, i32p, i, ctypes.c_int32, i, s,
        d, d, d, d, d, d,
        s, s, ctypes.c_int32, ctypes.c_int32, s, i32p, i,
        i, i, fp, dp, ip]

    lib.ro_hap_enumeration.restype = i
    lib.ro_hap_enumeration.argtypes = [s, s, s, i32p, i, i, s, s,
                                       ctypes.c_long]

    lib.ro_stutter_align.restype = d
    lib.ro_stutter_align.argtypes = [s, i, d, d, d, d, d, d, s, dp, dp,
                                     i, i, i, ip]

    lib.ro_extract_cigar.restype = i
    lib.ro_extract_cigar.argtypes = [s, i32p, i, i, i, i, ip]

    lib.ro_snp_phasing.restype = i
    lib.ro_snp_phasing.argtypes = [i, s, i32p, s, i32p, i32p, i32p, s, i32p,
                                   i, i32p, s, s, dp, dp, i32p]

    lib.ro_em_train.restype = i
    lib.ro_em_train.argtypes = [i, s, i, i32p, i32p, dp, dp, i, i, d, d,
                                dp, dp, ip, dp, i32p, dp]

    lib.ro_set_genotyper_flags.restype = None
    lib.ro_set_genotyper_flags.argtypes = [i, i, i, i, i, i, i, f]
    lib.ro_set_ref_vcf_alleles.restype = None
    lib.ro_set_ref_vcf_alleles.argtypes = [ctypes.c_int32, s, i32p, i]
    lib.ro_clear_ref_vcf_alleles.restype = None
    lib.ro_clear_ref_vcf_alleles.argtypes = []
    lib.ro_extract_families.restype = i
    lib.ro_extract_families.argtypes = [s, s, i32p, i, s, ctypes.c_long]
    lib.ro_denovo_scan.restype = i
    lib.ro_denovo_scan.argtypes = [s, s, s, s, s, i, s, s, s, ctypes.c_long]
    lib.ro_check_phasing.restype = i
    lib.ro_check_phasing.argtypes = [s, s, s, s, s, ctypes.c_long]
    lib.ro_snp_vcf_factors.restype = i
    lib.ro_snp_vcf_factors.argtypes = [
        s, s, s, ctypes.c_int32, ctypes.c_int32, i, i32p, i32p, s, i32p,
        i, s, i32p, i32p, i32p,
        i, s, i32p, s, i32p, i32p, i32p, s, i32p,
        dp, dp, i32p, s, ctypes.c_long]

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ro_filter_reads.restype = i
    lib.ro_filter_reads.argtypes = [
        i, s, i32p, s, i32p, s, i32p, s, i32p, i32p, i32p, i32p, i32p,
        u8p, i32p, s, i32p, s, i32p, s, i32p, i64p, i64p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, s, i, i, d, d, i, i, i,
        i, s, i32p, s, i32p, s, ctypes.c_long]

    lib.ro_genotype_locus.restype = i
    lib.ro_genotype_locus.argtypes = [
        s, s, s, ctypes.c_int32, ctypes.c_int32, s, i, i, s, i32p, i32p,
        s, i32p, s, i32p, s, i32p, s, i32p, i32p, i32p,
        u8p, u8p, u8p,
        s, i32p, dp, dp, i32p, i32p,
        d, d, d, d, d, d,
        i, i, i, i, fp, i, i, i, d, i, s, i32p, s, ctypes.c_long]

    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# Convenience Python wrappers
# ---------------------------------------------------------------------------

def _i32arr(vals):
    a = np.ascontiguousarray(vals, dtype=np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def fast_fn_arr(name, x):
    """Vector fastapprox evaluation: name in {fastlog,fastexp,fasterlog,fasterexp}."""
    lib = get_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(x)
    getattr(lib, f"ro_{name}_arr")(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)
    return out


def log_sum_exp(vals):
    lib = get_lib()
    a = np.ascontiguousarray(vals, dtype=np.float64)
    return lib.ro_log_sum_exp_vec(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), a.size)


def fast_log_sum_exp(vals):
    lib = get_lib()
    a = np.ascontiguousarray(vals, dtype=np.float64)
    return lib.ro_fast_log_sum_exp_vec(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), a.size)


def stutter_log_pmf(params, period, sample_bps, read_bps):
    """params = (in_geom, in_up, in_down, out_geom, out_up, out_down)."""
    lib = get_lib()
    v = lib.ro_stutter_log_pmf(*[float(p) for p in params], period,
                               sample_bps, read_bps)
    if v > 0:
        raise ValueError("reference StutterModel rejected parameters")
    return v


def z_prefix(s1: str, s2: str):
    lib = get_lib()
    out = (ctypes.c_int * (len(s2) + 1))()
    n = lib.ro_z_prefix(s1.encode(), s2.encode(), out, len(s2) + 1)
    assert n >= 0
    return list(out[:n])


def z_suffix(s1: str, s2: str):
    lib = get_lib()
    out = (ctypes.c_int * (len(s2) + 1))()
    n = lib.ro_z_suffix(s1.encode(), s2.encode(), out, len(s2) + 1)
    assert n >= 0
    return list(out[:n])


def db_kmer_length(ref_seq: str, min_k=10, max_k=15):
    lib = get_lib()
    k = lib.ro_db_kmer_length(ref_seq.encode(), min_k, max_k)
    return None if k < 0 else k


def db_paths(k, ref_seq, seqs, min_edge_freq=0.02, min_weight_prune=2,
             min_weight_paths=2, max_paths=10):
    lib = get_lib()
    cat = "".join(seqs).encode()
    lens, lens_p = _i32arr([len(x) for x in seqs])
    cap = 1 << 20
    out = ctypes.create_string_buffer(cap)
    weights = np.zeros(max_paths + 1, dtype=np.int32)
    n = lib.ro_db_paths(k, ref_seq.encode(), cat, lens_p, len(seqs),
                        min_edge_freq, min_weight_prune, min_weight_paths,
                        max_paths, out, cap,
                        weights.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int32)))
    assert n >= 0, f"ro_db_paths failed: {n}"
    paths = []
    off = 0
    raw = out.raw
    for j in range(n):
        end = raw.index(b"\x00", off)
        paths.append((raw[off:end].decode(), int(weights[j])))
        off = end + 1
    return paths


def hap_aligner_scores(lflank, lflank_start, repeat_ref, alts, repeat_start,
                       period, rflank, stutter_params, read_seq, read_quals,
                       read_start, read_stop, cigar, indel_flank_len=5,
                       switch_old_align_len=0, aln_params=None):
    """Per-haplotype log-probs from the ACTUAL reference HapAligner.

    stutter_params = (in_geom, in_up, in_down, out_geom, out_up, out_down).
    cigar = [(op_char, length), ...] in expanded =/X/I/D form.
    Returns (probs array in reference enumeration order, seed_base).
    """
    lib = get_lib()
    alt_cat = "".join(alts).encode()
    alt_lens, alt_lens_p = _i32arr([len(a) for a in alts])
    ctypes_cigar_types = "".join(op for op, _ in cigar).encode()
    cig_lens, cig_lens_p = _i32arr([n for _, n in cigar])
    n_combs = 1 + len(alts)
    probs = np.zeros(n_combs, dtype=np.float64)
    seed = ctypes.c_int(-99)
    if aln_params is not None:
        ap = np.ascontiguousarray(aln_params, dtype=np.float32)
        ap_ptr = ap.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        ap_ptr = None
    rc = lib.ro_hap_aligner_scores(
        lflank.encode(), lflank_start, repeat_ref.encode(), alt_cat,
        alt_lens_p, len(alts), repeat_start, period, rflank.encode(),
        *[float(p) for p in stutter_params],
        read_seq.encode(), read_quals.encode(), read_start, read_stop,
        ctypes_cigar_types, cig_lens_p, len(cigar),
        indel_flank_len, switch_old_align_len, ap_ptr,
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(seed))
    assert rc == n_combs, f"ro_hap_aligner_scores failed: {rc}"
    return probs, seed.value


def hap_enumeration(lflank, repeat_ref, alts, period, rflank):
    """Haplotype sequences in reference Gray-code iteration order."""
    lib = get_lib()
    alt_cat = "".join(alts).encode()
    alt_lens, alt_lens_p = _i32arr([len(a) for a in alts])
    cap = 1 << 20
    out = ctypes.create_string_buffer(cap)
    n = lib.ro_hap_enumeration(lflank.encode(), repeat_ref.encode(), alt_cat,
                               alt_lens_p, len(alts), period, rflank.encode(),
                               out, cap)
    assert n > 0, f"ro_hap_enumeration failed: {n}"
    seqs = []
    off = 0
    raw = out.raw
    for _ in range(n):
        end = raw.index(b"\x00", off)
        seqs.append(raw[off:end].decode())
        off = end + 1
    return seqs


def stutter_align(block_seq, period, stutter_params, read_seq, log_wrong,
                  log_correct, j, artifact_size):
    """Reference StutterAlignerClass block score at read index j for a
    size-D artifact.  Returns (log_prob, best_pos)."""
    lib = get_lib()
    lw = np.ascontiguousarray(log_wrong, dtype=np.float64)
    lc = np.ascontiguousarray(log_correct, dtype=np.float64)
    pos = ctypes.c_int(-1)
    p = lib.ro_stutter_align(
        block_seq.encode(), period, *[float(x) for x in stutter_params],
        read_seq.encode(),
        lw.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(read_seq), j, artifact_size, ctypes.byref(pos))
    if p > 1e29:
        raise ValueError("ro_stutter_align error")
    return p, pos.value


def mode_b_left_matrix(lflank, lflank_start, repeat_ref, alts, repeat_start,
                       period, rflank, stutter_params, config_index,
                       seg_seq, log_wrong, log_correct):
    """Reference align_seq_to_hap_short matrices for one haplotype config.

    Returns (match, insert, del) arrays of shape (cur_size, seg_len) and
    l_prob."""
    lib = get_lib()
    lib.ro_mode_b_left_matrix.restype = ctypes.c_int
    alt_cat = "".join(alts).encode()
    alt_lens, alt_lens_p = _i32arr([len(a) for a in alts])
    L = len(seg_seq)
    max_size = (len(lflank) + max(len(repeat_ref), *(len(a) for a in alts))
                + len(rflank)) if alts else len(lflank) + len(repeat_ref) + len(rflank)
    mm = np.zeros(L * max_size + 8)
    im = np.zeros(L * max_size + 8)
    dm = np.zeros(L * max_size + 8)
    lw = np.ascontiguousarray(log_wrong, dtype=np.float64)
    lc = np.ascontiguousarray(log_correct, dtype=np.float64)
    lp = ctypes.c_double(0)
    dp = ctypes.POINTER(ctypes.c_double)
    hapsize = lib.ro_mode_b_left_matrix(
        lflank.encode(), ctypes.c_int32(lflank_start), repeat_ref.encode(),
        alt_cat, alt_lens_p, len(alts), ctypes.c_int32(repeat_start),
        period, rflank.encode(),
        *[ctypes.c_double(float(p)) for p in stutter_params],
        config_index, seg_seq.encode(),
        lw.ctypes.data_as(dp), lc.ctypes.data_as(dp), L,
        mm.ctypes.data_as(dp), im.ctypes.data_as(dp), dm.ctypes.data_as(dp),
        ctypes.byref(lp))
    assert hapsize > 0, f"ro_mode_b_left_matrix failed: {hapsize}"
    shape = (hapsize, L)
    return (mm[:L * hapsize].reshape(shape), im[:L * hapsize].reshape(shape),
            dm[:L * hapsize].reshape(shape), lp.value)


def posteriors(LL, log_p1, log_p2, read_counts, haploid):
    """Reference Genotyper::calc_log_sample_posteriors.

    LL: (R, A) with reads of sample i contiguous (read_counts[i] each).
    Returns (P (S,A,A), totals (S,), total_ll)."""
    lib = get_lib()
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ro_posteriors.restype = ctypes.c_double
    LL = np.ascontiguousarray(LL, dtype=np.float64)
    R, A = LL.shape
    S = len(read_counts)
    rc, rc_p = _i32arr(read_counts)
    p1 = np.ascontiguousarray(log_p1, dtype=np.float64)
    p2 = np.ascontiguousarray(log_p2, dtype=np.float64)
    out_post = np.zeros(S * A * A)
    out_tot = np.zeros(S)
    total = lib.ro_posteriors(
        A, S, int(haploid), rc_p, LL.ctypes.data_as(dp),
        p1.ctypes.data_as(dp), p2.ctypes.data_as(dp),
        out_post.ctypes.data_as(dp), out_tot.ctypes.data_as(dp))
    assert total < 1e29, "ro_posteriors failed"
    return out_post.reshape(S, A, A), out_tot, total


def extract_gls(LL, log_p1, log_p2, read_counts, haploid, num_variants,
                hap_to_allele):
    """Reference extract_genotypes_and_likelihoods (GLs + MAP + GLDIFF)."""
    lib = get_lib()
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ro_extract_gls.restype = ctypes.c_int
    LL = np.ascontiguousarray(LL, dtype=np.float64)
    R, A = LL.shape
    S = len(read_counts)
    rc, rc_p = _i32arr(read_counts)
    h2a, h2a_p = _i32arr(hap_to_allele)
    p1 = np.ascontiguousarray(log_p1, dtype=np.float64)
    p2 = np.ascontiguousarray(log_p2, dtype=np.float64)
    V = num_variants
    gls_stride = V * (V + 1) // 2 if not haploid else V
    best_haps = np.zeros(2 * S, dtype=np.int32)
    best_gts = np.zeros(2 * S, dtype=np.int32)
    gls = np.zeros((S, gls_stride))
    gl_diffs = np.zeros(S)
    phased = np.zeros(S)
    unphased = np.zeros(S)
    n = lib.ro_extract_gls(
        A, S, int(haploid), rc_p, LL.ctypes.data_as(dp),
        p1.ctypes.data_as(dp), p2.ctypes.data_as(dp), V, h2a_p,
        best_haps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        best_gts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gls.ctypes.data_as(dp), gls_stride, gl_diffs.ctypes.data_as(dp),
        phased.ctypes.data_as(dp), unphased.ctypes.data_as(dp))
    assert n >= 0, "ro_extract_gls failed"
    return {"best_haps": best_haps.reshape(S, 2),
            "best_gts": best_gts.reshape(S, 2), "gls": gls,
            "gl_diffs": gl_diffs, "log_phased": phased,
            "log_unphased": unphased, "n_gls": n}


def nw_align(ref_seq: str, read_seq: str, left_align=False,
             use_ref_end_penalty=False):
    """Reference NeedlemanWunsch::Align / LeftAlign.

    Returns (ok, ref_al, read_al, score, cigar_str) — cigar as text like
    '35=2D35='."""
    lib = get_lib()
    lib.ro_nw_align.restype = ctypes.c_int
    score = ctypes.c_float(0)
    cap = 4 * (len(ref_seq) + len(read_seq)) + 64
    out = ctypes.create_string_buffer(cap)
    rc = lib.ro_nw_align(ref_seq.encode(), read_seq.encode(),
                         int(left_align), int(use_ref_end_penalty),
                         ctypes.byref(score), out, cap)
    assert rc >= 0, f"ro_nw_align failed: {rc}"
    if rc == 0:
        return False, "", "", 0.0, ""
    raw = out.raw
    e1 = raw.index(b"\x00")
    e2 = raw.index(b"\x00", e1 + 1)
    e3 = raw.index(b"\x00", e2 + 1)
    return (True, raw[:e1].decode(), raw[e1 + 1:e2].decode(), score.value,
            raw[e2 + 1:e3].decode())


def hapgen_blocks(chrom_seq, region_start, region_end, motif, reads_by_sample,
                  indel_flank_len=5):
    """Reference HaplotypeGenerator.add_haplotype_block + fuse.

    reads_by_sample: list (per sample) of
    (seq, aln_str, start, stop, cigar_text) where aln_str carries '-' for
    deletions (AlignmentData.h alignment string).
    Returns list of (start, end, [seq, ...], [inexact, ...]) or a
    'FAIL:<msg>' string."""
    lib = get_lib()
    lib.ro_hapgen_blocks.restype = ctypes.c_int
    counts = [len(r) for r in reads_by_sample]
    flat = [x for r in reads_by_sample for x in r]
    seq_cat = "".join(x[0] for x in flat).encode()
    seq_lens, seq_lens_p = _i32arr([len(x[0]) for x in flat])
    aln_cat = "".join(x[1] for x in flat).encode()
    aln_lens, aln_lens_p = _i32arr([len(x[1]) for x in flat])
    starts, starts_p = _i32arr([x[2] for x in flat])
    stops, stops_p = _i32arr([x[3] for x in flat])
    cig_cat = "".join(x[4] for x in flat).encode()
    cig_lens, cig_lens_p = _i32arr([len(x[4]) for x in flat])
    rc_arr, rc_p = _i32arr(counts)
    cap = 1 << 20
    out = ctypes.create_string_buffer(cap)
    n = lib.ro_hapgen_blocks(
        chrom_seq.encode(), ctypes.c_int32(region_start),
        ctypes.c_int32(region_end), motif.encode(), len(motif),
        len(reads_by_sample), rc_p, seq_cat, seq_lens_p, aln_cat,
        aln_lens_p, starts_p, stops_p,
        cig_cat, cig_lens_p, indel_flank_len, out, cap)
    assert n >= 0, f"ro_hapgen_blocks failed: {n}"
    raw = out.raw
    if n == 0:
        return raw[: raw.index(b"\x00")].decode()
    blocks = []
    off = 0
    for _ in range(n):
        end = raw.index(b"\x00", off)
        rec = raw[off:end].decode()
        off = end + 1
        headseqs = rec.split("|")
        b_start, b_end = (int(v) for v in headseqs[0].split(","))
        seqs = [s.rstrip("*") for s in headseqs[1:]]
        inexact = [s.endswith("*") for s in headseqs[1:]]
        blocks.append((b_start, b_end, seqs, inexact))
    return blocks


def extract_cigar(cigar, cigar_start, region_start, region_end):
    """Reference ExtractCigar (extract_indels.cpp:18-91).

    cigar = [(op_char, length), ...].  Returns (ok, bp_diff)."""
    lib = get_lib()
    types = "".join(op for op, _ in cigar).encode()
    nums, nums_p = _i32arr([n for _, n in cigar])
    diff = ctypes.c_int(0)
    rc = lib.ro_extract_cigar(types, nums_p, len(cigar), cigar_start,
                              region_start, region_end, ctypes.byref(diff))
    assert rc >= 0, "ro_extract_cigar failed"
    return bool(rc), diff.value


def snp_phasing(reads, snps):
    """Reference calc_het_snp_factors (snp_phasing_quality.cpp:4-120).

    reads: list of (bases, quals, position, end_position, cigar_text) where
    end_position is the non-inclusive reference end and cigar_text is
    '10=2D5='-style.  snps: list of (pos, base_one, base_two).
    Returns (log_p1s, log_p2s, match_count, mismatch_count)."""
    lib = get_lib()
    n = len(reads)
    bases_cat = "".join(r[0] for r in reads).encode()
    base_lens, base_lens_p = _i32arr([len(r[0]) for r in reads])
    quals_cat = "".join(r[1] for r in reads).encode()
    qual_lens, qual_lens_p = _i32arr([len(r[1]) for r in reads])
    pos_arr, pos_p = _i32arr([r[2] for r in reads])
    end_arr, end_p = _i32arr([r[3] for r in reads])
    cig_cat = "".join(r[4] for r in reads).encode()
    cig_lens, cig_lens_p = _i32arr([len(r[4]) for r in reads])
    snp_pos, snp_pos_p = _i32arr([x[0] for x in snps])
    b1 = "".join(x[1] for x in snps).encode()
    b2 = "".join(x[2] for x in snps).encode()
    p1 = np.zeros(n)
    p2 = np.zeros(n)
    counts = np.zeros(2, dtype=np.int32)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.ro_snp_phasing(
        n, bases_cat, base_lens_p, quals_cat, qual_lens_p, pos_p, end_p,
        cig_cat, cig_lens_p, len(snps), snp_pos_p, b1, b2,
        p1.ctypes.data_as(dp), p2.ctypes.data_as(dp),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert rc == n, f"ro_snp_phasing failed: {rc}"
    return p1, p2, int(counts[0]), int(counts[1])


def check_phasing(fam_path: str, snp_vcf_path: str, region_path: str,
                  out_path: str) -> int:
    """Reference PhasingChecker drive (check_phasing.cpp:129-226): the
    PASS/FAIL + diploid-edit-distance table written as PLAIN text at
    out_path (stub bgzfostream).  snp_vcf_path must be a PLAIN-TEXT VCF.
    Returns the number of region rows written."""
    lib = get_lib()
    err = ctypes.create_string_buffer(1 << 16)
    rc = lib.ro_check_phasing(fam_path.encode(), snp_vcf_path.encode(),
                              region_path.encode(), out_path.encode(),
                              err, len(err))
    if rc < 0:
        raise RuntimeError(err.value.decode())
    return rc


def snp_vcf_factors(snp_vcf_path, chrom, group_start, group_stop, regions,
                    rg_reads, fam_path=""):
    """The reference's WHOLE --snp-vcf phasing path (snp_tree.cpp
    create_snp_trees + snp_bam_processor.cpp:52-92 calc_het_snp_factors,
    with optional --fam pedigree filtering through a real
    HaplotypeTracker).

    regions: list of (start, stop, motif) for the locus group (the
    skip-region set).  rg_reads: list of (rg_name, paired, mates,
    unpaired) with len(mates) == len(paired); each read is (bases, quals,
    pos, end_pos, cigar_text) like snp_phasing().  snp_vcf_path must be a
    PLAIN-TEXT VCF (stub reader).  Returns (log_p1s, log_p2s,
    got_snp_info) with per-RG lists ordered paired-then-unpaired."""
    lib = get_lib()
    flat = []
    n_paired, n_unpaired, names = [], [], []
    for name, paired, mates, unpaired in rg_reads:
        assert len(mates) == len(paired)
        names.append(name)
        n_paired.append(len(paired))
        n_unpaired.append(len(unpaired))
        flat += list(paired) + list(mates) + list(unpaired)
    n = len(flat)
    bases_cat = "".join(r[0] for r in flat).encode()
    _bl, base_lens_p = _i32arr([len(r[0]) for r in flat])
    quals_cat = "".join(r[1] for r in flat).encode()
    _ql, qual_lens_p = _i32arr([len(r[1]) for r in flat])
    _pa, pos_p = _i32arr([r[2] for r in flat])
    _ea, end_p = _i32arr([r[3] for r in flat])
    cig_cat = "".join(r[4] for r in flat).encode()
    _cl, cig_lens_p = _i32arr([len(r[4]) for r in flat])
    _rs, rstarts_p = _i32arr([r[0] for r in regions])
    _rp, rstops_p = _i32arr([r[1] for r in regions])
    motifs_cat = "".join(r[2] for r in regions).encode()
    _ml, motif_lens_p = _i32arr([len(r[2]) for r in regions])
    names_cat = "".join(names).encode()
    _nl, name_lens_p = _i32arr([len(x) for x in names])
    _np_, npaired_p = _i32arr(n_paired)
    _nu, nunpaired_p = _i32arr(n_unpaired)
    n_out = sum(n_paired) + sum(n_unpaired)
    p1 = np.zeros(max(n_out, 1))
    p2 = np.zeros(max(n_out, 1))
    flags = np.zeros(2, dtype=np.int32)
    err = ctypes.create_string_buffer(1 << 16)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.ro_snp_vcf_factors(
        snp_vcf_path.encode(), fam_path.encode(), chrom.encode(),
        group_start, group_stop, len(regions), rstarts_p, rstops_p,
        motifs_cat, motif_lens_p,
        len(names), names_cat, name_lens_p, npaired_p, nunpaired_p,
        n, bases_cat, base_lens_p, quals_cat, qual_lens_p, pos_p, end_p,
        cig_cat, cig_lens_p,
        p1.ctypes.data_as(dp), p2.ctypes.data_as(dp),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        err, len(err))
    if rc < 0:
        raise RuntimeError(err.value.decode())
    assert rc == n_out, (rc, n_out)
    out1, out2, idx = [], [], 0
    for k in range(len(names)):
        cnt = n_paired[k] + n_unpaired[k]
        out1.append([float(x) for x in p1[idx: idx + cnt]])
        out2.append([float(x) for x in p2[idx: idx + cnt]])
        idx += cnt
    return out1, out2, bool(flags[0])


def em_train(haploid, motif, num_bps, log_p1s, log_p2s, ref_allele,
             max_iter=100, min_ll_abs_change=0.01, min_ll_frac_change=0.001,
             want_posteriors=False):
    """Reference EMStutterGenotyper::train (em_stutter_genotyper.cpp:170-226).

    num_bps/log_p1s/log_p2s: per-sample lists of per-read values.
    Returns dict with converged, n_iter, ll_traj (bit-exact per-iteration
    E-step LLs), params (in_geom,in_up,in_down,out_geom,out_up,out_down),
    num_alleles, and optionally log posteriors (S,A,A)."""
    lib = get_lib()
    counts, counts_p = _i32arr([len(x) for x in num_bps])
    bps, bps_p = _i32arr([v for s in num_bps for v in s])
    p1 = np.ascontiguousarray([v for s in log_p1s for v in s], dtype=np.float64)
    p2 = np.ascontiguousarray([v for s in log_p2s for v in s], dtype=np.float64)
    traj = np.zeros(max_iter + 1)
    params = np.zeros(6)
    S = len(num_bps)
    max_alleles = len(set(v for s in num_bps for v in s)) + 1
    posts = (np.zeros(S * max_alleles * max_alleles + max_alleles + 6)
             if want_posteriors else None)
    converged = ctypes.c_int(0)
    num_alleles = ctypes.c_int32(0)
    dp = ctypes.POINTER(ctypes.c_double)
    R = int(counts.sum())
    phase = (np.zeros(R * max_alleles * max_alleles * 2)
             if want_posteriors else None)
    rc = lib.ro_em_train(
        int(haploid), motif.encode(), S, counts_p, bps_p,
        p1.ctypes.data_as(dp), p2.ctypes.data_as(dp), ref_allele,
        max_iter, min_ll_abs_change, min_ll_frac_change,
        traj.ctypes.data_as(dp), params.ctypes.data_as(dp),
        ctypes.byref(converged),
        posts.ctypes.data_as(dp) if posts is not None else None,
        ctypes.byref(num_alleles),
        phase.ctypes.data_as(dp) if phase is not None else None)
    assert rc >= 0, f"ro_em_train failed: {rc}"
    out = {"converged": bool(converged.value), "n_iter": rc,
           "ll_traj": traj[:rc].copy(), "params": params,
           "num_alleles": num_alleles.value}
    if want_posteriors and converged.value:
        A = num_alleles.value
        out["log_posteriors"] = posts[:S * A * A].reshape(S, A, A).copy()
        n = S * A * A
        out["iter1_priors"] = posts[n:n + A].copy()
        out["iter1_params"] = posts[n + A:n + A + 6].copy()
        out["iter1_phase"] = phase[:R * A * A * 2].reshape(R, A, A, 2).copy()
    return out


def set_genotyper_flags(gls=0, pls=0, phased_gls=0, allreads=0, mallreads=0,
                        filters=0, hap_data=0, max_flank_indel_frac=0.15):
    get_lib().ro_set_genotyper_flags(gls, pls, phased_gls, allreads,
                                     mallreads, filters, hap_data,
                                     ctypes.c_float(max_flank_indel_frac))


def genotype_locus(chrom_seq, chrom_name, region_start, region_end, motif,
                   reads_by_sample, sample_names, stutter_params,
                   haploid=False, n_p1s=None, n_p2s=None, skip_assembly=True,
                   reassemble_flanks=False, indel_flank_len=5,
                   switch_old_align_len=0, aln_params=None,
                   max_total_haplotypes=1000, max_flank_haplotypes=4,
                   min_flank_freq=0.01, vcf_sample_names=None,
                   region_name="", ref_vcf=None):
    """Full reference genotyping + VCF emission
    (seq_stutter_genotyper.cpp ctor -> genotype() -> write_vcf_record).

    reads_by_sample: per sample, list of read dicts with keys
    seq, quals, aln (alignment string with '-'), name, start, stop,
    cigar ('10=2D5=' text), rev (bool), use_for_haps (bool, default True),
    log_p1, log_p2 (default 0.0).
    Returns (records, logger_text) where records is a list of
    (pos, record_text); records is empty if genotyping failed."""
    lib = get_lib()
    S = len(reads_by_sample)
    assert S == len(sample_names)
    flat = [r for sample in reads_by_sample for r in sample]
    counts, counts_p = _i32arr([len(s) for s in reads_by_sample])
    if vcf_sample_names is None:
        n_vcf, vname_cat, vname_lens_p = 0, b"", None
    else:
        n_vcf = len(vcf_sample_names)
        vname_cat = "".join(vcf_sample_names).encode()
        _vl, vname_lens_p = _i32arr([len(s) for s in vcf_sample_names])
    name_cat = "".join(s for s in sample_names).encode()
    name_lens, name_lens_p = _i32arr([len(s) for s in sample_names])

    def cat_lens(key):
        c = "".join(r[key] for r in flat).encode()
        lens, lens_p = _i32arr([len(r[key]) for r in flat])
        return c, lens, lens_p

    seq_cat, _sl, seq_lens_p = cat_lens("seq")
    qual_cat, _ql, qual_lens_p = cat_lens("quals")
    aln_cat, _al, aln_lens_p = cat_lens("aln")
    rname_cat, _rl, rname_lens_p = cat_lens("name")
    cig_cat, _cl, cig_lens_p = cat_lens("cigar")
    starts, starts_p = _i32arr([r["start"] for r in flat])
    stops, stops_p = _i32arr([r["stop"] for r in flat])
    rev = np.ascontiguousarray([1 if r.get("rev") else 0 for r in flat],
                               dtype=np.uint8)
    dele = np.ascontiguousarray([1 if r.get("deleted") else 0 for r in flat],
                                dtype=np.uint8)
    ufh = np.ascontiguousarray(
        [1 if r.get("use_for_haps", True) else 0 for r in flat],
        dtype=np.uint8)
    p1 = np.ascontiguousarray([r.get("log_p1", 0.0) for r in flat],
                              dtype=np.float64)
    p2 = np.ascontiguousarray([r.get("log_p2", 0.0) for r in flat],
                              dtype=np.float64)
    np1, np1_p = _i32arr(n_p1s if n_p1s is not None else [0] * S)
    np2, np2_p = _i32arr(n_p2s if n_p2s is not None else [0] * S)
    if aln_params is not None:
        ap = np.ascontiguousarray(aln_params, dtype=np.float32)
        ap_ptr = ap.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n_ap = len(aln_params)
    else:
        ap_ptr, n_ap = None, 0
    cap = 1 << 22
    out = ctypes.create_string_buffer(cap)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    dp = ctypes.POINTER(ctypes.c_double)
    # --ref-vcf replay: inject the (pos, alleles) the pipeline's
    # read_vcf_alleles produced; a dummy non-NULL reader routes
    # build_haplotype down add_vcf_haplotype_block
    if ref_vcf is not None:
        rv_pos, rv_alleles = ref_vcf
        rv_cat = "".join(rv_alleles).encode()
        _rvl, rv_lens_p = _i32arr([len(a) for a in rv_alleles])
        lib.ro_set_ref_vcf_alleles(int(rv_pos), rv_cat, rv_lens_p,
                                   len(rv_alleles))
    try:
        rc = _call_genotype_locus(
            lib, chrom_seq, chrom_name, region_name, region_start,
            region_end, motif, haploid, S, name_cat, name_lens_p, counts_p,
            seq_cat, seq_lens_p, qual_cat, qual_lens_p, aln_cat, aln_lens_p,
            rname_cat, rname_lens_p, starts_p, stops_p, rev, dele, ufh,
            cig_cat, cig_lens_p, p1, p2, np1_p, np2_p, stutter_params,
            skip_assembly, reassemble_flanks, indel_flank_len,
            switch_old_align_len, ap_ptr, n_ap, max_total_haplotypes,
            max_flank_haplotypes, min_flank_freq, n_vcf, vname_cat,
            vname_lens_p, out, cap, u8p, dp)
    finally:
        if ref_vcf is not None:
            lib.ro_clear_ref_vcf_alleles()
    raw = out.raw
    end = raw.index(b"\x00")
    logger_text = raw[:end].decode()
    assert rc >= 0, f"ro_genotype_locus failed ({rc}): {logger_text[:2000]}"
    records = []
    off = end + 1
    for _ in range(rc):
        end = raw.index(b"\x00", off)
        rec = raw[off:end].decode()
        off = end + 1
        pos_s, text = rec.split("\t", 1)
        records.append((int(pos_s), text))
    return records, logger_text


def _call_genotype_locus(lib, chrom_seq, chrom_name, region_name,
                         region_start, region_end, motif, haploid, S,
                         name_cat, name_lens_p, counts_p, seq_cat,
                         seq_lens_p, qual_cat, qual_lens_p, aln_cat,
                         aln_lens_p, rname_cat, rname_lens_p, starts_p,
                         stops_p, rev, dele, ufh, cig_cat, cig_lens_p, p1,
                         p2, np1_p, np2_p, stutter_params, skip_assembly,
                         reassemble_flanks, indel_flank_len,
                         switch_old_align_len, ap_ptr, n_ap,
                         max_total_haplotypes, max_flank_haplotypes,
                         min_flank_freq, n_vcf, vname_cat, vname_lens_p,
                         out, cap, u8p, dp):
    return lib.ro_genotype_locus(
        chrom_seq.encode(), chrom_name.encode(), region_name.encode(),
        region_start, region_end,
        motif.encode(), int(haploid), S, name_cat, name_lens_p, counts_p,
        seq_cat, seq_lens_p, qual_cat, qual_lens_p, aln_cat, aln_lens_p,
        rname_cat, rname_lens_p, starts_p, stops_p,
        rev.ctypes.data_as(u8p), dele.ctypes.data_as(u8p),
        ufh.ctypes.data_as(u8p),
        cig_cat, cig_lens_p, p1.ctypes.data_as(dp), p2.ctypes.data_as(dp),
        np1_p, np2_p, *[float(x) for x in stutter_params],
        int(skip_assembly), int(reassemble_flanks), indel_flank_len,
        switch_old_align_len, ap_ptr, n_ap, max_total_haplotypes,
        max_flank_haplotypes, min_flank_freq, n_vcf, vname_cat,
        vname_lens_p, out, cap)


_I64_ABSENT = -(2 ** 62)


def filter_reads(reads, region_start, region_end, motif, rg_to_sample,
                 require_spanning=1, require_paired=0, min_mapq=20.0,
                 min_sum_qual=30.0, min_flank=5, max_total_reads=1_000_000,
                 use_bam_rgs=True):
    """Reference read_and_filter_reads (bam_processor.cpp:188-487).

    reads: list of dicts with keys seq, qual, name, cigar ('10=..' text),
    pos, end_pos (exclusive), mate_pos, mapq, paired, mapped, first_mate,
    file (int index -> filename 'F<i>'), and optional rg, xa, sa (strings),
    as_score, xs_score (ints).  rg_to_sample: {key: sample} where key is
    'F<i>' + rg (use_bam_rgs) or 'F<i>'.

    Returns (groups, too_many) where groups is a list of
    (rg_name, paired [(read_idx, mate_idx, pf)], unpaired [(read_idx, pf)]).
    """
    lib = get_lib()
    n = len(reads)

    def cat(key, default=""):
        c = "".join(r.get(key, default) for r in reads).encode()
        lens, lens_p = _i32arr([len(r.get(key, default)) for r in reads])
        return c, lens, lens_p

    seq_c, _a, seq_p = cat("seq")
    qual_c, _b, qual_p = cat("qual")
    name_c, _c, name_p = cat("name")
    cig_c, _d, cig_p = cat("cigar")
    rg_c, _e, rg_p = cat("rg")
    xa_c, _f, xa_p = cat("xa")
    sa_c, _g, sa_p = cat("sa")
    pos, pos_p = _i32arr([r["pos"] for r in reads])
    endp, endp_p = _i32arr([r["end_pos"] for r in reads])
    matep, matep_p = _i32arr([r.get("mate_pos", 0) for r in reads])
    mapq, mapq_p = _i32arr([r.get("mapq", 60) for r in reads])
    filei, filei_p = _i32arr([r.get("file", 0) for r in reads])
    fl = np.ascontiguousarray(
        [(1 if r.get("paired") else 0) | (2 if r.get("mapped", True) else 0)
         | (4 if r.get("first_mate", True) else 0) for r in reads],
        dtype=np.uint8)
    asx = np.ascontiguousarray(
        [r.get("as_score", _I64_ABSENT) for r in reads], dtype=np.int64)
    xsx = np.ascontiguousarray(
        [r.get("xs_score", _I64_ABSENT) for r in reads], dtype=np.int64)

    keys = list(rg_to_sample)
    key_c = "".join(keys).encode()
    _k, key_p = _i32arr([len(k) for k in keys])
    val_c = "".join(rg_to_sample[k] for k in keys).encode()
    _v, val_p = _i32arr([len(rg_to_sample[k]) for k in keys])

    cap = 1 << 20
    out = ctypes.create_string_buffer(cap)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.ro_filter_reads(
        n, seq_c, seq_p, qual_c, qual_p, name_c, name_p, cig_c, cig_p,
        pos_p, endp_p, matep_p, mapq_p, fl.ctypes.data_as(u8p), filei_p,
        rg_c, rg_p, xa_c, xa_p, sa_c, sa_p,
        asx.ctypes.data_as(i64p), xsx.ctypes.data_as(i64p), _I64_ABSENT,
        region_start, region_end, motif.encode(), require_spanning,
        require_paired, float(min_mapq), float(min_sum_qual), min_flank,
        max_total_reads, int(use_bam_rgs), len(keys), key_c, key_p, val_c,
        val_p, out, cap)
    raw = out.raw
    text = raw[:raw.index(b"\x00")].decode()
    assert rc >= 0, f"ro_filter_reads failed ({rc}): {text[:1000]}"
    lines = text.split("\n")
    too_many = lines[-1] == "TOO_MANY=1"
    groups = []
    for ln in lines[:-1]:
        if not ln:
            continue
        name, p_part, u_part = ln.split("\t")
        paired = []
        for ent in p_part.split(" ")[1:]:
            idx, midx, pf = ent.split(":")
            paired.append((int(idx), int(midx), pf))
        unpaired = []
        for ent in u_part.split(" ")[1:]:
            idx, pf = ent.split(":")
            unpaired.append((int(idx), pf))
        groups.append((name, paired, unpaired))
    return groups, too_many


# ---------------------------------------------------------------------------
# Trim oracle: a SEPARATE shared library compiling the reference's bam_io.cpp
# against stub htslib headers (stub_htslib/), built with hidden visibility so
# its real BamAlignment cannot cross-bind with the main oracle's stub.
# ---------------------------------------------------------------------------

_TRIM_LIB_PATH = os.path.join(_DIR, "libref_trim.so")
_trim_lib = None
_trim_failed = False


_TRIM_SOURCES = [
    "bam_io.cpp",
    "bam_processor.cpp",
    "snp_bam_processor.cpp",
    "genotyper_bam_processor.cpp",
    "pcr_duplicates.cpp",
    "snp_phasing_quality.cpp",
    "seq_stutter_genotyper.cpp",
    "em_stutter_genotyper.cpp",
    "extract_indels.cpp",
    "read_pooler.cpp",
    "mathops.cpp",
    "genotyper.cpp",
    "stutter_model.cpp",
    "region.cpp",
    "stringops.cpp",
    "zalgorithm.cpp",
    "debruijn_graph.cpp",
    "directed_graph.cpp",
    "base_quality.cpp",
    # snp_bam_processor.cpp references the real tracker since the round-4
    # snp_tree work (stub_vcf_layer.h no longer stubs it); without this the
    # .so builds but fails to LOAD (undefined HaplotypeTracker::advance)
    # and every trim-parity test silently skips.  create_snp_trees itself
    # stays stubbed by wrapper_trim.cc.
    "haplotype_tracker.cpp",
    "SeqAlignment/HapAligner.cpp",
    "SeqAlignment/Haplotype.cpp",
    "SeqAlignment/HapBlock.cpp",
    "SeqAlignment/NeedlemanWunsch.cpp",
    "SeqAlignment/StutterAlignerClass.cpp",
    "SeqAlignment/AlignmentTraceback.cpp",
    "SeqAlignment/HaplotypeGenerator.cpp",
]


def _build_trim():
    cmd = [
        "g++", "-std=c++11", "-O2", "-fPIC", "-shared",
        "-fvisibility=hidden", "-fvisibility-inlines-hidden",
        "-include", os.path.join(_DIR, "stub_fasta_reader.h"),
        "-include", os.path.join(_DIR, "stub_vcf_layer.h"),
        "-I", os.path.join(_DIR, "stub_htslib"),
        "-I", _REF_SRC,
        "-I", _DIR,
        "-o", _TRIM_LIB_PATH,
        os.path.join(_DIR, "wrapper_trim.cc"),
        *[os.path.join(_REF_SRC, s) for s in _TRIM_SOURCES],
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_trim_lib():
    """The trim oracle, or None if unavailable."""
    global _trim_lib, _trim_failed
    if _trim_lib is not None:
        return _trim_lib
    if _trim_failed:
        return None
    if not os.path.isdir(_REF_SRC):
        _trim_failed = True
        return None
    wrapper = os.path.join(_DIR, "wrapper_trim.cc")
    srcs = [wrapper, os.path.join(_REF_SRC, "bam_io.cpp"),
            os.path.join(_REF_SRC, "bam_io.h")]
    newest = max(os.path.getmtime(p) for p in srcs)
    if (not os.path.exists(_TRIM_LIB_PATH)
            or os.path.getmtime(_TRIM_LIB_PATH) < newest):
        try:
            _build_trim()
        except Exception:
            if not os.path.exists(_TRIM_LIB_PATH):
                _trim_failed = True
                return None
    try:
        lib = ctypes.CDLL(_TRIM_LIB_PATH)
    except OSError:
        # a stale .so from an older source list can fail to load with
        # undefined symbols even though it builds: rebuild once and retry
        try:
            _build_trim()
            lib = ctypes.CDLL(_TRIM_LIB_PATH)
        except Exception:
            _trim_failed = True
            return None
    i32 = ctypes.c_int32
    lib.rt_trim_alignment.restype = ctypes.c_int
    lib.rt_trim_alignment.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, i32, i32, i32,
        i32, ctypes.POINTER(i32), ctypes.POINTER(i32), ctypes.POINTER(i32),
        ctypes.POINTER(i32), ctypes.c_char_p, ctypes.c_long]
    _trim_lib = lib
    return _trim_lib


def trim_alignment(seq, quals, cigar, pos, end_pos, min_read_start,
                   max_read_stop):
    """Reference BamAlignment::TrimAlignment (bam_io.cpp:267-372).

    cigar = [(op, n), ...].  Returns dict(pos, end_pos, length, deleted,
    seq, quals, cigar) with cigar as [(op, n), ...]."""
    lib = get_trim_lib()
    cig_text = "".join(f"{n}{op}" for op, n in cigar).encode()
    i32 = ctypes.c_int32
    out_pos, out_end, out_len, out_del = i32(0), i32(0), i32(0), i32(0)
    cap = 4 * (len(seq) + len(cigar) * 8) + 64
    out = ctypes.create_string_buffer(cap)
    rc = lib.rt_trim_alignment(
        seq.encode(), quals.encode(), cig_text, pos, end_pos,
        min_read_start, max_read_stop, ctypes.byref(out_pos),
        ctypes.byref(out_end), ctypes.byref(out_len), ctypes.byref(out_del),
        out, cap)
    raw = out.raw
    if rc < 0:
        raise AssertionError(
            f"rt_trim_alignment failed ({rc}): "
            f"{raw[:raw.index(b'__')] if b'__' in raw else raw[:200]}")
    e1 = raw.index(b"\x00")
    e2 = raw.index(b"\x00", e1 + 1)
    e3 = raw.index(b"\x00", e2 + 1)
    import re as _re
    cig_out = [(op, int(n)) for n, op in
               _re.findall(r"(\d+)([=XIDSHM])", raw[e2 + 1:e3].decode())]
    return dict(pos=out_pos.value, end_pos=out_end.value,
                length=out_len.value, deleted=bool(out_del.value),
                seq=raw[:e1].decode(), quals=raw[e1 + 1:e2].decode(),
                cigar=cig_out)


def remove_pcr_dups(paired, unpaired):
    """Reference remove_pcr_duplicates (pcr_duplicates.cpp:18-96), one RG.

    paired: list of dicts(name, pos1, pos2, qual1, qual2, library);
    unpaired: list of dicts(name, pos, qual, library).
    Returns (paired_out [(a_id, b_id)], unpaired_out [ids]) where ids index
    the virtual flat list: paired aln-one = i, its mate = n_paired + i,
    unpaired = 2*n_paired + i."""
    lib = get_lib()
    lib.ro_remove_pcr_dups.restype = ctypes.c_int
    n_p, n_u = len(paired), len(unpaired)

    def cat(items, key):
        c = "".join(x[key] for x in items).encode()
        lens, lens_p = _i32arr([len(x[key]) for x in items])
        return c, lens, lens_p

    pn_c, _1, pn_p = cat(paired, "name")
    q1_c, _2, q1_p = cat(paired, "qual1")
    q2_c, _3, q2_p = cat(paired, "qual2")
    un_c, _4, un_p = cat(unpaired, "name")
    uq_c, _5, uq_p = cat(unpaired, "qual")
    pos1, pos1_p = _i32arr([x["pos1"] for x in paired])
    pos2, pos2_p = _i32arr([x["pos2"] for x in paired])
    upos, upos_p = _i32arr([x["pos"] for x in unpaired])
    libs = [x["library"] for x in paired] + [x["library"] for x in unpaired]
    lib_c = "".join(libs).encode()
    _6, lib_p = _i32arr([len(x) for x in libs])
    cap = 1 << 20
    out = ctypes.create_string_buffer(cap)
    rc = lib.ro_remove_pcr_dups(
        n_p, pn_c, pn_p, pos1_p, pos2_p, q1_c, q1_p, q2_c, q2_p,
        n_u, un_c, un_p, upos_p, uq_c, uq_p, lib_c, lib_p, out, cap)
    raw = out.raw
    text = raw[:raw.index(b"\x00")].decode()
    assert rc == 0, f"ro_remove_pcr_dups failed ({rc}): {text[:500]}"
    p_line, u_line = text.split("\n")
    paired_out = [tuple(int(v) for v in ent.split(":"))
                  for ent in p_line.split(" ")[1:]]
    unpaired_out = [int(v) for v in u_line.split(" ")[1:]]
    return paired_out, unpaired_out


def left_align(chrom_seq, region_chrom, region_start, region_end, motif,
               reads_by_sample):
    """Reference GenotyperBamProcessor::left_align_reads
    (genotyper_bam_processor.cpp:38-168) via the trim oracle.

    reads_by_sample: per sample, list of dicts with keys seq, qual, name,
    cigar ('10=..' text), pos, end_pos (exclusive), rev (bool),
    hp (int, 0=absent), pf ('10'-style per-region string),
    log_p1/log_p2 (floats).
    Returns (left_alns, filt_p1_pairs, n_p1s, n_p2s) where left_alns is a
    list of dicts(start, stop, rev, deleted, name, seq, quals, aln, cigar,
    use_for_haps) and filt_p1_pairs is [(sample_idx, log_p1), ...] in
    retained order."""
    lib = get_trim_lib()
    i32 = ctypes.c_int32
    lib.rt_left_align.restype = ctypes.c_int
    flat = [r for s in reads_by_sample for r in s]
    counts, counts_p = _i32arr([len(s) for s in reads_by_sample])

    def cat(key):
        c = "".join(r[key] for r in flat).encode()
        lens, lens_p = _i32arr([len(r[key]) for r in flat])
        return c, lens, lens_p

    seq_c, _1, seq_p = cat("seq")
    qual_c, _2, qual_p = cat("qual")
    name_c, _3, name_p = cat("name")
    cig_c, _4, cig_p = cat("cigar")
    pf_c, _5, pf_p = cat("pf")
    pos, pos_p = _i32arr([r["pos"] for r in flat])
    endp, endp_p = _i32arr([r["end_pos"] for r in flat])
    rev = np.ascontiguousarray([1 if r.get("rev") else 0 for r in flat],
                               dtype=np.uint8)
    hp, hp_p = _i32arr([r.get("hp", 0) for r in flat])
    p1 = np.ascontiguousarray([r.get("log_p1", 0.0) for r in flat],
                              dtype=np.float64)
    p2 = np.ascontiguousarray([r.get("log_p2", 0.0) for r in flat],
                              dtype=np.float64)
    cap = 1 << 22
    out = ctypes.create_string_buffer(cap)
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.rt_left_align(
        chrom_seq.encode(), region_chrom.encode(), region_start, region_end,
        motif.encode(), len(reads_by_sample), counts_p, seq_c, seq_p,
        qual_c, qual_p, name_c, name_p, cig_c, cig_p, pos_p, endp_p,
        rev.ctypes.data_as(u8p), hp_p, pf_c, pf_p,
        p1.ctypes.data_as(dp), p2.ctypes.data_as(dp), out, cap)
    raw = out.raw
    end = raw.index(b"\x00")
    header = raw[:end].decode()
    assert rc >= 0, f"rt_left_align failed ({rc}): {header[:1000]}"
    toks = header.split(" ")
    assert int(toks[0]) == rc
    i = toks.index("f1")
    j = toks.index("np1")
    k = toks.index("np2")
    filt_p1 = [(int(t.split(":")[0]), float(t.split(":")[1]))
               for t in toks[i + 1:j]]
    n_p1s = [int(t) for t in toks[j + 1:k]]
    n_p2s = [int(t) for t in toks[k + 1:]]
    import re as _re
    alns = []
    off = end + 1
    for _ in range(rc):
        end = raw.index(b"\x00", off)
        rec = raw[off:end].decode()
        off = end + 1
        head, seq, quals, alnstr, cig, ufh = rec.split("|")
        start_s, stop_s, rev_s, del_s, name = head.split(",", 4)
        alns.append(dict(
            start=int(start_s), stop=int(stop_s), rev=bool(int(rev_s)),
            deleted=bool(int(del_s)), name=name, seq=seq, quals=quals,
            aln=alnstr,
            cigar=[(op, int(n)) for n, op in
                   _re.findall(r"(\d+)([=XIDSHM])", cig)],
            use_for_haps=[c == "1" for c in ufh]))
    return alns, filt_p1, n_p1s, n_p2s


def extract_families(fam_path: str, samples_with_data):
    """Reference extract_pedigree_nuclear_families (pedigree.cpp): FAM parse
    -> pedigree graph -> prune to samples with data -> connected components
    -> nuclear families.  Returns a list of
    (family_id, mother, father, [children...]) or raises on reference
    errors (inconsistent family ids, cycles, ...)."""
    lib = get_lib()
    names = list(samples_with_data)
    cat = "".join(names).encode()
    _l, lens_p = _i32arr([len(n) for n in names])
    cap = 1 << 20
    out = ctypes.create_string_buffer(cap)
    rc = lib.ro_extract_families(fam_path.encode(), cat, lens_p, len(names),
                                 out, cap)
    text = out.raw[:out.raw.index(b"\x00")].decode()
    if rc < 0:
        raise RuntimeError(text)
    fams = []
    for ln in text.splitlines():
        fid, mother, father, children = ln.split("\t")
        fams.append((fid, mother, father,
                     children.split(",") if children else []))
    assert len(fams) == rc
    return fams


def denovo_scan(fam_path: str, str_vcf_path: str, out_path: str,
                snp_vcf_path: str = "", chrom: str = "",
                skip_sites=(), use_pop_priors: bool = True,
                full_command: str = "DenovoFinder-ref-oracle"):
    """Reference DenovoFinder drive (denovos/denovo_main.cpp flow): STR VCF
    (+ optional phased SNP VCF for the family-joint scanner) through the
    compiled TrioDenovoScanner / DenovoScanner; the output VCF is written as
    PLAIN text at out_path (stub bgzfostream).  Inputs are PLAIN-TEXT VCFs.
    Returns the number of nuclear families scanned; raises on reference
    errors."""
    lib = get_lib()
    err = ctypes.create_string_buffer(1 << 16)
    rc = lib.ro_denovo_scan(
        fam_path.encode(), str_vcf_path.encode(), snp_vcf_path.encode(),
        chrom.encode(), "\n".join(skip_sites).encode(),
        1 if use_pop_priors else 0, full_command.encode(),
        out_path.encode(), err, len(err))
    if rc < 0:
        raise RuntimeError(err.value.decode())
    return rc

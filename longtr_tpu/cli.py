"""LongTR-compatible command-line interface.

Reference: src/hipstr_main.cpp (option table at :142-198).  Same option names
and defaults; behaviours preserved include the inverted --skip-assembly flag
and the always-on default stutter model (see longtr_tpu.config).
"""

from __future__ import annotations

import argparse
import os
import sys

from longtr_tpu.config import Config
from longtr_tpu.version import __version__


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="longtr",
        description="TPU-native tandem repeat genotyper (LongTR capabilities)")
    p.add_argument("--bams", dest="bams", default="",
                   help="Comma separated list of BAM/CRAM files")
    p.add_argument("--bam-files", dest="bam_files", default="",
                   help="File containing BAM/CRAM files to analyze, one per line")
    p.add_argument("--fasta", required=True,
               help="FASTA file with the reference sequences (required; also used for CRAM decode)")
    p.add_argument("--regions", required=True, help="BED file of TR regions")
    p.add_argument("--tr-vcf", dest="tr_vcf", default="",
                   help="Bgzipped VCF output path")
    p.add_argument("--ref-vcf", dest="ref_vcf", default="",
               help="Bgzipped input VCF; genotype only the alleles in this VCF (reference-panel mode)")
    p.add_argument("--snp-vcf", dest="snp_vcf", default="",
               help="Bgzipped VCF of phased SNPs used to physically phase TRs (a .tbi index enables constant-memory streaming)")
    p.add_argument("--min-mean-qual", type=float, default=30,
               help="Minimum mean base quality of a read (compares the mean phred score, like the reference)")
    p.add_argument("--min-mapq", type=float, default=20,
               help="Minimum MAPQ of a read")
    p.add_argument("--stutter-align-len", type=int, default=0,
               help="Use the legacy stutter HMM (mode B) for homopolymer repeats up to this length")
    p.add_argument("--phased-bam", action="store_true",
               help="Reads carry HP haplotype tags (e.g. whatshap); use them for phasing instead of a SNP VCF")
    p.add_argument("--indel-flank-len", type=int, default=5,
               help="Flank padding retained around the repeat during alignment")
    p.add_argument("--alignment-params", default="",
               help="7 comma-separated negative log probs i2i,i2m,d2d,d2m,m2m,m2i,m2d (use the = form for negative values)")
    p.add_argument("--stutter-in", default="",
               help="Input file of per-locus stutter models (disables the default model and EM learning)")
    p.add_argument("--stutter-out", default="",
               help="Output stutter models learned by EM to this file")
    p.add_argument("--log", default="",
               help="Write logging output to this file instead of stderr")
    p.add_argument("--viz-out", default="",
               help="Bgzipped per-locus alignment file for vizaln / vizalnpdf")
    p.add_argument("--pass-bam", default="",
               help="Output BAM of the reads used to genotype each region (PF tag = per-region pass bitmask)")
    p.add_argument("--filt-bam", default="",
               help="Output BAM of the reads filtered in each region (FT tag = filter reason)")
    p.add_argument("--max-flank-indel", type=float, default=0.15,
               help="Mask a sample when more than this fraction of its reads have an indel in the flanks")
    p.add_argument("--hide-allreads", action="store_true",
               help="Do not output the ALLREADS FORMAT field")
    p.add_argument("--hide-mallreads", action="store_true",
               help="Do not output the MALLREADS FORMAT field")
    p.add_argument("--output-gls", action="store_true",
               help="Write genotype likelihoods (GL) to the VCF")
    p.add_argument("--output-pls", action="store_true",
               help="Write phred-scaled likelihoods (PL) to the VCF")
    p.add_argument("--output-phased-gls", action="store_true",
               help="Write phased genotype likelihoods (PHASEDGL) to the VCF")
    p.add_argument("--output-filters", action="store_true",
               help="Write per-call filter reasons (FILTER) to the VCF")
    p.add_argument("--bam-samps", default="",
               help="Comma-separated sample names, one per BAM/CRAM (otherwise samples come from @RG SM tags)")
    p.add_argument("--bam-libs", default="",
               help="Comma-separated library names, one per BAM/CRAM (otherwise libraries come from @RG LB tags)")
    p.add_argument("--lib-from-samp", action="store_true",
               help="Use the sample name of each read as its library")
    p.add_argument("--max-haps", type=int, default=1000,
               help="Skip loci with more candidate haplotypes than this")
    p.add_argument("--max-hap-flanks", type=int, default=4,
               help="Maximum non-reference flanking sequences per TR")
    p.add_argument("--min-flank-freq", type=float, default=0.01,
               help="Filter candidate flanks below this sample fraction")
    p.add_argument("--def-stutter-model", action="store_true", default=True)
    p.add_argument("--no-def-stutter-model", dest="def_stutter_model",
                   action="store_false",
                   help="Disable the default stutter model (enables EM learning)")
    p.add_argument("--chrom", default="",
               help="Only genotype loci on this chromosome")
    p.add_argument("--haploid-chrs", default="",
               help="Comma-separated chromosomes to genotype as haploid")
    p.add_argument("--hap-chr-file", default="",
               help="File of haploid chromosome names, one per line")
    p.add_argument("--min-reads", type=int, default=10,
               help="Skip loci with fewer total reads than this")
    p.add_argument("--max-reads", type=int, default=1_000_000,
               help="Skip loci where more paired reads than this were encountered during filtering")
    p.add_argument("--max-tr-len", type=int, default=1000,
               help="Skip loci whose reference repeat is longer than this")
    p.add_argument("--max-str-len", dest="max_tr_len", type=int,
               help="Alias of --max-tr-len")
    p.add_argument("--max-mate-dist", type=int, default=1000,
               help="Maximum distance between mate pairs (also pads the BAM fetch window)")
    p.add_argument("--sample-list", default="",
               help="File of sample names to genotype, one per line")
    p.add_argument("--skip-assembly", action="store_true",
                   help="NOTE: like the reference, this flag ENABLES flank "
                        "assembly (the internal default skips it)")
    p.add_argument("--skip-genotyping", action="store_true",
               help="Run the read pipeline without genotyping (useful with --pass-bam/--filt-bam)")
    p.add_argument("--use-unpaired", action="store_true",
               help="Use unpaired reads (required for single-end long-read data)")
    p.add_argument("--no-rmdup", action="store_true",
               help="Do not remove PCR duplicates (duplicate removal is off by default, like the reference)")
    p.add_argument("--quiet", action="store_true",
               help="Only output terse logging messages")
    p.add_argument("--silent", action="store_true",
               help="Do not output any logging messages")
    p.add_argument("--version", action="version",
                   version=f"LongTR-TPU {__version__}")
    p.add_argument("--dont-use-all-reads", action="store_true",
                   help="Accepted for compatibility; a no-op exactly as in "
                        "the reference (it sets REQUIRE_SPANNING to its "
                        "default value; hipstr_main.cpp:186)")
    p.add_argument("--read-qual-trim", default="5",
                   help="Single character quality threshold. The trim "
                        "itself is disabled upstream; the only live effect "
                        "is that a threshold above ' ' enables the "
                        "hard-clipped-read filter (bam_processor.cpp:226-240)")
    p.add_argument("--viz-left-alns", action="store_true",
                   help="Visualize left-aligned reads rather than ML "
                        "alignments (the ML path is non-functional upstream, "
                        "so this is also the only live mode here)")
    p.add_argument("--fam", default="",
                   help="FAM file with pedigree information; used to filter "
                        "SNPs with Mendelian inconsistencies before phasing "
                        "(requires --snp-vcf)")
    p.add_argument("--shard", default="",
                   help="Process a shard of the catalog, e.g. '0/4'; merge "
                        "per-shard VCFs with longtr-merge-vcf")
    p.add_argument("--shard-mode", default="interleave",
                   choices=["interleave", "block"],
                   help="interleave (default): every Nth locus — best "
                        "balance on small catalogs. block: contiguous "
                        "chunks — keeps each host's BAM-window/FASTA IO "
                        "proportional to its share; use for whole-genome "
                        "multi-host runs")
    p.add_argument("--distributed", action="store_true",
                   help="Multi-process run over jax.distributed: each "
                        "process handles the jax.process_index()-th block "
                        "shard; process 0 merges after a barrier. Pass "
                        "--coordinator/--num-processes/--process-id or rely "
                        "on cluster auto-detection")
    p.add_argument("--coordinator", default="",
                   help="jax.distributed coordinator address (host:port)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="Total process count for --distributed")
    p.add_argument("--process-id", type=int, default=None,
                   help="This process's index for --distributed")
    p.add_argument("--workers", type=int, default=1,
                   help="Run N shard worker processes on this host and merge "
                        "their outputs into the requested files (the "
                        "reference is single-threaded, README.md:78-82; "
                        "checkpoints stay per-worker as FILE.shardK)")
    p.add_argument("--checkpoint", default="",
                   help="Append completed locus keys to this file and skip "
                        "them on restart (crash-resumable runs; the "
                        "reference has no checkpointing)")
    p.add_argument("--metrics-out", default="",
                   help="Write run counters + stage timings as JSON "
                        "(structured metrics; the reference only logs text)")
    p.add_argument("--jax-profile", default="",
                   help="Capture a JAX profiler trace of the run into this "
                        "directory (view with TensorBoard)")
    p.add_argument("--ref-fidelity", action="store_true",
                   help="Reference-fidelity math mode: score with the f64 "
                        "double DP and the reference's Mineiro fast-LSE bit "
                        "patterns (bit-identical per-locus numbers to the "
                        "reference implementation; slower than the default "
                        "exact-f32 device path)")
    return p


def config_from_args(args) -> Config:
    cfg = Config()
    # dispatch-window override (loci fused per device call): smaller
    # windows pipeline haplotype builds against device scoring at the
    # cost of more tunnel round trips; the default suits catalog scale
    if os.environ.get("LONGTR_LOCUS_BATCH"):
        cfg.locus_batch = int(os.environ["LONGTR_LOCUS_BATCH"])
    cfg.min_sum_qual_log_prob = args.min_mean_qual
    cfg.min_mapq = args.min_mapq
    cfg.switch_old_align_len = args.stutter_align_len
    cfg.phased_bam = args.phased_bam
    cfg.indel_flank_len = args.indel_flank_len
    cfg.max_flank_indel_frac = args.max_flank_indel
    cfg.output_allreads = not args.hide_allreads
    cfg.output_mallreads = not args.hide_mallreads
    cfg.output_gls = args.output_gls
    cfg.output_pls = args.output_pls
    cfg.output_phased_gls = args.output_phased_gls
    cfg.output_filters = args.output_filters
    cfg.max_total_haplotypes = args.max_haps
    cfg.max_flank_haplotypes = args.max_hap_flanks
    cfg.min_flank_freq = args.min_flank_freq
    cfg.use_default_stutter_model = args.def_stutter_model and not args.stutter_in
    cfg.min_total_reads = args.min_reads
    cfg.max_total_reads = args.max_reads
    cfg.max_str_length = args.max_tr_len
    # long-TR catalogs (VNTR/HiFi: --max-tr-len raised above the 1000
    # default) build haplotypes slowly enough that pipelining moderate
    # windows against device scoring beats maximal dispatch fusion
    # (hardware sweep: 22.3 loci/s at 256 -> 24.1 at 16 / 23.5 at 32 on
    # a 60-locus VNTR catalog, VCF byte-identical); short-STR catalogs
    # keep the big fused windows.  LONGTR_LOCUS_BATCH always wins.
    if args.max_tr_len > 2000 and not os.environ.get("LONGTR_LOCUS_BATCH"):
        cfg.locus_batch = 32
    cfg.max_mate_dist = args.max_mate_dist
    cfg.skip_assembly = not args.skip_assembly  # inverted, like the reference
    cfg.stutter_in = args.stutter_in
    cfg.stutter_out = args.stutter_out
    if args.stutter_in:
        cfg.use_default_stutter_model = False
    if args.alignment_params:
        vals = [float(x) for x in args.alignment_params.split(",")]
        if len(vals) != 7:
            sys.exit("ERROR: Number of alignment parameters is not correct")
        if any(v >= 0 for v in vals):
            sys.exit("ERROR: LOG values can not be positive")
        cfg.alignment_params = vals
    if args.haploid_chrs:
        cfg.haploid_chroms = set(args.haploid_chrs.split(","))
    if args.hap_chr_file:
        with open(args.hap_chr_file) as fh:
            cfg.haploid_chroms |= {ln.strip() for ln in fh if ln.strip()}
    if args.sample_list:
        with open(args.sample_list) as fh:
            cfg.sample_set = {ln.strip() for ln in fh if ln.strip()}
    if args.use_unpaired:
        cfg.require_paired_reads = False
    if len(args.read_qual_trim) != 1:
        sys.exit("ERROR: --read-qual-trim requires a single character argument")
    cfg.base_qual_trim = args.read_qual_trim
    cfg.viz_left_alns = args.viz_left_alns
    return cfg


def main(argv=None):
    try:
        return _main(argv)
    except (OSError, ValueError, EOFError) as e:
        # printErrorAndDie analog (error.h:6): clean message, nonzero exit.
        # Set LONGTR_TRACEBACK=1 to see the full traceback when debugging.
        import os
        if os.environ.get("LONGTR_TRACEBACK"):
            raise
        sys.exit(f"ERROR: {e}")
    except Exception as e:
        import struct
        import zlib
        if isinstance(e, (zlib.error, struct.error)):
            import os
            if os.environ.get("LONGTR_TRACEBACK"):
                raise
            sys.exit(f"ERROR: corrupt or truncated input: {e}")
        raise


def _shard_path(path, i):
    # Keep the .gz suffix last so CLI validation and bgzf detection
    # (both keyed on endswith(".gz")) still hold for shard files.
    if path.endswith(".gz"):
        return path[:-3] + f".shard{i}.gz"
    return path + f".shard{i}"


# output flags rewritten to per-shard paths in --workers / --distributed runs
_SHARDED_OUTPUT_FLAGS = {"--tr-vcf", "--metrics-out", "--checkpoint", "--log",
                         "--viz-out", "--stutter-out", "--pass-bam",
                         "--filt-bam", "--jax-profile"}


def _run_distributed(argv, args):
    """Multi-process run over jax.distributed (SURVEY §2.10).

    Each process initializes the JAX distributed runtime, processes the
    ``jax.process_index()``-th block shard of the catalog through the normal
    in-process pipeline (its own chips/devices), then all processes join a
    coordination-service barrier and process 0 heap-merges the per-shard
    outputs — the same shard + merge primitives the --workers fan-out uses,
    so merged output is byte-identical to a single-process run (test
    enforced, tests/test_distributed.py)."""
    import os

    platform = os.environ.get("LONGTR_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    import jax
    kw = {}
    if args.coordinator:
        kw = dict(coordinator_address=args.coordinator,
                  num_processes=args.num_processes,
                  process_id=args.process_id)
    jax.distributed.initialize(**kw)
    pidx, n = jax.process_index(), jax.process_count()

    # Rewrite argv: strip the distributed flags, point outputs at this
    # process's shard paths, pin the catalog shard (block mode keeps each
    # host's IO proportional to its share; see multihost.shard_regions).
    drop_with_value = {"--coordinator", "--num-processes", "--process-id"}
    base = []
    it = iter(argv)
    for a in it:
        if a == "--distributed":
            continue
        key = a.split("=", 1)[0]
        if key in drop_with_value:
            if "=" not in a:
                next(it, None)
            continue
        if "=" in a and key in _SHARDED_OUTPUT_FLAGS:
            base += a.split("=", 1)
            continue
        base.append(a)
        if a in _SHARDED_OUTPUT_FLAGS:
            base.append(next(it))
    wargv = []
    j = 0
    while j < len(base):
        a = base[j]
        if a in _SHARDED_OUTPUT_FLAGS:
            wargv += [a, _shard_path(base[j + 1], pidx)]
            j += 2
            continue
        wargv.append(a)
        j += 1
    wargv += ["--shard", f"{pidx}/{n}", "--shard-mode", "block"]

    rc = _main(wargv)
    if rc:
        return rc

    # Coordination-service barrier: every process must have written its
    # shard before rank 0 merges.
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        "longtr_shard_outputs_done", 600_000)
    if pidx != 0:
        return 0

    def shards_of(path):
        return [_shard_path(path, i) for i in range(n)]

    return _merge_shard_outputs(args, shards_of)


def _run_workers(argv, args):
    """Fork N single-shard CLI subprocesses and merge their outputs.

    Fresh interpreters (not fork) keep the JAX runtime safe; the interleaved
    shard + lexicographic merge reproduces the single-run output
    byte-identically (same invariant the --shard identity test enforces).
    """
    import os
    import subprocess
    n = args.workers
    rewrite = _SHARDED_OUTPUT_FLAGS
    base = []
    it = iter(argv)
    for a in it:
        if a == "--workers":
            next(it, None)
            continue
        if a.startswith("--workers="):
            continue
        # normalize the argparse-legal `--flag=value` form for rewritten
        # output flags, else every worker would write the SAME path (and
        # the merge step would then miss its shard files)
        if "=" in a and a.split("=", 1)[0] in rewrite:
            base += a.split("=", 1)
            continue
        base.append(a)
        if a in rewrite:
            base.append(next(it))
    shard_path = _shard_path
    procs = []
    for i in range(n):
        wargv = []
        j = 0
        while j < len(base):
            a = base[j]
            if a in rewrite:
                wargv += [a, shard_path(base[j + 1], i)]
                j += 2
                continue
            wargv.append(a)
            j += 1
        wargv += ["--shard", f"{i}/{n}"]
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "longtr_tpu.cli"] + wargv))
    failed = [i for i, pr in enumerate(procs) if pr.wait() != 0]
    if failed:
        sys.exit(f"ERROR: worker shard(s) {failed} failed")

    def shards_of(path):
        return [shard_path(path, i) for i in range(n)]

    return _merge_shard_outputs(args, shards_of)


def _merge_shard_outputs(args, shards_of):
    """Merge per-shard outputs into the final paths (rank-0 side of both
    --workers fan-out and --distributed multi-process runs)."""
    import os

    from longtr_tpu.io.tabix import build_tbi
    from longtr_tpu.parallel.multihost import (merge_sorted_vcfs,
                                               merge_text_blocks)

    if args.tr_vcf and not args.skip_genotyping:
        parts = shards_of(args.tr_vcf)
        merge_sorted_vcfs(parts, args.tr_vcf)
        build_tbi(args.tr_vcf)
        for p in parts:
            os.unlink(p)
            if os.path.exists(p + ".tbi"):
                os.unlink(p + ".tbi")
    if args.viz_out:
        parts = shards_of(args.viz_out)
        merge_text_blocks(parts, args.viz_out, bgzf=True)
        for p in parts:
            os.unlink(p)
    if args.stutter_out:
        parts = shards_of(args.stutter_out)
        merge_text_blocks(parts, args.stutter_out, bgzf=False)
        for p in parts:
            os.unlink(p)
    for bam_out in (args.pass_bam, args.filt_bam):
        if bam_out:
            from longtr_tpu.io.bam_write import merge_bams
            parts = shards_of(bam_out)
            merge_bams(parts, bam_out)
            for p in parts:
                os.unlink(p)
    # --jax-profile traces stay per-worker (FILE.shardK directories)
    if args.metrics_out:
        import json
        merged = {}
        for p in shards_of(args.metrics_out):
            with open(p) as fh:
                d = json.load(fh)
            for k, v in d.items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    merged[k] = merged.get(k, 0) + v
                elif isinstance(v, dict):
                    sub = merged.setdefault(k, {})
                    for k2, v2 in v.items():
                        if isinstance(v2, (int, float)):
                            sub[k2] = sub.get(k2, 0) + v2
                        else:
                            sub.setdefault(k2, v2)
                else:
                    merged.setdefault(k, v)
            os.unlink(p)
        with open(args.metrics_out, "w") as fh:
            json.dump(merged, fh, indent=2)
    return 0


def _main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    args = build_parser().parse_args(argv)
    import os
    if args.distributed:
        return _run_distributed(argv, args)
    if args.workers > 1 and not args.shard:
        return _run_workers(argv, args)
    if args.ref_fidelity:
        from longtr_tpu.utils import mathops
        mathops.set_ref_fidelity(True)
    platform = os.environ.get("LONGTR_PLATFORM")
    if platform:
        # JAX_PLATFORMS env vars are latched before user code in environments
        # where sitecustomize imports jax; this override always works.
        import jax
        jax.config.update("jax_platforms", platform)
    from longtr_tpu.ops.pairhmm import enable_compile_cache
    enable_compile_cache()
    full_command = "LongTR-TPU-" + __version__ + " " + " ".join(argv or sys.argv[1:])

    if args.metrics_out:
        d = os.path.dirname(args.metrics_out) or "."
        if not os.path.isdir(d):
            sys.exit(f"ERROR: Directory for --metrics-out does not exist: {d}")
    if not args.bams and not args.bam_files:
        sys.exit("ERROR: You must specify either the --bams or --bam-files option")
    if args.bams and args.bam_files:
        sys.exit("ERROR: You can only specify one of --bams or --bam-files")
    if not args.skip_genotyping and not args.tr_vcf:
        sys.exit("ERROR: --tr-vcf option required")
    if args.tr_vcf and not args.tr_vcf.endswith(".gz"):
        sys.exit("ERROR: Path for TR VCF output file must end in .gz")

    bam_files = (args.bams.split(",") if args.bams else
                 [ln.strip() for ln in open(args.bam_files) if ln.strip()])

    if args.log:
        log_fh = open(args.log, "w")
    elif not sys.stderr.isatty():
        # batch mode: a raw per-locus print to a piped stderr costs ~0.8ms
        # in syscalls; buffer and flush at exit (content unchanged)
        import io
        try:
            log_fh = io.TextIOWrapper(
                io.BufferedWriter(
                    io.FileIO(sys.stderr.fileno(), "w", closefd=False),
                    1 << 16),
                line_buffering=False, write_through=False)
        except (OSError, ValueError, io.UnsupportedOperation):
            log_fh = sys.stderr
    else:
        log_fh = sys.stderr

    def full_logger(*msgs):
        if not args.silent:
            print(*msgs, file=log_fh)

    def sel_logger(*msgs):
        if not (args.quiet or args.silent):
            print(*msgs, file=log_fh)

    from longtr_tpu.io.bam import BamMultiReader
    reader = BamMultiReader(bam_files, args.fasta)
    full_logger(f"Detected {len(bam_files)} BAM/CRAM files")

    # Read-group → sample/library maps (hipstr_main.cpp:461-516)
    rg_to_sample = {}
    rg_to_library = {}
    rg_samples = set()
    use_bam_rgs = not args.bam_samps
    if args.bam_samps:
        samps = args.bam_samps.split(",")
        libs = (args.bam_libs.split(",") if args.bam_libs else
                (samps if args.lib_from_samp else None))
        if libs is None:
            sys.exit("ERROR: --bam-libs option required when --bam-samps specified")
        if len(samps) != len(bam_files) or len(libs) != len(bam_files):
            sys.exit("ERROR: Number of BAM files and samples/libraries must match")
        for path, s, l in zip(bam_files, samps, libs):
            rg_to_sample[path] = s
            rg_to_library[path] = l
            rg_samples.add(s)
    else:
        for i, path in enumerate(bam_files):
            rgs = reader.read_groups(i)
            if not rgs:
                sys.exit("ERROR: BAM files lack read groups and --bam-samps "
                         "was not specified")
            for rg in rgs:
                if not rg.id or not rg.sample:
                    sys.exit("ERROR: @RG lacks ID or SM tag")
                lib = rg.sample if args.lib_from_samp else rg.library
                if not args.lib_from_samp and not rg.library:
                    sys.exit("ERROR: @RG lacks LB tag")
                rg_to_sample[path + rg.id] = rg.sample
                rg_to_library[path + rg.id] = lib
                rg_samples.add(rg.sample)

    cfg = config_from_args(args)
    from longtr_tpu.pipeline.processor import GenotyperPipeline
    pipeline = GenotyperPipeline(cfg, use_bam_rgs, full_logger, sel_logger)
    if log_fh is not sys.stderr:
        pipeline.log_flush = log_fh.flush

    if args.viz_out:
        if not args.viz_out.endswith(".gz"):
            sys.exit("ERROR: Path for alignment visualization file must end "
                     "in .gz as it will be bgzipped")
        from longtr_tpu.io.bgzf import BgzfWriter
        pipeline.viz_out = BgzfWriter(args.viz_out)
    if args.pass_bam or args.filt_bam:
        # hipstr_main.cpp:518-535: both writers share the merged input header.
        from longtr_tpu.io.bam_write import BamWriter
        hdr = reader.readers[0].header
        if args.pass_bam:
            pipeline.pass_bam = BamWriter(args.pass_bam, hdr.text,
                                          hdr.ref_names, hdr.ref_lengths)
        if args.filt_bam:
            pipeline.filt_bam = BamWriter(args.filt_bam, hdr.text,
                                          hdr.ref_names, hdr.ref_lengths)
    if args.ref_vcf:
        from longtr_tpu.io.vcf import VCFReader
        pipeline.ref_vcf = VCFReader(args.ref_vcf)
    if args.snp_vcf and not args.phased_bam:
        from longtr_tpu.io.vcf import VCFReader
        pipeline.snp_vcf = VCFReader(args.snp_vcf)
    if args.fam:
        # Pedigree-based SNP filtering before physical phasing
        # (hipstr_main.cpp:581-594 + snp_bam_processor.h:89-105).
        if not args.snp_vcf:
            sys.exit("ERROR: --fam option only applies if --snp-vcf option "
                     "has been specified as well")
        from longtr_tpu.denovo.haplotype_tracker import HaplotypeTracker
        from longtr_tpu.denovo.pedigree import (
            extract_pedigree_nuclear_families)
        snp_samples = set(pipeline.snp_vcf.samples)
        families = extract_pedigree_nuclear_families(
            args.fam, snp_samples, full_logger)
        families = [f for f in families if not f.is_missing_sample(snp_samples)]
        if families:
            # Separate reader: the tracker's sliding window iterates
            # independently of the per-locus SNP-tree queries.
            pipeline.snp_tracker = HaplotypeTracker(
                families, VCFReader(args.snp_vcf))

    if not args.skip_genotyping:
        samples = cfg.sample_set & rg_samples if cfg.sample_set else rg_samples
        pipeline.set_output_vcf(args.tr_vcf, samples)

    shard = None
    if args.shard:
        sid, nsh = (int(x) for x in args.shard.split("/"))
        shard = (sid, nsh, args.shard_mode)
    if args.checkpoint:
        pipeline.set_checkpoint(args.checkpoint)
    profile_ctx = None
    if args.jax_profile:
        import jax
        profile_ctx = jax.profiler.trace(args.jax_profile)
        profile_ctx.__enter__()
    try:
        pipeline.process_regions(reader, args.regions, args.fasta,
                                 rg_to_sample, rg_to_library, full_command,
                                 max_regions=10_000_000, chrom=args.chrom,
                                 shard=shard)
        pipeline.finish()
    finally:
        if log_fh is not sys.stderr and not args.log:
            log_fh.flush()
    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
    if args.metrics_out:
        import json
        with open(args.metrics_out, "w") as fh:
            json.dump(pipeline.metrics(), fh, indent=2)
    reader.close()
    if args.log:
        log_fh.close()
    elif log_fh is not sys.stderr:
        log_fh.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())

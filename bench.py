"""Benchmark: pair-HMM DP throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-measured.  ``vs_baseline`` = device DP-cells/s ÷ SINGLE-THREADED
native C++ DP-cells/s on this host (our batch scorer pinned to one thread
— the honest stand-in for the reference's single-threaded C++ inner loop,
align_seq_to_hap, HapAligner.cpp:236-343).  The single-core pure-Python
f64 oracle ratio is kept as the separate ``vs_python_oracle`` field.

The TPU measurement runs in a watchdog subprocess: the tunneled axon
backend occasionally wedges, and a hung bench must not take down the run —
on repeated failure the CPU-backend kernel throughput is reported instead.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_CHILD_CODE = r"""
import time, json, sys
import numpy as np
from longtr_tpu.ops.pairhmm import AlignmentParams, encode_seq, pairhmm_batch_auto
from longtr_tpu.ops.pairhmm import enable_compile_cache
enable_compile_cache()

rng = np.random.default_rng(0)
bases = np.array(list("ACGT"))
B, N, M = 2048, 192, 192
haps, reads = [], []
for _ in range(B):
    n = int(rng.integers(150, N))
    hap = "".join(rng.choice(bases, size=n))
    read = []
    for ch in hap:
        r = rng.random()
        if r < 0.002:
            continue
        read.append(ch if r > 0.01 else str(rng.choice(bases)))
    haps.append(hap)
    reads.append("".join(read)[:M])
hap_codes = np.stack([encode_seq(h, N) for h in haps])
read_codes = np.stack([encode_seq(r, M) for r in reads])
hap_lens = np.array([len(h) for h in haps], dtype=np.int32)
read_lens = np.array([len(r) for r in reads], dtype=np.int32)
full_lens = hap_lens + 60
params = AlignmentParams()

# Pin inputs on-device so the timing loop measures kernel throughput, not
# host->device transfer latency (dominant through the axon tunnel).
import jax
if jax.default_backend() in ("tpu", "axon"):
    import jax.numpy as jnp
    from longtr_tpu.ops.pairhmm_pallas import TILE_B, _pallas_call
    Bpad = -(-B // TILE_B) * TILE_B
    hp = np.pad(hap_codes, ((0, Bpad - B), (0, 0)))
    rp = np.pad(read_codes, ((0, Bpad - B), (0, 0)))
    hap_t = jax.device_put(np.ascontiguousarray(hp.T.astype(np.int32)))
    read_t = jax.device_put(np.ascontiguousarray(rp.T.astype(np.int32)))
    hl_d = jax.device_put(np.pad(hap_lens, (0, Bpad - B),
                                 constant_values=1)[None, :])
    rl_d = jax.device_put(np.pad(read_lens, (0, Bpad - B),
                                 constant_values=1)[None, :])
    fl_d = jax.device_put(np.pad(full_lens, (0, Bpad - B),
                                 constant_values=1)[None, :])
    trans = jax.device_put(jnp.asarray(params.as_array()))

    @jax.jit
    def _chained(t, prev):
        # data dependency on the previous kernel's output (zero-scaled)
        # forces serialization without changing values
        return _pallas_call(hap_t, hl_d, read_t, rl_d, fl_d,
                            t + prev[0] * 0.0)

    def run():
        # axon's block_until_ready doesn't actually block; a host
        # materialization is the only reliable sync
        np.asarray(_pallas_call(hap_t, hl_d, read_t, rl_d, fl_d, trans))
else:
    def run():
        out = pairhmm_batch_auto(hap_codes, hap_lens, read_codes, read_lens,
                                 full_lens, params)
        np.asarray(out)

run()  # compile
run()
if jax.default_backend() in ("tpu", "axon"):
    # serialized chained kernels; the difference between two chain lengths
    # cancels the tunnel round-trip, leaving pure kernel wall time
    prev = _pallas_call(hap_t, hl_d, read_t, rl_d, fl_d, trans)
    p = _chained(trans, prev)  # compile chained form
    np.asarray(p)

    def chain(n):
        t0 = time.time()
        p = prev
        for _ in range(n):
            p = _chained(trans, p)
        np.asarray(p)
        return time.time() - t0

    chain(4)  # warm
    n_small, n_big = 32, 160
    deltas = sorted(max(chain(n_big) - chain(n_small), 1e-9)
                    for _ in range(3))
    dt = deltas[1] / (n_big - n_small)
else:
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
cells = float((hap_lens.astype(np.int64) * read_lens).sum())
out = {"cells_per_s": cells / dt}
# the kernel always pays the full padded (B, N, M) grid; report that
# throughput too so effective-vs-padded counting is driver-visible
# (hap lens are random in [150, N): effective ~= 0.79 * padded here)
out["padded_cells_per_s"] = float(B) * N * M / dt

# --- j-chunked streaming kernel at VNTR scale (8kb x 8kb pairs) -----------
# The resident number above covers short-STR shapes; product value on
# VNTR catalogs rides the chunked kernel (VERDICT r2 weak 4).
from longtr_tpu.ops.pairhmm_pallas import JCHUNK, _pallas_call_chunked_u8, chunked_fits
NC = MC = 8192
BC = 128
if chunked_fits(NC, MC):
    rng2 = np.random.default_rng(1)
    hapc = rng2.integers(0, 4, size=(BC, NC), dtype=np.uint8)
    readc = np.array(hapc[:, :MC])
    mut = rng2.random(readc.shape) < 0.01
    readc[mut] = (readc[mut] + 1 + rng2.integers(0, 3, mut.sum())) % 4
    hlc = np.full(BC, NC, np.int32)
    rlc = np.full(BC, MC, np.int32)
    flc = hlc + 60
    if jax.default_backend() in ("tpu", "axon"):
        import jax.numpy as jnp
        hap_d = jax.device_put(hapc)
        read_d = jax.device_put(readc)
        hl2 = jax.device_put(hlc[None, :]); rl2 = jax.device_put(rlc[None, :])
        fl2 = jax.device_put(flc[None, :])
        tr2 = jax.device_put(jnp.asarray(params.as_array()))

        @jax.jit
        def _cchain(t, prevv):
            return _pallas_call_chunked_u8(hap_d, hl2, read_d, rl2, fl2,
                                           t + prevv[0] * 0.0)

        pc = _pallas_call_chunked_u8(hap_d, hl2, read_d, rl2, fl2, tr2)
        np.asarray(_cchain(tr2, pc))  # compile

        def cchain(n):
            t0 = time.time()
            p = pc
            for _ in range(n):
                p = _cchain(tr2, p)
            np.asarray(p)
            return time.time() - t0

        cchain(1)
        deltas = sorted(max(cchain(4) - cchain(1), 1e-9) for _ in range(3))
        dtc = deltas[1] / 3
    else:
        def crun():
            np.asarray(_pallas_call_chunked_u8(
                hapc, hlc[None, :], readc, rlc[None, :], flc[None, :],
                params.as_array(), interpret=True))
        # interpret-mode CPU chunked run is too slow to time honestly; skip
        dtc = None
    if dtc:
        out["chunked_cells_per_s"] = float(BC) * NC * MC / dtc

# --- mode-B device path (legacy stutter alignment, period-1) --------------
from longtr_tpu.haplotype.blocks import HapBlock, Haplotype, RepeatBlock
from longtr_tpu.models.stutter import StutterModel
from longtr_tpu.pipeline.mode_b import ModeBAligner, calc_seed_base
from longtr_tpu.pipeline.alignment import Alignment
rng3 = np.random.default_rng(2)
basesl = list("ACGT")
lf = "".join(rng3.choice(basesl, 35).tolist())
rf = "".join(rng3.choice(basesl, 35).tolist())
rep = "A" * 18
model = StutterModel(0.9, 0.05, 0.05, 0.9, 0.01, 0.01, "A")
rs_ = 1000 + len(lf)
blocks = [HapBlock(1000, rs_, lf)]
rb = RepeatBlock(rs_, rs_ + len(rep), rep, 1, model)
for d in (-2, -1, 1):
    rb.add_alternate("A" * (18 + d))
blocks.append(rb)
blocks.append(HapBlock(rs_ + len(rep), rs_ + len(rep) + len(rf), rf))
hap_b = Haplotype(blocks)
aligner = ModeBAligner(hap_b)
hap_start, hap_end = 1000, rs_ + len(rep) + len(rf)
pools = []
for k in range(512):
    allele = "A" * (18 + int(rng3.integers(-2, 2)))
    # DISTINCT read sequences (sprinkled flank mismatches): production
    # feeds pooled (deduplicated) reads, so identical-sequence repeats
    # would overstate the per-read table-cache hit rate
    fl = list(lf + allele + rf)
    for _m in range(int(rng3.integers(1, 4))):
        p_ = int(rng3.integers(0, len(fl)))
        fl[p_] = str(rng3.choice(basesl))
    seq = "".join(fl)
    pools.append(Alignment(1000, 1000 + len(lf) + len(rep) + len(rf) - 1,
                           False, False, f"p{k}", "I" * len(seq), seq,
                           alignment=seq, cigar=[("=", len(seq))]))
seeds = [calc_seed_base(a, aligner.repeat_starts, aligner.repeat_ends,
                        hap_start, hap_end) for a in pools]
valid = [i for i, s in enumerate(seeds) if s >= 0]
alns_v = [pools[i] for i in valid]
seeds_v = [int(seeds[i]) for i in valid]

def mb_run(timings=None):
    t0 = time.time()
    prep = aligner.score_reads_batch_prepare(alns_v, seeds_v)
    if timings is not None:
        timings["prepare_s"] = (timings.get("prepare_s", 0.0)
                                + time.time() - t0)
    return np.asarray(aligner.score_reads_batch_finish(prep,
                                                       timings=timings))

mb_run()  # compile
mb_t = {}
t0 = time.time()
reps = 3
for _ in range(reps):
    mb_run(timings=mb_t)
dtb = (time.time() - t0) / reps
out["mode_b_pairs_per_s"] = len(alns_v) * hap_b.num_combs() / dtb
# per-rep phase breakdown (VERDICT r4 #4): table build / device dispatch+
# sync / f64 seed marginalization.  Their sum vs dtb exposes any
# unaccounted overhead.
out["mode_b_phase_prepare_s"] = mb_t.get("prepare_s", 0.0) / reps
out["mode_b_phase_dispatch_s"] = mb_t.get("dispatch_s", 0.0) / reps
out["mode_b_phase_marginalize_s"] = mb_t.get("marginalize_s", 0.0) / reps
out["mode_b_rep_s"] = dtb
print(json.dumps(out))
"""


def measure_device(force_cpu=False, timeout=None):
    if timeout is None:
        # a killed in-flight dispatch wedges the tunnel for ~30-40 min, so
        # patient beats fast; raise further with LONGTR_BENCH_TIMEOUT
        timeout = int(os.environ.get("LONGTR_BENCH_TIMEOUT", "420"))
    env = dict(os.environ)
    code = _CHILD_CODE
    if force_cpu:
        code = ("import jax\njax.config.update('jax_platforms', 'cpu')\n"
                + code)
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                             capture_output=True, text=True, env=env)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
    except subprocess.TimeoutExpired:
        return None
    return None


def main():
    measured = None
    for _ in range(2):
        measured = measure_device()
        if measured is not None:
            break
        time.sleep(30)
    if measured is None:
        # tunnel wedged: fall back to the CPU-backend kernel measurement
        measured = measure_device(force_cpu=True, timeout=600)
    if measured is None:
        print(json.dumps({"metric": "pairhmm_dp_cells_per_s", "value": 0,
                          "unit": "cells/s", "vs_baseline": 0}))
        return 1
    device_cells = measured["cells_per_s"]

    # Baseline 1: single-THREADED native C++ batch scorer on this host
    # (LONGTR_NATIVE_THREADS=1) over the same workload shape.
    from longtr_tpu.ops.pairhmm import (AlignmentParams, encode_seq,
                                        pairhmm_score_oracle)
    from longtr_tpu.native import pairhmm_batch_native
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    B, N, M = 256, 192, 192
    haps, reads = [], []
    for _ in range(B):
        n = int(rng.integers(150, N))
        hap = "".join(rng.choice(bases, size=n))
        read = "".join(ch for ch in hap if rng.random() > 0.002)[:M]
        haps.append(hap)
        reads.append(read)
    hap_codes = np.stack([encode_seq(h, N) for h in haps])
    read_codes = np.stack([encode_seq(r, M) for r in reads])
    hap_lens = np.array([len(h) for h in haps], dtype=np.int32)
    read_lens = np.array([len(r) for r in reads], dtype=np.int32)
    full_lens = hap_lens + 60
    cells = float((hap_lens.astype(np.int64) * read_lens).sum())
    trans = AlignmentParams().as_array()
    cpp1_cells_per_s = None
    os.environ["LONGTR_NATIVE_THREADS"] = "1"
    try:
        pairhmm_batch_native(hap_codes, hap_lens, read_codes, read_lens,
                             full_lens, trans)  # warm (code paging)
        t0 = time.time()
        out = pairhmm_batch_native(hap_codes, hap_lens, read_codes,
                                   read_lens, full_lens, trans)
        if out is not None:
            cpp1_cells_per_s = cells / (time.time() - t0)
    finally:
        del os.environ["LONGTR_NATIVE_THREADS"]

    # Baseline 2: single-core pure-Python float64 oracle (kept for context).
    t0 = time.time()
    ocells = 0
    for i in range(8):
        pairhmm_score_oracle(haps[i], reads[i])
        ocells += len(haps[i]) * len(reads[i])
    py_cells_per_s = ocells / (time.time() - t0)

    result = {
        "metric": "pairhmm_dp_cells_per_s",
        "value": round(device_cells, 1),
        "unit": "cells/s",
        "vs_baseline": (round(device_cells / cpp1_cells_per_s, 2)
                        if cpp1_cells_per_s else 0),
        "baseline_single_core_cpp_cells_per_s":
            round(cpp1_cells_per_s, 1) if cpp1_cells_per_s else None,
        "vs_python_oracle": round(device_cells / py_cells_per_s, 2),
    }
    padded = measured.get("padded_cells_per_s")
    if padded:
        # effective (useful) vs padded-grid counting of the same run: the
        # kernel computes the full (B, 192, 192) grid; `value` counts only
        # the useful sum(hap_len*read_len) cells (~79% of the grid at this
        # shape).  Numbers quoted per-methodology must cite which field.
        result["padded_grid_cells_per_s"] = round(padded, 1)

    # --- secondary driver-visible kernels (VERDICT r2 weak 4) -------------
    # j-chunked streaming kernel at an 8kb x 8kb VNTR shape, vs the same
    # single-threaded native C++ scorer on that shape.
    chunked = measured.get("chunked_cells_per_s")
    if chunked:
        NC = MC = 8192
        BV = 4
        rngv = np.random.default_rng(3)
        vh = rngv.integers(0, 4, size=(BV, NC), dtype=np.uint8)
        vr = np.array(vh[:, :MC], dtype=np.uint8)
        vhl = np.full(BV, NC, np.int32)
        vrl = np.full(BV, MC, np.int32)
        vfl = vhl + 60
        cppv = None
        os.environ["LONGTR_NATIVE_THREADS"] = "1"
        try:
            t0 = time.time()
            outv = pairhmm_batch_native(vh, vhl, vr, vrl, vfl, trans)
            if outv is not None:
                cppv = float(BV) * NC * MC / (time.time() - t0)
        finally:
            del os.environ["LONGTR_NATIVE_THREADS"]
        result["chunked_8k_cells_per_s"] = round(chunked, 1)
        result["chunked_vs_baseline"] = (round(chunked / cppv, 2)
                                         if cppv else 0)

    # mode-B device path (legacy period-1 stutter alignment): pool-score
    # throughput of the batched device scorer vs the single-core host f64
    # scorer on the same locus.
    mode_b = measured.get("mode_b_pairs_per_s")
    if mode_b:
        result["mode_b_pairs_per_s"] = round(mode_b, 1)
        try:
            host_pps = _mode_b_host_baseline()
            result["mode_b_vs_host_f64"] = round(mode_b / host_pps, 2)
        except Exception:
            result["mode_b_vs_host_f64"] = None
        # phase breakdown per rep (VERDICT r4 #4): table build / device
        # dispatch+sync (tunnel RT lands here) / f64 marginalization
        for k in ("mode_b_phase_prepare_s", "mode_b_phase_dispatch_s",
                  "mode_b_phase_marginalize_s", "mode_b_rep_s"):
            if k in measured:
                result[k] = round(measured[k], 4)

    # --- e2e loci/s: the other half of the BASELINE metric --------------
    # (VERDICT r4 #1/#2) full-pipeline throughput on the three flagship
    # workload classes, each against a single-core-pinned run of the same
    # pipeline (taskset -c 0, LONGTR_NATIVE_THREADS=1 LONGTR_SERIAL_BUILD=1
    # — the honest stand-in for the reference's single-threaded C++, which
    # is unbuildable here: htslib/spoa are Makefile network clones).
    if os.environ.get("LONGTR_BENCH_E2E", "1") != "0":
        result.update(_e2e_measurements())

    print(json.dumps(result))
    return 0


def _parse_loci_per_s(text):
    import re
    ms = re.findall(r"->\s*([\d.]+)\s*loci/s", text or "")
    # the scripts print per-pass lines then a final best-of line
    return float(ms[-1]) if ms else None


def _run_e2e(script, args, pin=False, timeout=None):
    """Run a benchmarks/ script in a watchdog subprocess; return loci/s.

    pin=True = the single-core baseline discipline: taskset -c 0 +
    single-threaded native + serial hap build (+ the script's --cpu flag
    must be in args)."""
    if timeout is None:
        timeout = int(os.environ.get("LONGTR_BENCH_E2E_TIMEOUT", "900"))
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = ["taskset", "-c", "0"] if pin else []
    cmd += [sys.executable, os.path.join(here, "benchmarks", script)] + args
    env = dict(os.environ)
    if pin:
        env["LONGTR_NATIVE_THREADS"] = "1"
        env["LONGTR_SERIAL_BUILD"] = "1"
    try:
        out = subprocess.run(cmd, timeout=timeout, capture_output=True,
                             text=True, env=env)
        return _parse_loci_per_s(out.stdout)
    except subprocess.TimeoutExpired:
        return None


def _e2e_measurements():
    """e2e loci/s for short-STR catalog / VNTR catalog / bundled real trio,
    plus their single-core-pinned baselines and ratios.

    A global deadline (LONGTR_BENCH_E2E_BUDGET seconds, default 1500)
    bounds the whole section so a wedged tunnel degrades fields to null
    instead of starving the driver of the JSON line."""
    budget = float(os.environ.get("LONGTR_BENCH_E2E_BUDGET", "1500"))
    deadline = time.time() + budget
    res = {}
    # trio first: the flagship long-read class — if the tunnel is slow and
    # the budget runs dry, the least valuable class (short-STR, host-bound
    # by design) is the one that degrades to null
    runs = [
        # (key, script, device args, pinned-baseline args, device cap s)
        ("trio", "real_data_smoke.py",
         ["40", "--repeat", "3"], ["40", "--cpu", "--repeat", "2"], 900),
        # 60 loci: VNTR loci/s keeps amortizing fixed window costs up to
        # catalog scale (24-locus capture: 13.1 loci/s, 60-locus: ~21)
        ("vntr", "loci_throughput.py",
         ["60", "--vntr", "--repeat", "2"], ["6", "--vntr", "--cpu"], 800),
        ("short_str", "loci_throughput.py",
         ["300", "--repeat", "2"], ["100", "--cpu", "--repeat", "2"], 420),
    ]
    platform = "device"

    def left():
        return deadline - time.time()

    fallbacks = []
    for key, script, dev_args, base_args, cap in runs:
        dev = None
        if left() > 60:
            dev = _run_e2e(script, dev_args,
                           timeout=min(cap, max(60, left())))
        if dev is None and left() > 60:
            # the axon backend occasionally fails transiently
            # (.claude/skills/verify): one retry before giving up on it
            dev = _run_e2e(script, dev_args,
                           timeout=min(cap, max(60, left())))
        if dev is None and left() > 60:
            # tunnel wedged or timed out: CPU-backend fallback (flagged —
            # NOT comparable to TPU captures)
            dev = _run_e2e(script, dev_args + ["--cpu"],
                           timeout=min(cap, max(60, left())))
            if dev is not None:
                fallbacks.append(key)
                platform = "cpu-fallback:" + ",".join(fallbacks)
        base = None
        if left() > 60:
            base = _run_e2e(script, base_args, pin=True,
                            timeout=min(900, max(60, left())))
        res[f"e2e_{key}_loci_per_s"] = round(dev, 2) if dev else None
        res[f"e2e_{key}_single_core_loci_per_s"] = \
            round(base, 3) if base else None
        res[f"e2e_{key}_vs_single_core"] = \
            round(dev / base, 2) if dev and base else None

    # the short-STR class is host-bound; its best configuration is the
    # CPU backend (no tunnel dispatch overhead) with all 4 cores —
    # capture that too so the class's headline number is driver-visible
    if left() > 60:
        cpu_best = _run_e2e("loci_throughput.py",
                            ["300", "--cpu", "--repeat", "2"],
                            timeout=min(420, max(60, left())))
        res["e2e_short_str_cpu_loci_per_s"] = \
            round(cpu_best, 2) if cpu_best else None
        base = res.get("e2e_short_str_single_core_loci_per_s")
        res["e2e_short_str_cpu_vs_single_core"] = \
            round(cpu_best / base, 2) if cpu_best and base else None

    # strongest available baseline: the COMPILED REFERENCE's own
    # genotyping chain on the trio (tests/ref_oracle; single core,
    # genotyping stage only — an upper bound on the reference binary).
    # Only when the oracle .so is already built: bench never compiles it.
    here = os.path.dirname(os.path.abspath(__file__))
    oracle_so = os.path.join(here, "tests", "ref_oracle",
                             "libref_oracle.so")
    ref_cpp = None
    if os.path.exists(oracle_so) and left() > 120:
        import re
        try:
            out = subprocess.run(
                ["taskset", "-c", "0", sys.executable,
                 os.path.join(here, "benchmarks", "ref_cpp_baseline.py"),
                 "trio"], timeout=min(900, left()),
                capture_output=True, text=True)
            m = re.search(r"ref_cpp:\s*([\d.]+)\s*loci/s", out.stdout)
            ref_cpp = float(m.group(1)) if m else None
        except subprocess.TimeoutExpired:
            pass
    res["e2e_trio_ref_cpp_loci_per_s"] = \
        round(ref_cpp, 3) if ref_cpp else None
    dev_trio = res.get("e2e_trio_loci_per_s")
    res["e2e_trio_vs_ref_cpp"] = (round(dev_trio / ref_cpp, 2)
                                  if dev_trio and ref_cpp else None)
    res["e2e_platform"] = platform
    return res


def _mode_b_host_baseline():
    """Single-core host f64 mode-B scorer pairs/s on the bench locus."""
    from longtr_tpu.haplotype.blocks import HapBlock, Haplotype, RepeatBlock
    from longtr_tpu.models.stutter import StutterModel
    from longtr_tpu.pipeline.alignment import Alignment
    from longtr_tpu.pipeline.mode_b import ModeBAligner, calc_seed_base

    rng = np.random.default_rng(2)
    basesl = list("ACGT")
    lf = "".join(rng.choice(basesl, 35).tolist())
    rf = "".join(rng.choice(basesl, 35).tolist())
    rep = "A" * 18
    model = StutterModel(0.9, 0.05, 0.05, 0.9, 0.01, 0.01, "A")
    rs_ = 1000 + len(lf)
    blocks = [HapBlock(1000, rs_, lf)]
    rb = RepeatBlock(rs_, rs_ + len(rep), rep, 1, model)
    for d in (-2, -1, 1):
        rb.add_alternate("A" * (18 + d))
    blocks.append(rb)
    blocks.append(HapBlock(rs_ + len(rep), rs_ + len(rep) + len(rf), rf))
    hap = Haplotype(blocks)
    aligner = ModeBAligner(hap)
    pools = []
    for k in range(16):
        allele = "A" * (18 + int(rng.integers(-2, 2)))
        fl = list(lf + allele + rf)
        for _m in range(int(rng.integers(1, 4))):
            p_ = int(rng.integers(0, len(fl)))
            fl[p_] = str(rng.choice(basesl))
        seq = "".join(fl)
        pools.append(Alignment(1000, 1000 + len(lf) + len(rep) + len(rf) - 1,
                               False, False, f"p{k}", "I" * len(seq), seq,
                               alignment=seq, cigar=[("=", len(seq))]))
    seeds = [calc_seed_base(a, aligner.repeat_starts, aligner.repeat_ends,
                            1000, rs_ + len(rep) + len(rf)) for a in pools]
    pairs = 0
    t0 = time.time()
    for a, s in zip(pools, seeds):
        if s < 0:
            continue
        aligner.score_read(a, int(s))
        pairs += hap.num_combs()
    return pairs / (time.time() - t0)


if __name__ == "__main__":
    sys.exit(main())

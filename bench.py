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
print(json.dumps({"cells_per_s": cells / dt}))
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
                return json.loads(line)["cells_per_s"]
    except subprocess.TimeoutExpired:
        return None
    return None


def main():
    device_cells = None
    for _ in range(2):
        device_cells = measure_device()
        if device_cells is not None:
            break
        time.sleep(30)
    if device_cells is None:
        # tunnel wedged: fall back to the CPU-backend kernel measurement
        device_cells = measure_device(force_cpu=True, timeout=600)
    if device_cells is None:
        print(json.dumps({"metric": "pairhmm_dp_cells_per_s", "value": 0,
                          "unit": "cells/s", "vs_baseline": 0}))
        return 1

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
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

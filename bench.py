"""Benchmark: pair-HMM DP throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-measured: the same DP recurrence executed single-threaded on the host
CPU via the float64 NumPy oracle — the honest stand-in for the reference's
single-threaded C++ inner loop (align_seq_to_hap, HapAligner.cpp:236-343).
``vs_baseline`` = device DP-cells/s ÷ single-core oracle DP-cells/s.
"""

import json
import sys
import time

import numpy as np


def make_batch(rng, B, N, M):
    from longtr_tpu.ops.pairhmm import AlignmentParams, encode_seq

    bases = np.array(list("ACGT"))
    haps, reads = [], []
    for _ in range(B):
        n = int(rng.integers(int(N * 0.8), N))
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
    return (hap_codes, hap_lens, read_codes, read_lens, full_lens,
            AlignmentParams(), haps, reads)


def main():
    rng = np.random.default_rng(0)
    from longtr_tpu.ops.pairhmm import pairhmm_batch_auto as pairhmm_batch
    from longtr_tpu.ops.pairhmm import pairhmm_score_oracle

    # Device throughput: a production-shaped batch (many loci × pools × haps)
    B, N, M = 2048, 192, 192
    hap_codes, hap_lens, read_codes, read_lens, full_lens, params, haps, reads = \
        make_batch(rng, B, N, M)

    def run():
        out = pairhmm_batch(hap_codes, hap_lens, read_codes, read_lens,
                            full_lens, params)
        np.asarray(out)
        return out

    for attempt in range(2):
        try:
            run()  # compile
            break
        except RuntimeError:
            if attempt == 1:
                raise
            time.sleep(5)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    cells = float((hap_lens.astype(np.int64) * read_lens).sum())
    device_cells_per_s = cells / dt

    # Host single-core oracle baseline on a subsample
    K = 8
    t0 = time.time()
    for i in range(K):
        pairhmm_score_oracle(haps[i], reads[i])
    host_dt = time.time() - t0
    host_cells = float(sum(len(haps[i]) * len(reads[i]) for i in range(K)))
    host_cells_per_s = host_cells / host_dt

    result = {
        "metric": "pairhmm_dp_cells_per_s",
        "value": round(device_cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(device_cells_per_s / host_cells_per_s, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

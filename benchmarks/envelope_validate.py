"""Hardware validation of the Pallas kernel envelopes (run on the TPU).

Re-runs the envelope discipline from .claude/skills/verify/SKILL.md after
any kernel change: random batches at the resident envelope edge and at
every chunked envelope step are scored by the Pallas path and compared
bit-for-bit against the native C++ scorer (the production fallback).

Two pair classes per shape:
  * finite: ~20 substitutions + small length skew, so best-path scores
    stay above the -600 band clamp and exercise the interior DP; and
  * band-fail: 1% mutations, which at these lengths drives every pair
    to the -700 early-abort score (HapAligner.cpp:282-307 semantics)
    and exercises the abort bookkeeping.
A run that validated only band-fail pairs would prove nothing about the
recurrences — assert both classes per shape.

Usage: python benchmarks/envelope_validate.py [--quick]
(--quick = 16k + 40960 chunked only; default also does 24k/32k and the
resident 13kb edge).  Runs the real backend; do NOT pass a CPU override.
"""
import os
import sys
import time

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)

from longtr_tpu.ops.pairhmm import AlignmentParams, enable_compile_cache
from longtr_tpu.ops.pairhmm_pallas import (chunked_fits,
                                           pairhmm_batch_pallas, pallas_fits)
from longtr_tpu.native import pairhmm_batch_native


def make_batch(N, rng, finite):
    B = 4
    hap = rng.integers(0, 4, size=(B, N), dtype=np.uint8)
    read = np.array(hap)
    if finite:
        for b in range(B):
            pos = rng.choice(N - 100, size=20, replace=False)
            read[b, pos] = (read[b, pos] + 1) % 4
        rl = np.asarray([N, N - 3, N - 1, N - 7], np.int32)
    else:
        mut = rng.random(read.shape) < 0.01
        read[mut] = (read[mut] + 1 + rng.integers(0, 3, mut.sum())) % 4
        rl = np.full(B, N, np.int32)
    hl = np.full(B, N, np.int32)
    return hap, hl, read, rl, hl + 60


def main():
    quick = "--quick" in sys.argv
    enable_compile_cache()
    params = AlignmentParams()
    trans = params.as_array()
    shapes = []
    res_edge = 8192 if quick else 13312  # resident envelope region
    if pallas_fits(res_edge, res_edge):
        shapes.append(("resident", res_edge))
    chunk_sizes = (16384, 40960) if quick else (16384, 24576, 32768, 40960)
    shapes += [("chunked", n) for n in chunk_sizes if chunked_fits(n, n)]
    for kind, N in shapes:
        for finite in (True, False):
            rng = np.random.default_rng(N + (7 if finite else 0))
            hap, hl, read, rl, fl = make_batch(N, rng, finite)
            t0 = time.time()
            dev = np.asarray(pairhmm_batch_pallas(hap, hl, read, rl, fl,
                                                  params))
            wall = time.time() - t0
            nat = pairhmm_batch_native(hap, hl, read, rl, fl, trans)
            ok = np.array_equal(dev, nat)
            nfin = int((dev > -650).sum())
            want = len(dev) if finite else 0
            label = "finite" if finite else "band-fail"
            print(f"{kind} N={N} [{label}]: bit-identical={ok} "
                  f"finite={nfin}/{len(dev)} wall={wall:.1f}s", flush=True)
            assert ok, (kind, N, label, dev, nat)
            assert nfin == want, (kind, N, label, "wrong score class",
                                  dev)
    print("envelope validation clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())

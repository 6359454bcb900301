"""Pallas pair-HMM kernel vs the jnp scan implementation (interpret mode)."""

import numpy as np
import pytest

from longtr_tpu.ops.pairhmm import AlignmentParams, encode_seq, pairhmm_batch
from longtr_tpu.ops.pairhmm_pallas import pairhmm_batch_pallas

RNG = np.random.default_rng(77)
BASES = np.array(list("ACGT"))


def make_batch(B, nmin=20, nmax=120):
    haps, reads = [], []
    for _ in range(B):
        n = int(RNG.integers(nmin, nmax))
        hap = "".join(RNG.choice(BASES, n))
        read = []
        for ch in hap:
            r = RNG.random()
            if r < 0.005:
                continue
            read.append(ch if r > 0.02 else str(RNG.choice(BASES)))
        haps.append(hap)
        reads.append("".join(read))
    N = max(len(h) for h in haps)
    M = max(len(r) for r in reads)
    H = np.stack([encode_seq(h, N) for h in haps])
    R = np.stack([encode_seq(r, M) for r in reads])
    hl = np.array([len(h) for h in haps], np.int32)
    rl = np.array([len(r) for r in reads], np.int32)
    return H, hl, R, rl, hl + 60


# Interpret mode executes every op per grid step, so keep shapes tiny here;
# full-size numeric validation against the scan runs on real hardware in
# bench.py / verification.

def test_pallas_matches_scan():
    H, hl, R, rl, fl = make_batch(6, 10, 28)
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                          tile_b=8))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pallas_gates_and_bandfail():
    # length-difference gate, short-hap gate, band fail
    H, hl, R, rl, fl = make_batch(4, 15, 30)
    fl[0] = 60                    # short hap -> -1e9
    # make pair 1 totally dissimilar -> band fail expected
    R[1] = encode_seq("G" * int(rl[1]), R.shape[1])
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                          tile_b=8))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pallas_custom_params():
    H, hl, R, rl, fl = make_batch(4, 10, 25)
    params = AlignmentParams.from_list([-2.0, -0.3, -1.5, -0.25, -0.0001,
                                        -8.0, -9.0])
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl, params))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, params,
                                          interpret=True, tile_b=8))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pallas_long_shapes():
    """Long-VNTR shapes (hap to ~1088, read to 1024): the kernel's sublane
    cummax and VMEM-resident rows must stay bit-identical to the scan."""
    rng = np.random.default_rng(6)
    bases = np.array(list("ACGT"))
    N, M, B = 544, 512, 8
    haps = ["".join(rng.choice(bases, size=int(rng.integers(N // 2, N))))
            for _ in range(B)]
    reads = ["".join(ch for ch in h if rng.random() > 0.01)[:M] for h in haps]
    hap_codes = np.stack([encode_seq(h, N) for h in haps])
    read_codes = np.stack([encode_seq(r, M) for r in reads])
    hl = np.array([len(h) for h in haps], np.int32)
    rl = np.array([len(r) for r in reads], np.int32)
    fl = hl + 60
    pal = np.asarray(pairhmm_batch_pallas(hap_codes, hl, read_codes, rl, fl,
                                          interpret=True, tile_b=8))
    ref = np.asarray(pairhmm_batch(hap_codes, hl, read_codes, rl, fl,
                                   AlignmentParams()))
    assert np.array_equal(pal, ref)


def test_band_with_large_length_skew():
    """Lanes whose true alignment rides a far-off diagonal (|n-m| of
    several hundred bp, e.g. a read spanning a large repeat contraction).

    The band term |(n-m) - (i-j)| is what keeps such alignments alive:
    it zeroes out exactly on the shifted diagonal j = i - (n-m).  A sign
    slip ((m-n) instead of (n-m)) penalizes the true diagonal by 2|n-m|
    and flips these scores to the -700 band-fail — while staying
    invisible at |n-m| ~ a few bp, which is all the other tests (and the
    original 192bp hardware check) exercise.  Regression for exactly that
    bug, caught on hardware at N=M=2560 during the round-3 kernel rework."""
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    N = 1024
    haps, reads = [], []
    for k in range(8):
        hap = "".join(rng.choice(bases, size=N - int(rng.integers(0, 40))))
        skew = int(rng.integers(250, 550)) * (1 if k % 2 else -1)
        if skew > 0:    # read deletes `skew` bases mid-hap (n - m = skew)
            cut = len(hap) // 2
            read = hap[:cut] + hap[cut + skew:]
        else:           # read inserts |skew| bases (n - m = skew < 0)
            cut = len(hap) // 2
            read = hap[:cut] + "".join(rng.choice(bases, -skew)) + hap[cut:]
        # sprinkle mismatches so scores sit mid-range, not at 0
        rd = list(read)
        for p in rng.integers(0, len(rd), size=len(rd) // 50):
            rd[p] = str(rng.choice(bases))
        haps.append(hap)
        reads.append("".join(rd))
    Nmax = max(len(h) for h in haps)
    Mmax = max(len(r) for r in reads)
    H = np.stack([encode_seq(h, Nmax) for h in haps])
    R = np.stack([encode_seq(r, Mmax) for r in reads])
    hl = np.array([len(h) for h in haps], np.int32)
    rl = np.array([len(r) for r in reads], np.int32)
    fl = hl + 60
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl))
    # the skewed-but-alignable lanes must not be band-fails in the oracle
    assert (want > -700.0).any()
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                          tile_b=8))
    assert np.array_equal(got, want)
    gotc = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                           tile_b=8, jc=256))
    assert np.array_equal(gotc, want)


def test_chunked_matches_scan_multi_chunk():
    """J-chunked kernel across 3+ chunks must be bit-identical to the scan
    (cross-chunk pred/cummax/band carries exercised)."""
    H, hl, R, rl, fl = make_batch(8, 100, 200)
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                          tile_b=8, jc=64))
    assert np.array_equal(got, want)


def test_chunked_single_chunk_and_boundaries():
    """Edge cases: reads shorter than one chunk, read end exactly at a
    chunk boundary, n==1 haplotypes, and band-fail pairs."""
    H, hl, R, rl, fl = make_batch(8, 30, 130)
    rl_pad = R.shape[1]
    # read length exactly at the chunk boundary for pair 0
    if rl_pad >= 64:
        rl[0] = 64
    hl[1] = 1                      # single-row haplotype
    R[2] = encode_seq("G" * int(rl[2]), R.shape[1])   # band fail
    fl[3] = 60                     # short-hap gate
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                          tile_b=8, jc=64))
    assert np.array_equal(got, want)


def test_chunked_custom_params():
    H, hl, R, rl, fl = make_batch(4, 80, 150)
    params = AlignmentParams.from_list([-2.0, -0.3, -1.5, -0.25, -0.0001,
                                        -8.0, -9.0])
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl, params))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, params,
                                          interpret=True, tile_b=8, jc=64))
    assert np.array_equal(got, want)


def test_chunked_multi_batch_tile_scratch_reuse():
    """Batch tiles beyond the first reuse the kernel's scratch rows: the
    stale epred/ecm/ermax carries from tile b-1 must be fully discarded at
    (tile b, chunk 0).  All other tests stay within one batch tile, which
    leaves that masking unexercised (tile_b=4 with B=12 -> 3 tiles here,
    each spanning several chunks)."""
    H, hl, R, rl, fl = make_batch(12, 60, 140)
    want = np.asarray(pairhmm_batch(H, hl, R, rl, fl))
    got = np.asarray(pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True,
                                          tile_b=4, jc=32))
    assert np.array_equal(got, want)


def test_envelope_guard_refuses_oversize():
    """Out-of-envelope shapes must raise instead of dispatching (a Mosaic
    VMEM-OOM compile wedges the shared tunnel); jc < 2 must raise too."""
    H, hl, R, rl, fl = make_batch(2, 30, 60)
    with pytest.raises(ValueError, match="jc must be >= 2"):
        pairhmm_batch_pallas(H, hl, R, rl, fl, interpret=True, jc=1)
    from longtr_tpu.ops import pairhmm_pallas as pp
    big_n = pp.CHUNKED_N_CAP + 1024
    Hb = np.zeros((2, big_n), np.uint8)
    Rb = np.zeros((2, big_n), np.uint8)
    hlb = np.array([big_n, big_n], np.int32)
    assert not pp.pallas_fits(big_n, big_n) \
        and not pp.chunked_fits(big_n, big_n)
    with pytest.raises(ValueError, match="envelope"):
        pairhmm_batch_pallas(Hb, hlb, Rb, hlb, hlb, interpret=False)

"""Adversarial POA consensus property tests (VERDICT r2 item 9).

The reference's POA is the external spoa library, whose sources are not in
the snapshot (Makefile:93-111 clones it at build time), so direct oracle
parity is environmentally unprovable.  What IS provable locally:

* algebraic properties any POA consensus must satisfy (identity on
  unanimous clusters, majority recovery under a single divergent read,
  determinism);
* that the native C++ fast path and the pure-Python graph are
  interchangeable (equality fuzz over adversarial clusters), so the
  production path has a second independent implementation checking it.

PARITY.md carries the residual caveat for spoa itself.
"""

import numpy as np
import pytest

from longtr_tpu.haplotype.poa import PoaGraph
from longtr_tpu import native

RNG = np.random.default_rng(20260819)
BASES = list("ACGT")


def rand_seq(n, rng=RNG):
    return "".join(rng.choice(BASES, size=n))


def python_consensus(seqs):
    g = PoaGraph()
    for s in seqs:
        g.add_sequence(s)
    return g.consensus()


def native_consensus(seqs):
    out = native.poa_consensus(seqs)
    if out is None:
        pytest.skip("native library unavailable")
    return out


def mutate(s, rng, subs=0, ins=0, dels=0):
    s = list(s)
    for _ in range(subs):
        i = int(rng.integers(0, len(s)))
        s[i] = str(rng.choice([b for b in BASES if b != s[i]]))
    for _ in range(ins):
        i = int(rng.integers(0, len(s) + 1))
        s.insert(i, str(rng.choice(BASES)))
    for _ in range(dels):
        if len(s) > 1:
            del s[int(rng.integers(0, len(s)))]
    return "".join(s)


def test_unanimous_cluster_is_identity():
    for n in (2, 3, 5, 8, 16, 30):
        for L in (5, 20, 80, 200):
            s = rand_seq(L)
            seqs = [s] * n
            assert python_consensus(seqs) == s, (n, L)
            assert native_consensus(seqs) == s, (n, L)


def _edit_distance(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_single_divergent_read_majority_substitutions():
    """A substitution-only divergent read never changes the consensus of a
    >=3-read majority (per-column weights dominate)."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        L = int(rng.integers(10, 120))
        s = rand_seq(L, rng)
        n = int(rng.integers(3, 12))
        bad = mutate(s, rng, subs=int(rng.integers(1, 5)))
        pos = int(rng.integers(0, n))
        seqs = [s] * n
        seqs[pos] = bad
        assert python_consensus(seqs) == s, trial
        assert native_consensus(seqs) == s, trial


def test_single_divergent_read_majority_indels_bounded():
    """Indel-carrying divergent reads: additive path weight means a POA
    consensus may legitimately absorb a boundary insertion (real spoa does
    the same — the heaviest path sums edge weights), but the damage is
    bounded by the divergent read's own edit distance."""
    rng = np.random.default_rng(8)
    for trial in range(40):
        L = int(rng.integers(10, 120))
        s = rand_seq(L, rng)
        n = int(rng.integers(3, 12))
        k_ins, k_del = int(rng.integers(0, 3)), int(rng.integers(0, 3))
        bad = mutate(s, rng, subs=int(rng.integers(1, 4)),
                     ins=k_ins, dels=k_del)
        pos = int(rng.integers(0, n))
        seqs = [s] * n
        seqs[pos] = bad
        for fn in (python_consensus, native_consensus):
            got = fn(seqs)
            assert _edit_distance(got, s) <= k_ins + k_del, \
                (trial, s, bad, got)


def test_determinism_and_majority_permutation_invariance():
    rng = np.random.default_rng(11)
    for trial in range(20):
        L = int(rng.integers(15, 90))
        s = rand_seq(L, rng)
        # substitution-only variant: boundary insertions may legitimately
        # join the heaviest path when the variant seeds the backbone (see
        # the bounded-indel test above)
        variant = mutate(s, rng, subs=2)
        # 3/4 majority: consensus must be s under any read ordering
        seqs = [s, s, s, variant]
        orders = [seqs, seqs[::-1], [seqs[i] for i in (1, 3, 0, 2)]]
        for o in orders:
            assert python_consensus(o) == s, trial
            assert native_consensus(o) == s, trial
        # determinism: repeated evaluation of the same ordering is stable
        assert python_consensus(seqs) == python_consensus(seqs)
        assert native_consensus(seqs) == native_consensus(seqs)


def test_native_matches_python_fuzz():
    """The C++ fast path and the Python graph agree on adversarial
    clusters: mixed indels/substitutions, ties, short and long reads,
    cluster sizes 2-30."""
    rng = np.random.default_rng(23)
    n_checked = 0
    for trial in range(150):
        L = int(rng.integers(4, 150))
        base = rand_seq(L, rng)
        n = int(rng.integers(2, 31))
        seqs = []
        for _ in range(n):
            seqs.append(mutate(base, rng,
                               subs=int(rng.integers(0, 4)),
                               ins=int(rng.integers(0, 3)),
                               dels=int(rng.integers(0, 3))))
        want = python_consensus(seqs)
        got = native_consensus(seqs)
        assert got == want, (trial, seqs[:4], want, got)
        n_checked += 1
    assert n_checked == 150


def test_native_matches_python_midscale_and_simd_boundaries():
    """Distilled from the int16-DP + SIMD prefix-max rework of the native
    POA: widths straddling the 16-lane vector boundary (the scalar tail
    path), plus mid/VNTR-scale clusters whose left-gap cascades stress
    the vectorized scan.  The narrow-DP gate itself (nodes+m+2 < 28000)
    was differentially validated int16-vs-int32 up to nodes+m ~ 31k at
    rework time; here the Python graph is the independent check."""
    rng = np.random.default_rng(20260820)
    for trial in range(18):
        L = int(rng.choice([14, 15, 16, 17, 31, 32, 33, 48, 400, 1201]))
        base = rand_seq(L, rng)
        n = int(rng.integers(2, 7))
        seqs = [mutate(base, rng,
                       subs=int(rng.integers(0, max(2, L // 8))),
                       ins=int(rng.integers(0, 4)),
                       dels=int(rng.integers(0, 4)))
                for _ in range(n)]
        want = python_consensus(seqs)
        got = native_consensus(seqs)
        assert got == want, (trial, L, n, want, got)


def test_two_way_tie_is_deterministic_and_plausible():
    """Even 2-read clusters with disagreement must return one of the
    inputs' bases at every column, deterministically."""
    rng = np.random.default_rng(31)
    for trial in range(30):
        L = int(rng.integers(8, 60))
        a = rand_seq(L, rng)
        b = mutate(a, rng, subs=2)
        got_py = python_consensus([a, b])
        got_nat = native_consensus([a, b])
        assert got_py == python_consensus([a, b])
        assert got_nat == native_consensus([a, b])
        assert got_py == got_nat, trial
        # every column of the consensus is drawn from one of the reads
        assert all(c in BASES for c in got_py)


def test_native_banded_matches_python_at_band_scale():
    """Regression net for the round-5 BANDED native POA (exactness-proof
    band, windows on min/max source-path depth — longtr_native.cc
    align()).  Sizes here engage the band (m > 129 so 2B+1 < m at the
    initial B), across the regimes that matter:

    * low-error clusters (the band verifies on the first attempt),
    * indel clusters (band + skewed depth windows),
    * DIFFERENT large insertions per read — the exact mode that exposed
      the unsound topo-index windows during development (ring/bubble
      alternates displace topo positions arbitrarily; a 400bp-insert
      case produced a divergent consensus before the depth-window fix),
    * heavy noise (verification fails; ladder + unbanded fallback), and
    * band-memory reuse across a cluster (homogeneous reads after a
      divergent first pair).
    """
    rng = np.random.default_rng(20260820)
    for trial in range(16):
        mode = trial % 4
        L = int(rng.integers(200, 1800))
        base = rand_seq(L, rng)
        k = int(rng.integers(2, 8))
        seqs = []
        for _ in range(k):
            s = list(base)
            if mode == 0:      # low error: first-band accept path
                for i in range(len(s)):
                    if rng.random() < 0.004:
                        s[i] = str(rng.choice(BASES))
            elif mode == 1:    # scattered indels: depth-window skew
                out = []
                for ch in s:
                    r = rng.random()
                    if r < 0.005:
                        continue
                    out.append(ch)
                    if r > 0.995:
                        out.append(str(rng.choice(BASES)))
                s = out
            elif mode == 2:    # per-read large insert: the bug-catcher
                ins = rand_seq(int(rng.integers(50, 400)), rng)
                p = int(rng.integers(0, len(s)))
                s = s[:p] + list(ins) + s[p:]
                for i in range(len(s)):
                    if rng.random() < 0.005:
                        s[i] = str(rng.choice(BASES))
            else:              # heavy noise: verification-failure path
                for i in range(len(s)):
                    if rng.random() < 0.15:
                        s[i] = str(rng.choice(BASES))
            seqs.append("".join(s))
        want = python_consensus(seqs)
        got = native_consensus(seqs)
        assert got == want, (trial, mode, L, k)

"""Posterior kernel vs float64 oracle (src/genotyper.cpp:45-83)."""

import numpy as np

from longtr_tpu.ops.posterior import (
    calc_log_sample_posteriors, genotype_log_priors, map_genotypes,
    posteriors_oracle)

RNG = np.random.default_rng(7)


def random_case(R=40, A=5, S=3, haploid=False, phased=False):
    LL = -RNG.exponential(20, size=(R, A))
    LL[RNG.random((R, A)) < 0.05] = -900  # exercise the -600 clamp
    if phased:
        p1 = np.where(RNG.random(R) < 0.5, -1e-6, -1000.0)
        p2 = np.where(p1 == -1e-6, -1000.0, -1e-6)
    else:
        p1 = np.zeros(R)
        p2 = np.zeros(R)
    labels = RNG.integers(0, S, size=R).astype(np.int32)
    return LL, p1, p2, labels


def check(R=40, A=5, S=3, haploid=False, phased=False):
    LL, p1, p2, labels = random_case(R, A, S, haploid, phased)
    want_P, want_tot, want_LL = posteriors_oracle(LL, p1, p2, labels, S, haploid)
    prior = genotype_log_priors(A, haploid)
    with np.errstate(over="ignore"):
        # the haploid het prior (-DBL_MAX/2) intentionally becomes -inf in f32
        prior32 = prior.astype(np.float32)
    got_P, got_tot, got_LL = calc_log_sample_posteriors(
        LL.astype(np.float32), p1.astype(np.float32), p2.astype(np.float32),
        labels, S, prior32)
    got_P = np.asarray(got_P, dtype=np.float64)
    # normalized log posteriors: compare where not astronomically small
    mask = want_P > -50
    np.testing.assert_allclose(got_P[mask], want_P[mask], atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_tot), want_tot, rtol=1e-5, atol=1e-2)
    # MAP genotypes must agree
    wa = np.argmax(want_P.reshape(S, -1), axis=1)
    ga, gb = map_genotypes(got_P)
    np.testing.assert_array_equal(np.asarray(ga) * A + np.asarray(gb), wa)


def test_diploid_unphased():
    check()


def test_diploid_phased():
    check(R=60, A=4, S=4, phased=True)


def test_haploid():
    check(R=30, A=6, S=2, haploid=True)


def test_single_allele():
    check(R=10, A=1, S=2)


def test_priors_sum_to_one():
    for A in (1, 2, 5, 17):
        p = genotype_log_priors(A, haploid=False)
        assert abs(np.exp(p).sum() - 1.0) < 1e-9
        ph = genotype_log_priors(A, haploid=True)
        assert abs(np.exp(np.diag(ph)).sum() - 1.0) < 1e-9


def test_read_mask_excludes_padding():
    LL, p1, p2, labels = random_case(R=20, A=3, S=2)
    prior = genotype_log_priors(3, False)
    want_P, _, _ = posteriors_oracle(LL[:15], p1[:15], p2[:15], labels[:15], 2, False)
    mask = np.arange(20) < 15
    got_P, _, _ = calc_log_sample_posteriors(
        LL.astype(np.float32), p1.astype(np.float32), p2.astype(np.float32),
        labels, 2, prior.astype(np.float32), read_mask=mask)
    m = want_P > -50
    np.testing.assert_allclose(np.asarray(got_P, dtype=np.float64)[m], want_P[m], atol=5e-3)


def test_host_posteriors_clamp_ll_in_place():
    """The reference clamps log_aln_probs IN PLACE at -600 inside the
    posterior loop (genotyper.cpp:57-58); downstream per-read VCF stats
    (strand pick, MALLREADS) must see the clamped array, else a -700
    band-abort sentinel flips their comparisons (parity regression)."""
    from longtr_tpu.pipeline.seq_genotyper import SeqStutterGenotyper

    gt = object.__new__(SeqStutterGenotyper)
    gt.num_alleles = 2
    gt.num_samples = 1
    gt.haploid = False
    gt.log_aln_probs = np.array([[-700.0, -620.0], [-1.0, -2.0]])
    gt.log_p1 = np.zeros(2)
    gt.log_p2 = np.zeros(2)
    gt.sample_label = np.zeros(2, dtype=np.int32)
    gt._calc_posteriors()
    assert gt.log_aln_probs.min() == -600.0
    assert gt.log_aln_probs[0, 0] == -600.0 and gt.log_aln_probs[0, 1] == -600.0

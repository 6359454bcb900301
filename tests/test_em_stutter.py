"""EM stutter-model recovery (reference analog: test/em_stutter_test.cpp +
the run_stutter_em_tests.sh parameter sweep)."""

import numpy as np
import pytest

from longtr_tpu.models.em import EMStutterGenotyper
from longtr_tpu.models.stutter import StutterModel

RNG = np.random.default_rng(99)


def simulate_reads(model: StutterModel, allele_pairs, reads_per_sample):
    """Simulate per-sample read bp-diffs from diploid genotypes + stutter."""
    diffs = np.arange(-30, 31)
    pmf = np.exp(model.log_pmf_table(diffs))
    pmf /= pmf.sum()
    out = []
    for a, b in allele_pairs:
        sample = []
        for _ in range(reads_per_sample):
            allele = a if RNG.random() < 0.5 else b
            sample.append(int(allele + RNG.choice(diffs, p=pmf)))
        out.append(sample)
    return out


def test_em_recovers_stutter_params():
    truth = StutterModel(0.9, 0.10, 0.12, 0.85, 0.015, 0.015, "NN")
    alleles = [(0, 0), (0, 4), (4, 4), (0, -4), (-4, 4), (0, 0), (4, 8), (0, 8)]
    pairs = alleles * 12  # 96 samples
    num_bps = simulate_reads(truth, pairs, 30)
    zeros = [[0.0] * len(s) for s in num_bps]
    em = EMStutterGenotyper(False, "NN", num_bps, zeros, zeros,
                            [f"S{i}" for i in range(len(pairs))])
    assert em.train()
    m = em.stutter_model
    assert m.in_up == pytest.approx(truth.in_up, abs=0.05)
    assert m.in_down == pytest.approx(truth.in_down, abs=0.05)
    assert m.in_geom == pytest.approx(truth.in_geom, abs=0.1)
    assert m.out_up == pytest.approx(truth.out_up, abs=0.03)
    assert m.out_down == pytest.approx(truth.out_down, abs=0.03)


def test_em_genotypes_are_map_consistent():
    truth = StutterModel(0.95, 0.05, 0.05, 0.95, 0.01, 0.01, "NNN")
    pairs = [(0, 6), (0, 0), (6, 6), (3, 6)] * 10
    num_bps = simulate_reads(truth, pairs, 25)
    zeros = [[0.0] * len(s) for s in num_bps]
    em = EMStutterGenotyper(False, "NNN", num_bps, zeros, zeros,
                            [f"S{i}" for i in range(len(pairs))])
    assert em.train()
    # MAP genotypes should match the simulated diploid lengths
    P = em.posteriors
    A = em.num_alleles
    flat = np.argmax(P.reshape(len(pairs), -1), axis=1)
    correct = 0
    for s, (a, b) in enumerate(pairs):
        ga, gb = divmod(flat[s], A)
        got = tuple(sorted((em.bps_per_allele[ga], em.bps_per_allele[gb])))
        correct += got == tuple(sorted((a, b)))
    assert correct >= 0.9 * len(pairs)


def test_em_haploid():
    truth = StutterModel(0.9, 0.08, 0.08, 0.9, 0.01, 0.01, "N")
    pairs = [(0, 0), (3, 3), (0, 0), (5, 5)] * 8
    num_bps = simulate_reads(truth, pairs, 20)
    zeros = [[0.0] * len(s) for s in num_bps]
    em = EMStutterGenotyper(True, "N", num_bps, zeros, zeros,
                            [f"S{i}" for i in range(len(pairs))])
    assert em.train()


def test_em_mesh_estep_matches_host():
    """The read-sharded device E-step (psum collectives) trains to the same
    stutter model as the host path on the 8-device CPU mesh."""
    from longtr_tpu.parallel.mesh import make_mesh

    truth = StutterModel(0.9, 0.10, 0.12, 0.85, 0.015, 0.015, "NN")
    alleles = [(0, 0), (0, 4), (4, 4), (0, -4), (-4, 4), (4, 8)]
    pairs = alleles * 8
    num_bps = simulate_reads(truth, pairs, 25)
    zeros = [[0.0] * len(s) for s in num_bps]
    names = [f"S{i}" for i in range(len(pairs))]

    host = EMStutterGenotyper(False, "NN", num_bps, zeros, zeros, names)
    assert host.train()
    mesh_em = EMStutterGenotyper(False, "NN", num_bps, zeros, zeros, names)
    assert mesh_em.train(mesh=make_mesh(8))

    h, m = host.stutter_model, mesh_em.stutter_model
    # f32 device E-step + exact-vs-fast phase LSE leave small drift
    assert m.in_geom == pytest.approx(h.in_geom, abs=2e-3)
    assert m.in_up == pytest.approx(h.in_up, abs=2e-3)
    assert m.in_down == pytest.approx(h.in_down, abs=2e-3)
    assert m.out_geom == pytest.approx(h.out_geom, abs=2e-3)
    assert m.out_up == pytest.approx(h.out_up, abs=2e-3)
    assert m.out_down == pytest.approx(h.out_down, abs=2e-3)
    # posteriors agree too (replicated psum result vs host accumulation)
    np.testing.assert_allclose(mesh_em.posteriors, host.posteriors,
                               atol=1e-3)


def test_em_mesh_recovers_stutter_params():
    """EM through the mesh E-step still recovers simulation truth."""
    from longtr_tpu.parallel.mesh import make_mesh

    truth = StutterModel(0.9, 0.10, 0.12, 0.85, 0.015, 0.015, "NN")
    alleles = [(0, 0), (0, 4), (4, 4), (0, -4), (-4, 4), (0, 0), (4, 8), (0, 8)]
    pairs = alleles * 12
    num_bps = simulate_reads(truth, pairs, 30)
    zeros = [[0.0] * len(s) for s in num_bps]
    em = EMStutterGenotyper(False, "NN", num_bps, zeros, zeros,
                            [f"S{i}" for i in range(len(pairs))])
    assert em.train(mesh=make_mesh(8))
    m = em.stutter_model
    assert m.in_up == pytest.approx(truth.in_up, abs=0.05)
    assert m.in_down == pytest.approx(truth.in_down, abs=0.05)
    assert m.in_geom == pytest.approx(truth.in_geom, abs=0.1)
    assert m.out_up == pytest.approx(truth.out_up, abs=0.03)
    assert m.out_down == pytest.approx(truth.out_down, abs=0.03)


def test_em_mesh_haploid_matches_host():
    """Haploid mesh EM (diagonal prior with -inf off-diagonals in the
    device loop) agrees with the host path."""
    from longtr_tpu.parallel.mesh import make_mesh

    truth = StutterModel(0.9, 0.08, 0.10, 0.85, 0.015, 0.015, "NN")
    alleles = [(0, 0), (4, 4), (-4, -4), (8, 8)]
    pairs = alleles * 10
    num_bps = simulate_reads(truth, pairs, 25)
    zeros = [[0.0] * len(s) for s in num_bps]
    names = [f"S{i}" for i in range(len(pairs))]

    host = EMStutterGenotyper(True, "NN", num_bps, zeros, zeros, names)
    assert host.train()
    mesh_em = EMStutterGenotyper(True, "NN", num_bps, zeros, zeros, names)
    assert mesh_em.train(mesh=make_mesh(8))
    h, m = host.stutter_model, mesh_em.stutter_model
    for attr in ("in_geom", "in_up", "in_down",
                 "out_geom", "out_up", "out_down"):
        assert getattr(m, attr) == pytest.approx(getattr(h, attr), abs=5e-3)

"""EM stutter-training parity against the COMPILED reference
(em_stutter_genotyper.cpp via tests/ref_oracle).

The oracle runs the real ``EMStutterGenotyper::train`` and, via a
step-replay cross-checked against it inside the wrapper (ro_em_train
returns -2/-3 if the replay ever diverges), records the bit-exact LL after
every E-step.  Our ``models/em.py`` must reproduce — in reference-fidelity
math mode — the per-iteration LL trajectory, the final
(in_geom, in_up, in_down, out_geom, out_up, out_down) parameters, and the
full final posterior tensor, all BIT FOR BIT.

The fidelity path mirrors the reference's floating-point operation order:
raw log(exp+exp) posterior accumulation in read order (genotyper.cpp:45-83),
streaming-LSE prior recounts (em_stutter_genotyper.cpp:21-56), category-list
push order with int_log magnitudes and the exact/fast LSE split in the
M step (:63-127), and scalar libm exp/log (numpy's SIMD array ufuncs differ
from libm in the last ulp).
"""

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.models.em import EMStutterGenotyper
from longtr_tpu.utils import mathops

pytestmark = pytest.mark.skipif(ro.get_lib() is None,
                                reason="reference oracle unavailable")


def gen_reads(n_samples, seed, motif_len=3, frame_mix=False):
    """Per-sample read bp-diffs + phasing factors for a synthetic locus."""
    rng = np.random.default_rng(seed)
    num_bps, p1s, p2s = [], [], []
    for _s in range(n_samples):
        n = int(rng.integers(3, 12))
        true = int(rng.choice([0, motif_len, 2 * motif_len, -motif_len]))
        bps = []
        for _ in range(n):
            b = true
            if rng.random() < 0.3:
                b += motif_len * int(rng.integers(-1, 2))
            if frame_mix and rng.random() < 0.25:
                b += int(rng.integers(1, motif_len))
            bps.append(int(b))
        num_bps.append(bps)
        p1s.append([float(np.log(rng.uniform(0.2, 1.0))) for _ in range(n)])
        p2s.append([float(np.log(rng.uniform(0.2, 1.0))) for _ in range(n)])
    return num_bps, p1s, p2s


def assert_em_bit_parity(haploid, motif, num_bps, p1s, p2s, ref_allele=0):
    want = ro.em_train(haploid, motif, num_bps, p1s, p2s, ref_allele,
                       want_posteriors=True)
    mathops.set_ref_fidelity(True)
    try:
        em = EMStutterGenotyper(haploid, motif, num_bps, p1s, p2s,
                                [f"S{i}" for i in range(len(num_bps))],
                                ref_allele=ref_allele)
        traj = []
        orig = em._calc_posteriors_fid
        em._calc_posteriors_fid = \
            lambda LL, _o=orig, _t=traj: (_t.append(_o(LL)) or _t[-1])
        ok = em.train()
    finally:
        mathops.set_ref_fidelity(False)
    assert ok == want["converged"]
    assert len(traj) == want["n_iter"], \
        f"iterations: ref={want['n_iter']} ours={len(traj)}"
    for it, (a, b) in enumerate(zip(want["ll_traj"], traj)):
        assert a == b, f"LL at iteration {it}: ref={a!r} ours={b!r}"
    if ok:
        sm = em.stutter_model
        got = np.array([sm.in_geom, sm.in_up, sm.in_down,
                        sm.out_geom, sm.out_up, sm.out_down])
        assert np.array_equal(got, want["params"]), \
            f"params: ref={want['params']} ours={got}"
        assert np.array_equal(em.posteriors, want["log_posteriors"])


def test_em_train_bit_parity_sweep():
    """Periods 1-4, in-frame-only and frame-mixed reads, both ploidies."""
    for ci, (ml, fm) in enumerate([(3, False), (3, True), (1, False),
                                   (4, True), (2, True)]):
        motif = "ACGT"[:ml] if ml > 1 else "A"
        for seed in range(4):
            for haploid in (False, True):
                num_bps, p1s, p2s = gen_reads(5, 1000 * ci + seed, ml, fm)
                assert_em_bit_parity(haploid, motif, num_bps, p1s, p2s)


def test_em_train_bit_parity_nonzero_ref_allele():
    """ref_allele != 0 reorders the allele list (ctor, em_stutter_genotyper.h)."""
    num_bps, p1s, p2s = gen_reads(6, 42, motif_len=3)
    assert_em_bit_parity(False, "ACG", num_bps, p1s, p2s, ref_allele=3)


def test_em_train_bit_parity_single_sample_many_reads():
    rng = np.random.default_rng(9)
    n = 60
    bps = [int(2 * rng.integers(-3, 4)) for _ in range(n)]
    p1 = [float(np.log(rng.uniform(0.2, 1.0))) for _ in range(n)]
    p2 = [float(np.log(rng.uniform(0.2, 1.0))) for _ in range(n)]
    assert_em_bit_parity(False, "AT", [bps], [p1], [p2])


def test_em_default_path_tracks_fidelity():
    """The production (vectorized-exact) EM must agree with the bit-exact
    fidelity path to the reference's own fast-LSE precision: the fidelity
    M step uses the Mineiro fasterlog/fasterexp approximations (~1e-3
    relative), so parameters can drift at the few-percent level across iterations (and cross the
    0.999 p_geom clamp) without implying a logic divergence."""
    for seed in (3, 7):
        num_bps, p1s, p2s = gen_reads(5, seed, motif_len=3, frame_mix=True)
        names = [f"S{i}" for i in range(5)]
        em_d = EMStutterGenotyper(False, "ACG", num_bps, p1s, p2s, names)
        ok_d = em_d.train()
        mathops.set_ref_fidelity(True)
        try:
            em_f = EMStutterGenotyper(False, "ACG", num_bps, p1s, p2s, names)
            ok_f = em_f.train()
        finally:
            mathops.set_ref_fidelity(False)
        assert ok_d == ok_f
        if ok_d:
            for attr in ("in_geom", "in_up", "in_down",
                         "out_geom", "out_up", "out_down"):
                assert getattr(em_d.stutter_model, attr) == pytest.approx(
                    getattr(em_f.stutter_model, attr), abs=5e-2)

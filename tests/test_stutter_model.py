"""StutterModel PMF + serialization (src/stutter_model.cpp)."""

import math

import numpy as np
import pytest

from longtr_tpu.models.stutter import StutterModel, default_stutter_model


def cpp_log_stutter_pmf(model, sample_bps, read_bps):
    """Direct transcription of stutter_model.cpp:29-53 for cross-checking."""
    bp_diff = read_bps - sample_bps
    p = model.period

    def cdiv(a, b):  # C++ trunc toward zero
        q = abs(a) // b
        return q if a >= 0 else -q

    if bp_diff % p != 0 if bp_diff >= 0 else (abs(bp_diff) % p != 0):
        eff = bp_diff - cdiv(bp_diff, p)
        if eff < 0:
            return model.out_log_down + model.out_log_nostep + model.out_log_step * (-eff - 1)
        return model.out_log_up + model.out_log_nostep + model.out_log_step * (eff - 1)
    rep = cdiv(bp_diff, p)
    if rep == 0:
        return model.log_equal
    if rep < 0:
        return model.in_log_down + model.in_log_nostep + model.in_log_step * (-rep - 1)
    return model.in_log_up + model.in_log_nostep + model.in_log_step * (rep - 1)


@pytest.mark.parametrize("period", [1, 2, 3, 4, 6])
def test_pmf_matches_cpp(period):
    m = StutterModel(0.9, 0.08, 0.07, 0.85, 0.02, 0.01, "N" * period)
    for d in range(-25, 26):
        got = m.log_stutter_pmf(100, 100 + d)
        want = cpp_log_stutter_pmf(m, 100, 100 + d)
        assert got == pytest.approx(want, abs=1e-12), f"d={d}"
        assert got <= 0


def test_pmf_table_matches_scalar():
    m = default_stutter_model().with_period(3)
    diffs = np.arange(-30, 31)
    table = m.log_pmf_table(diffs)
    for d, v in zip(diffs, table):
        assert v == pytest.approx(m.log_stutter_pmf(0, int(d)), abs=1e-12)


def test_pmf_normalizes_approximately():
    # Summing over a wide range of differences should approach 1.
    m = StutterModel(0.9, 0.05, 0.05, 0.8, 0.01, 0.01, "NNN")
    diffs = np.arange(-300, 301)
    total = np.exp(m.log_pmf_table(diffs)).sum()
    assert total == pytest.approx(1.0, abs=1e-3)


def test_serialization_roundtrip(tmp_path):
    m = StutterModel(0.93, 0.04, 0.06, 0.88, 0.012, 0.011, "AGC")
    path = tmp_path / "stutter.txt"
    path.write_text(m.write_model_line("chr1", 100, 200) + "\n")
    models = StutterModel.read_models(str(path))
    assert ("chr1", 100, 200) in models
    m2 = models[("chr1", 100, 200)]
    assert m2.parameters_within_threshold(m, 1e-9)
    assert m2.motif == "AGC"


def test_default_model_values():
    m = default_stutter_model()
    assert (m.in_geom, m.in_up, m.in_down) == (0.95, 0.05, 0.05)
    assert (m.out_geom, m.out_up, m.out_down) == (0.95, 0.01, 0.01)
    assert m.log_equal == pytest.approx(math.log(1 - 0.05 - 0.05 - 0.01 - 0.01))

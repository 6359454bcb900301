"""PCR-duplicate removal parity vs the compiled reference
(pcr_duplicates.cpp:18-96 via the oracle).

Duplicate sets share (library, min read start, max read start); the
highest-mean-quality copy survives, with the mate-reversal (include_rev)
special case.  Fuzzed over random pair/unpaired mixes, shared positions,
multiple libraries, and quality ties.
"""

import types

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.pipeline.pcr_duplicates import remove_pcr_duplicates

pytestmark = pytest.mark.skipif(ro.get_lib() is None,
                                reason="reference oracle unavailable")


def _rec(name, pos, qual, library, xi):
    r = types.SimpleNamespace(name=name, pos=pos, qual=qual,
                              filename="F0", tags={"RG": library})
    r.get_tag = lambda k, d=None, _t=r: _t.tags.get(k, d)
    r.xi = xi
    return r


def run_both(paired, unpaired):
    want = ro.remove_pcr_dups(paired, unpaired)

    n_p = len(paired)
    rg_to_library = {}
    p_list, m_list, u_list = [], [], []
    for i, d in enumerate(paired):
        a = _rec(d["name"], d["pos1"], d["qual1"], d["library"], i)
        m = _rec(d["name"], d["pos2"], d["qual2"], d["library"], n_p + i)
        rg_to_library["F0" + d["library"]] = d["library"]
        p_list.append(a)
        m_list.append(m)
    for i, d in enumerate(unpaired):
        a = _rec(d["name"], d["pos"], d["qual"], d["library"], 2 * n_p + i)
        rg_to_library["F0" + d["library"]] = d["library"]
        u_list.append(a)
    paired_by_rg, mates_by_rg, unpaired_by_rg = [p_list], [m_list], [u_list]
    remove_pcr_duplicates(True, rg_to_library, paired_by_rg, mates_by_rg,
                          unpaired_by_rg)
    got = ([(a.xi, b.xi) for a, b in zip(paired_by_rg[0], mates_by_rg[0])],
           [a.xi for a in unpaired_by_rg[0]])
    return want, got


def test_pcr_dup_basic():
    p = [dict(name="a", pos1=100, pos2=300, qual1="IIII", qual2="IIII",
              library="L"),
         dict(name="b", pos1=100, pos2=300, qual1="JJJJ", qual2="IIII",
              library="L"),
         dict(name="c", pos1=150, pos2=300, qual1="IIII", qual2="IIII",
              library="L")]
    u = [dict(name="d", pos=100, qual="IIII", library="L"),
         dict(name="e", pos=100, qual="KKKK", library="L")]
    want, got = run_both(p, u)
    assert want == got


def test_pcr_dup_fuzz():
    for trial in range(60):
        rng = np.random.default_rng(4000 + trial)
        libs = ["LA", "LB"][: int(rng.integers(1, 3))]
        positions = [int(p) for p in rng.integers(100, 110, 4)]
        paired, unpaired = [], []
        for i in range(int(rng.integers(0, 12))):
            q1 = "".join(chr(33 + int(v))
                         for v in rng.integers(10, 40, 8))
            q2 = "".join(chr(33 + int(v))
                         for v in rng.integers(10, 40, 8))
            paired.append(dict(
                name=f"p{i}", pos1=int(rng.choice(positions)),
                pos2=int(rng.choice(positions)), qual1=q1, qual2=q2,
                library=str(rng.choice(libs))))
        for i in range(int(rng.integers(0, 10))):
            q = "".join(chr(33 + int(v)) for v in rng.integers(10, 40, 8))
            unpaired.append(dict(
                name=f"u{i}", pos=int(rng.choice(positions)), qual=q,
                library=str(rng.choice(libs))))
        want, got = run_both(paired, unpaired)
        assert want == got, trial


def test_pcr_dup_mate_reversal_case():
    """Both mates overlapping the STR appear twice (reversed) — the
    include_rev path must keep both orientations of the surviving pair."""
    for qual_hi_second in (False, True):
        q_lo, q_hi = "IIII", "KKKK"
        p = [dict(name="x", pos1=100, pos2=200,
                  qual1=(q_lo if qual_hi_second else q_hi), qual2="IIII",
                  library="L"),
             dict(name="x", pos1=200, pos2=100,
                  qual1=(q_hi if qual_hi_second else q_lo), qual2="IIII",
                  library="L")]
        want, got = run_both(p, [])
        assert want == got, qual_hi_second

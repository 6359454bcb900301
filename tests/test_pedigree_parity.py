"""FAM-pedigree extraction parity vs the compiled reference.

`extract_pedigree_nuclear_families` (reference src/pedigree.cpp:309-333) is
order-sensitive in non-obvious ways: nuclear families are emitted in the
order connected components are discovered from the *pruned topological*
node order, and each family's children come out in the order of a
*rebuilt per-component topological sort* — not file order.  Error behavior
is also part of the surface (blank lines, duplicate child rows that poison
parents' children lists, inconsistent family ids, cycles).  These tests
drive the actual compiled reference (tests/ref_oracle wrapper
`ro_extract_families`) against `longtr_tpu.denovo.pedigree` on randomized
pedigrees and assert identical families in identical order, or matching
error classes.
"""

import numpy as np
import pytest

import tests.ref_oracle as ro
from longtr_tpu.denovo.pedigree import extract_pedigree_nuclear_families

pytestmark = pytest.mark.skipif(ro.get_lib() is None,
                                reason="reference oracle unavailable")

# Error classes shared by reference printErrorAndDie messages and our
# ValueError messages (pedigree.py mirrors the reference wording).
_ERROR_CLASSES = [
    "Improperly formated .ped pedigree file",
    "Invalid individual id",
    "Inconsistent family IDs",
    "contains cycles",
    "Logical error in topological_sort",
]


def _classify(msg: str) -> str:
    for c in _ERROR_CLASSES:
        if c in msg:
            return c
    return f"UNKNOWN:{msg}"


def _gen_fam(rng):
    """Random pedigree: mix of nuclear families, three-generation chains,
    half-sib structures, single-parent rows and founder rows, plus
    occasional corruption (duplicate/conflicting child rows, blank or short
    lines, inconsistent family ids, cycles, id '0')."""
    lines = []
    names = iter(f"s{i}" for i in range(10000))
    all_samples = []

    def nm():
        n = next(names)
        all_samples.append(n)
        return n

    n_units = int(rng.integers(1, 6))
    for u in range(n_units):
        fam = f"f{u}"
        kind = rng.random()
        if kind < 0.45:                       # nuclear family
            dad, mom = nm(), nm()
            for _ in range(int(rng.integers(1, 5))):
                lines.append(f"{fam} {nm()} {dad} {mom}")
        elif kind < 0.65:                     # three generations
            gdad, gmom = nm(), nm()
            parent = nm()
            lines.append(f"{fam} {parent} {gdad} {gmom}")
            other = nm()
            for _ in range(int(rng.integers(1, 4))):
                lines.append(f"{fam} {nm()} {parent} {other}")
        elif kind < 0.8:                      # half sibs: shared father
            dad, mom1, mom2 = nm(), nm(), nm()
            lines.append(f"{fam} {nm()} {dad} {mom1}")
            lines.append(f"{fam} {nm()} {dad} {mom2}")
        elif kind < 0.9:                      # single known parent
            parent = nm()
            if rng.random() < 0.5:
                lines.append(f"{fam} {nm()} {parent} 0")
            else:
                lines.append(f"{fam} {nm()} 0 {parent}")
        else:                                 # founder-only rows
            for _ in range(int(rng.integers(1, 3))):
                lines.append(f"{fam} {nm()} 0 0")

    # Valid decorations: extra FAM columns (sex/phenotype are ignored).
    if rng.random() < 0.3:
        lines = [ln + f" {int(rng.integers(0, 3))} -9"
                 if rng.random() < 0.5 else ln for ln in lines]

    # Corruptions (each rare; at most a couple per file).  Victim rows are
    # picked from well-formed lines only (blank/short corruption lines are
    # inserted in between and must not be re-picked).
    def victim_row():
        good = [ln for ln in lines if len(ln.split()) >= 4]
        return str(rng.choice(good)).split() if good else None

    if lines and rng.random() < 0.1:          # exact duplicate child row
        v = victim_row()
        if v:
            lines.append(" ".join(v))
    if lines and rng.random() < 0.1:          # same child, new parents
        v = victim_row()
        if v:
            lines.append(f"{v[0]} {v[1]} {nm()} {nm()}")
    if rng.random() < 0.06:                   # blank line
        lines.insert(int(rng.integers(0, len(lines) + 1)), "")
    if rng.random() < 0.06:                   # short line
        lines.insert(int(rng.integers(0, len(lines) + 1)), "f0 alone")
    if lines and rng.random() < 0.08:         # inconsistent family id
        v = victim_row()
        if v:
            lines.append(f"OTHERFAM {v[1]} 0 0")
    if rng.random() < 0.06:                   # 2-cycle
        a, b = nm(), nm()
        lines.append(f"fc {a} {b} 0")
        lines.append(f"fc {b} {a} 0")
    if rng.random() < 0.04:                   # child id 0
        lines.append(f"f0 0 {nm()} 0")

    if rng.random() < 0.3:
        rng.shuffle(lines)
    return "\n".join(lines) + ("\n" if rng.random() < 0.9 else ""), \
        all_samples


def run_pedigree_trial(seed: int, tmp_path=None) -> str:
    """One differential trial; shared with benchmarks/parity_campaign.py."""
    import os
    import tempfile

    rng = np.random.default_rng(seed)
    text, samples = _gen_fam(rng)
    if not text.strip():
        return f"seed={seed} empty skip"
    # samples_with_data: random subset, sometimes with unknown names.
    k = int(rng.integers(0, len(samples) + 1))
    with_data = set(str(s) for s in rng.choice(samples, k, replace=False))
    if rng.random() < 0.2:
        with_data |= {"unknown1", "unknown2"}

    fd, path = tempfile.mkstemp(suffix=".fam",
                                dir=str(tmp_path) if tmp_path else None)
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(text)
        ref_err = ours_err = None
        try:
            ref = ro.extract_families(path, sorted(with_data))
        except RuntimeError as e:
            ref_err = _classify(str(e))
        try:
            fams = extract_pedigree_nuclear_families(path, with_data)
            ours = [(f.family_id, f.mother, f.father, list(f.children))
                    for f in fams]
        except ValueError as e:
            ours_err = _classify(str(e))
        if ref_err or ours_err:
            assert ref_err == ours_err, \
                (seed, ref_err, ours_err, text)
            return f"seed={seed} both-error [{ref_err}]"
        assert ref == ours, (seed, ref, ours, text)
        return f"seed={seed} fams={len(ref)} ok"
    finally:
        os.unlink(path)


def test_pedigree_parity_fuzz(tmp_path):
    for seed in range(500):
        run_pedigree_trial(seed, tmp_path)


def test_pedigree_family_and_child_order_matches_reference(tmp_path):
    """Interleaved families + a later-line child: output order is set by
    topological component discovery, not file order."""
    fam = tmp_path / "order.fam"
    fam.write_text(
        "F2 c2a dadB momB\n"
        "F1 c1a dadA momA\n"
        "F2 c2b dadB momB\n"
        "F1 c1b dadA momA\n")
    samples = {"c2a", "c1a", "c2b", "c1b", "dadA", "momA", "dadB", "momB"}
    ref = ro.extract_families(str(fam), sorted(samples))
    ours = [(f.family_id, f.mother, f.father, list(f.children))
            for f in extract_pedigree_nuclear_families(str(fam), samples)]
    assert ref == ours


def test_pedigree_prune_to_trio_subset(tmp_path):
    """Pruning to a child+parents subset of a larger family matches the
    reference, including dropping a middle generation."""
    fam = tmp_path / "gen3.fam"
    fam.write_text(
        "F1 mid gdad gmom\n"
        "F1 kid1 mid spouse\n"
        "F1 kid2 mid spouse\n")
    for subset in ({"kid1", "mid", "spouse"},
                   {"kid1", "kid2", "mid", "spouse"},
                   {"mid", "gdad", "gmom"},
                   {"kid1", "gdad"},
                   {"kid2"}):
        ref = ro.extract_families(str(fam), sorted(subset))
        ours = [(f.family_id, f.mother, f.father, list(f.children))
                for f in extract_pedigree_nuclear_families(str(fam), subset)]
        assert ref == ours, subset


def test_pedigree_error_quirks_match(tmp_path):
    """Reference dies on blank lines and on duplicate child rows (stale
    children-list entries poison the topological sort); we must too."""
    cases = [
        ("F1 kid dad mom\n\nF1 kid2 dad mom\n",
         "Improperly formated .ped pedigree file"),
        ("F1 kid dad mom\nF1 kid dad mom\n",
         "Logical error in topological_sort"),
        ("F1 kid dad mom\nF2 dad 0 0\n", "Inconsistent family IDs"),
        ("F1 a b 0\nF1 b a 0\n", "contains cycles"),
        ("F1 0 dad mom\n", "Invalid individual id"),
    ]
    for i, (text, err_class) in enumerate(cases):
        fam = tmp_path / f"bad{i}.fam"
        fam.write_text(text)
        with pytest.raises(RuntimeError) as ref_exc:
            ro.extract_families(str(fam), ["kid", "dad", "mom", "a", "b"])
        assert err_class in str(ref_exc.value), (i, str(ref_exc.value))
        with pytest.raises(ValueError) as our_exc:
            extract_pedigree_nuclear_families(
                str(fam), {"kid", "dad", "mom", "a", "b"})
        assert err_class in str(our_exc.value), (i, str(our_exc.value))

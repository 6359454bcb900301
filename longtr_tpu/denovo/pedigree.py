"""Pedigree parsing and nuclear-family extraction.

Reference: src/pedigree.{h,cpp} — FAM file → pedigree DAG → prune to samples
with data → split into connected components → keep those that are simple
nuclear families (two founders, all children shared).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NuclearFamily:
    family_id: str
    mother: str
    father: str
    children: list

    @property
    def samples(self):
        return [self.mother, self.father] + list(self.children)

    def size(self):
        return 2 + len(self.children)

    def num_children(self):
        return len(self.children)

    def is_missing_sample(self, samples: set) -> bool:
        return any(s not in samples for s in self.samples)

    def is_missing_genotype(self, variant) -> bool:
        return any(variant.genotype(s) is None for s in self.samples)

    def is_mendelian(self, variant) -> bool:
        """pedigree.h:71-88."""
        gm = variant.genotype(self.mother)
        gf = variant.genotype(self.father)
        if gm is None or gf is None:
            return False
        m1, m2, _ = gm
        f1, f2, _ = gf
        for child in self.children:
            gc = variant.genotype(child)
            if gc is None:
                return False
            c1, c2, _ = gc
            ok_a = (c1 in (m1, m2)) and (c2 in (f1, f2))
            ok_b = (c1 in (f1, f2)) and (c2 in (m1, m2))
            if not (ok_a or ok_b):
                return False
        return True


@dataclass
class _Node:
    name: str
    family: str
    mother: "_Node" = None
    father: "_Node" = None
    children: list = field(default_factory=list)


def _read_fam(path: str):
    nodes = {}
    order = []

    def get(name, family):
        if name not in nodes:
            nodes[name] = _Node(name, family)
            order.append(nodes[name])
        return nodes[name]

    with open(path) as fh:
        for line in fh:
            f = line.split()
            if len(f) < 4:
                if line.strip():
                    raise ValueError("Improperly formatted .fam pedigree file")
                continue
            family, child, father, mother = f[0], f[1], f[2], f[3]
            if child == "0":
                raise ValueError("Invalid individual id 0")
            cn = get(child, family)
            mn = get(mother, family) if mother != "0" else None
            fn = get(father, family) if father != "0" else None
            for n in (cn, mn, fn):
                if n is not None and n.family != family:
                    raise ValueError(
                        f"Inconsistent family IDs in FAM file for sample {n.name}")
            cn.mother = mn
            cn.father = fn
            if mn:
                mn.children.append(cn)
            if fn:
                fn.children.append(cn)
    return order


def _prune(nodes, sample_set: set):
    """Keep nodes with a requested sample both upstream and downstream
    (pedigree.cpp:126-174)."""
    upstream = {}
    for n in _topo(nodes):
        up = n.name in sample_set
        up |= bool(n.father and upstream.get(id(n.father)))
        up |= bool(n.mother and upstream.get(id(n.mother)))
        upstream[id(n)] = up
    downstream = {}
    for n in reversed(_topo(nodes)):
        down = n.name in sample_set
        for c in n.children:
            down |= downstream.get(id(c), False)
        downstream[id(n)] = down
    keep = [n for n in nodes
            if upstream.get(id(n)) and downstream.get(id(n))]
    keep_ids = {id(n) for n in keep}
    for n in keep:
        if n.father and id(n.father) not in keep_ids:
            n.father = None
        if n.mother and id(n.mother) not in keep_ids:
            n.mother = None
        n.children = [c for c in n.children if id(c) in keep_ids]
    return keep


def _topo(nodes):
    nodes_set = {id(n) for n in nodes}
    counts = {}
    sources = []
    for n in nodes:
        c = int(n.mother is not None and id(n.mother) in nodes_set) + \
            int(n.father is not None and id(n.father) in nodes_set)
        if c == 0:
            sources.append(n)
        else:
            counts[id(n)] = c
    out = []
    while sources:
        s = sources.pop()
        out.append(s)
        for c in s.children:
            if id(c) not in counts:
                continue
            if counts[id(c)] == 1:
                sources.append(c)
                del counts[id(c)]
            else:
                counts[id(c)] -= 1
    if counts:
        raise ValueError("Pedigree file contains cycles")
    return out


def _components(nodes):
    seen = set()
    comps = []
    by_id = {id(n): n for n in nodes}
    for n in nodes:
        if id(n) in seen:
            continue
        comp = []
        stack = [n]
        while stack:
            cur = stack.pop()
            if id(cur) in seen or id(cur) not in by_id:
                continue
            seen.add(id(cur))
            comp.append(cur)
            for nb in [cur.mother, cur.father] + cur.children:
                if nb is not None and id(nb) not in seen and id(nb) in by_id:
                    stack.append(nb)
        comps.append(comp)
    return comps


def _as_nuclear_family(comp):
    """pedigree.cpp:272-307."""
    founders = [n for n in comp if n.mother is None and n.father is None]
    leaves = [n for n in comp if not n.children]
    if len(founders) != 2 or not leaves or len(founders) + len(leaves) != len(comp):
        return None
    p1, p2 = founders[0].name, founders[1].name
    for leaf in leaves:
        if leaf.mother is None or leaf.father is None:
            return None
        m, f = leaf.mother.name, leaf.father.name
        if not ((m == p1 and f == p2) or (m == p2 and f == p1)):
            return None
    mother = leaves[0].mother.name
    father = leaves[0].father.name
    return NuclearFamily(leaves[0].family, mother, father,
                         [n.name for n in leaves])


def extract_pedigree_nuclear_families(fam_file: str, samples_with_data: set,
                                      logger=None):
    """pedigree.cpp:309-333. Returns list[NuclearFamily]."""
    nodes = _read_fam(fam_file)
    _topo(nodes)  # cycle check
    nodes = _prune(nodes, samples_with_data)
    families = []
    num_others = 0
    for comp in _components(nodes):
        fam = _as_nuclear_family(comp)
        if fam is not None:
            families.append(fam)
        else:
            num_others += 1
    if logger:
        logger(f"Detected {len(families)} nuclear families and {num_others} "
               f"other family structures")
    return families

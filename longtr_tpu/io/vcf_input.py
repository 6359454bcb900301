"""Reference-panel VCF input (``--ref-vcf`` mode).

Reference: src/vcf_input.{h,cpp} — match a BED region against VCF records via
their START/END INFO tags within a ±50bp window (vcf_input.cpp:16-50), plus
the UnphasedGL/PhasedGL caches used by DenovoFinder.
"""

from __future__ import annotations

import numpy as np

PAD = 50  # vcf_input.cpp:19


def read_vcf_alleles(ref_vcf, region):
    """Returns (ok, pos0, alleles) (vcf_input.cpp:21-50).

    The reference queries tabix with the 1-BASED inclusive region
    "chrom:pad_start-stop+pad" (vcf_reader.h:222-227), which includes a
    record at POS == pad_start; our VCFReader.set_region takes a 0-based
    start, so the equivalent call passes pad_start - 1 (clamped).
    """
    pad_start = 0 if region.start < PAD else region.start - PAD
    if not ref_vcf.set_region(region.chrom, max(0, pad_start - 1),
                              region.stop + PAD):
        return False, -1, []
    while True:
        variant = ref_vcf.get_next_variant()
        if variant is None:
            break
        start = variant.get_info("START")
        stop = variant.get_info("END")
        if start is None or stop is None:
            continue
        if int(start) == region.start + 1 and int(stop) == region.stop:
            return True, variant.pos, list(variant.alleles)
        if variant.pos + 1 > region.start + PAD:
            break
    return False, -1, []


class UnphasedGL:
    """Per-sample GL cache keyed lower-triangle (vcf_input.cpp:52-79)."""

    def __init__(self, variant):
        self.num_alleles = variant.num_alleles()
        self.sample_indices = {}
        self.gls = []
        self.max_gls = []
        for name in variant.sample_order:
            gt = variant.genotype(name)
            if gt is None:
                continue
            raw = variant.sample_field(name, "GL")
            if raw is None:
                continue
            vals = np.array([float(x) for x in raw.split(",")])
            self.sample_indices[name] = len(self.gls)
            self.gls.append(vals)
            max_allele = np.full(self.num_alleles, -1e308 / 2)
            gl_index = 0
            for i in range(self.num_alleles):
                for j in range(i + 1):
                    max_allele[i] = max(max_allele[i], vals[gl_index])
                    max_allele[j] = max(max_allele[j], vals[gl_index])
                    gl_index += 1
            self.max_gls.append(max_allele)

    def has_sample(self, sample):
        return sample in self.sample_indices

    def get_gl(self, sample_index, gt_a, gt_b):
        mn, mx = min(gt_a, gt_b), max(gt_a, gt_b)
        return self.gls[sample_index][mx * (mx + 1) // 2 + mn]

    def get_max_gl_allele(self, sample_index, allele):
        return self.max_gls[sample_index][allele]


class PhasedGL:
    """Per-sample PHASEDGL cache (vcf_input.cpp:81-110)."""

    def __init__(self, variant):
        self.num_alleles = variant.num_alleles()
        self.sample_indices = {}
        self.gls = []
        self.max_gls_one = []
        self.max_gls_two = []
        for name in variant.sample_order:
            gt = variant.genotype(name)
            if gt is None:
                continue
            raw = variant.sample_field(name, "PHASEDGL")
            if raw is None:
                continue
            vals = np.array([float(x) for x in raw.split(",")])
            self.sample_indices[name] = len(self.gls)
            self.gls.append(vals)
            A = self.num_alleles
            mat = vals.reshape(A, A)
            self.max_gls_one.append(mat.max(axis=1))
            self.max_gls_two.append(mat.max(axis=0))

    def has_sample(self, sample):
        return sample in self.sample_indices

    def get_gl(self, sample_index, gt_a, gt_b):
        return self.gls[sample_index][gt_a * self.num_alleles + gt_b]

    def get_max_gl_allele_one(self, sample_index, allele):
        return self.max_gls_one[sample_index][allele]

    def get_max_gl_allele_two(self, sample_index, allele):
        return self.max_gls_two[sample_index][allele]

"""Byte-level DenovoFinder parity against the compiled reference scanners.

Drives the full `denovofinder` CLI (both scanners) and diffs its
bgzf-decompressed output VCF against the compiled reference
(src/denovos/trio_denovo_scanner.cpp:83-197 and denovo_scanner.cpp:110-271
through the denovo_main.cpp flow, `ro_denovo_scan` in
tests/ref_oracle/wrapper.cc).

Two math paths are asserted separately (PARITY.md ledger):
* reference-fidelity — byte-identical: same iteration order, streaming
  hybrid-base LSE (mathops.cpp:73-85), MIN_CONTRIBUTION pruning gates and
  Mineiro fast-LSE ANYMUT chain.
* default (vectorized, no pruning, exact ANYMUT) — same record structure;
  values may differ in the last printed digit because the reference's
  <0.01%-contribution pruning and fastlog/fastexp ANYMUT drop mass the
  exact sums keep (observed |Δ| ≤ ~0.05 in the formatted fields).
"""

import gzip
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ref_oracle import denovo_scan  # noqa: E402

from longtr_tpu.io.bgzf import BgzfWriter  # noqa: E402
from longtr_tpu.utils import mathops  # noqa: E402
from longtr_tpu.version import __version__  # noqa: E402


def _write_both(text, gz_path, plain_path):
    w = BgzfWriter(gz_path)
    w.write(text)
    w.close()
    with open(plain_path, "w") as fh:
        fh.write(text)


def synth_families(rng, max_fams=3, max_kids=3):
    """Random nuclear families -> (fam file lines, sample list, fam tuples)."""
    nfam = int(rng.integers(1, max_fams + 1))
    fams, samples, famlines = [], [], []
    for f in range(nfam):
        mom, dad = f"M{f}", f"D{f}"
        kids = [f"K{f}_{c}" for c in range(int(rng.integers(1, max_kids + 1)))]
        fams.append((f"FAM{f}", kids, mom, dad))
        for k in kids:
            famlines.append("\t".join([f"FAM{f}", k, dad, mom]))
        samples += [mom, dad] + kids
    return famlines, samples, fams


def synth_str_vcf(rng, samples, phased, n_records, chrom="chr1",
                  start_pos=1000, missing_rate=0.12):
    """Random STR VCF with GL (unphased) or PHASEDGL fields."""
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(samples)]
    pos = start_pos
    for r in range(n_records):
        pos += int(rng.integers(100, 800))
        A = int(rng.integers(2, 6))
        alleles = ["AC" * (3 + k) for k in range(A)]
        info = (f"START={pos};END={pos + len(alleles[0]) - 1};PERIOD=2;"
                "BPDIFFS=" + ",".join(str(len(a) - len(alleles[0]))
                                      for a in alleles[1:]))
        fmt = "GT:" + ("PHASEDGL" if phased else "GL")
        cols = []
        for s in samples:
            if rng.random() < missing_rate:
                cols.append("./.")
                continue
            a, b = int(rng.integers(A)), int(rng.integers(A))
            if phased:
                gl = [0.0 if (i, j) in ((a, b), (b, a)) else
                      -float(np.round(rng.uniform(0.1, 9.0), 2))
                      for i in range(A) for j in range(A)]
                cols.append(f"{a}|{b}:" + ",".join("%.2f" % v for v in gl))
            else:
                gl = [0.0 if {i, j} == {a, b} or (i == j == a == b) else
                      -float(np.round(rng.uniform(0.1, 9.0), 2))
                      for i in range(A) for j in range(i + 1)]
                lo, hi = min(a, b), max(a, b)
                cols.append(f"{lo}/{hi}:" + ",".join("%.2f" % v for v in gl))
        lines.append(f"{chrom}\t{pos}\tSTR{r}\t" + alleles[0] + "\t"
                     + ",".join(alleles[1:]) + "\t.\t.\t" + info + "\t"
                     + fmt + "\t" + "\t".join(cols))
        pos += len(alleles[0])
    return "\n".join(lines) + "\n"


def synth_snp_vcf(rng, samples, fams, chrom="chr1", n_snps=500):
    """Phased SNP VCF where each child's haplotypes copy one parental
    haplotype each (randomly chosen per child, sometimes hap-flipped), so
    the HaplotypeTracker can infer the inheritance pattern."""
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(samples)]
    inh = {}
    for fid, kids, mom, dad in fams:
        for k in kids:
            inh[k] = (int(rng.integers(2)), int(rng.integers(2)),
                      bool(rng.integers(2)))
    pos = 200
    for _ in range(n_snps):
        pos += int(rng.integers(20, 60))
        gt = {}
        for fid, kids, mom, dad in fams:
            mh = (int(rng.integers(2)), int(rng.integers(2)))
            dh = (int(rng.integers(2)), int(rng.integers(2)))
            gt[mom], gt[dad] = mh, dh
            for k in kids:
                mi, pi, flip = inh[k]
                k1, k2 = mh[mi], dh[pi]
                gt[k] = (k2, k1) if flip else (k1, k2)
        cols = [f"{gt[s][0]}|{gt[s][1]}" if s in gt else ".|." for s in samples]
        lines.append(f"{chrom}\t{pos}\tsnp{pos}\tA\tG\t.\t.\t.\tGT\t"
                     + "\t".join(cols))
    return "\n".join(lines) + "\n", pos


def run_pair(tmp_path, tag, famlines, str_text, snp_text=None,
             use_pop=True, skip_sites=(), chrom=""):
    """Run our CLI and the compiled reference on identical inputs; return
    (ours_text, ref_text)."""
    fam = str(tmp_path / f"{tag}.fam")
    with open(fam, "w") as fh:
        fh.write("\n".join(famlines) + "\n")
    str_gz = str(tmp_path / f"{tag}_str.vcf.gz")
    str_plain = str(tmp_path / f"{tag}_str.vcf")
    _write_both(str_text, str_gz, str_plain)
    snp_gz = snp_plain = ""
    if snp_text is not None:
        snp_gz = str(tmp_path / f"{tag}_snp.vcf.gz")
        snp_plain = str(tmp_path / f"{tag}_snp.vcf")
        _write_both(snp_text, snp_gz, snp_plain)

    out_ours = str(tmp_path / f"{tag}_ours.vcf.gz")
    args = ["--fam", fam, "--str-vcf", str_gz, "--denovo-vcf", out_ours,
            "--log", str(tmp_path / f"{tag}.log")]
    if snp_text is not None:
        args += ["--snp-vcf", snp_gz]
    if not use_pop:
        args += ["--uniform-prior"]
    if chrom:
        args += ["--chrom", chrom]
    if skip_sites:
        skipf = str(tmp_path / f"{tag}.skip")
        with open(skipf, "w") as fh:
            fh.write("\n".join(skip_sites) + "\n")
        args += ["--skip-snps", skipf]
    from longtr_tpu.denovo.cli import main
    assert main(args) == 0
    ours = gzip.open(out_ours, "rb").read().decode()

    out_ref = str(tmp_path / f"{tag}_ref.vcf")
    full_command = "DenovoFinder-TPU-" + __version__ + " " + " ".join(args)
    denovo_scan(fam, str_plain, out_ref, snp_vcf_path=snp_plain, chrom=chrom,
                skip_sites=skip_sites, use_pop_priors=use_pop,
                full_command=full_command)
    ref = open(out_ref).read()
    return ours, ref


@pytest.fixture
def fidelity():
    mathops.set_ref_fidelity(True)
    try:
        yield
    finally:
        mathops.set_ref_fidelity(False)


def _trio_cohort(seed):
    rng = np.random.default_rng(seed)
    famlines, samples, fams = synth_families(rng)
    vcf_samples = [s for s in samples if rng.random() > 0.1] or samples
    text = synth_str_vcf(rng, vcf_samples, phased=False,
                         n_records=int(rng.integers(1, 5)))
    return famlines, text, bool(rng.integers(2))


def _joint_cohort(seed):
    rng = np.random.default_rng(seed)
    famlines, samples, fams = synth_families(rng, max_fams=2, max_kids=2)
    snp_text, last = synth_snp_vcf(rng, samples, fams,
                                   n_snps=int(rng.integers(250, 700)))
    str_text = synth_str_vcf(rng, samples, phased=True,
                             n_records=int(rng.integers(1, 4)),
                             start_pos=last // 2, missing_rate=0.08)
    return famlines, str_text, snp_text, bool(rng.integers(2))


def test_trio_directed_byte_identical(tmp_path, fidelity):
    """The three directed GT configurations of test_denovo.py, including the
    one where the reference emits OTHER > NOMUT for a fully-consistent trio
    (hybrid-base LSE quirk; execution-proven here)."""
    from test_denovo import write_trio_str_vcf
    for i, gts in enumerate([
            {"MOM": (0, 1), "DAD": (0, 0), "KID": (0, 1)},
            {"MOM": (0, 1), "DAD": (0, 1), "KID": (0, 2)},
            {"MOM": (1, 1), "DAD": (0, 0), "KID": (1, 1)}]):
        gz = str(tmp_path / f"d{i}.vcf.gz")
        write_trio_str_vcf(gz, gts)
        text = gzip.open(gz, "rb").read().decode()
        famlines = ["FAM1\tKID\tDAD\tMOM"]
        ours, ref = run_pair(tmp_path, f"d{i}", famlines, text, use_pop=False)
        assert ours == ref
        if i == 0:
            # the reference really does rank OTHER above NOMUT here
            vals = ref.splitlines()[-1].split("\t")[-1].split(":")
            assert float(vals[2]) > float(vals[0])


@pytest.mark.parametrize("seed", range(10))
def test_trio_fuzz_byte_identical(tmp_path, fidelity, seed):
    famlines, text, use_pop = _trio_cohort(seed)
    ours, ref = run_pair(tmp_path, f"t{seed}", famlines, text, use_pop=use_pop)
    assert ours == ref


@pytest.mark.parametrize("seed", range(6))
def test_joint_fuzz_byte_identical(tmp_path, fidelity, seed):
    famlines, str_text, snp_text, use_pop = _joint_cohort(100 + seed)
    ours, ref = run_pair(tmp_path, f"j{seed}", famlines, str_text, snp_text,
                         use_pop=use_pop)
    assert ours == ref
    assert any(l.startswith("chr") and ":" in l.split("\t")[-1]
               for l in ref.splitlines()), "no scannable family — weak cohort"


def test_joint_skip_sites_byte_identical(tmp_path, fidelity):
    """--skip-snps removes tracker sites identically on both sides (and
    actually changes the output vs the unskipped run)."""
    famlines, str_text, snp_text, _ = _joint_cohort(42)
    snp_pos = [l.split("\t")[1] for l in snp_text.splitlines()
               if l.startswith("chr")]
    skips = tuple(f"chr1:{p}" for p in snp_pos[:: max(1, len(snp_pos) // 40)])
    ours, ref = run_pair(tmp_path, "sk", famlines, str_text, snp_text,
                         use_pop=True, skip_sites=skips)
    assert ours == ref


def test_trio_chrom_restriction_byte_identical(tmp_path, fidelity):
    """--chrom restricts both sides to one chromosome of a 2-chrom VCF."""
    rng = np.random.default_rng(7)
    famlines, samples, _ = synth_families(rng, max_fams=2)
    t1 = synth_str_vcf(rng, samples, phased=False, n_records=3, chrom="chr1")
    t2 = synth_str_vcf(rng, samples, phased=False, n_records=2, chrom="chr2")
    body2 = "\n".join(l for l in t2.splitlines() if l.startswith("chr2"))
    text = t1 + body2 + "\n"
    ours, ref = run_pair(tmp_path, "cr", famlines, text, chrom="chr2")
    assert ours == ref
    assert "chr2\t" in ref and "chr1\t" not in ref.split("#CHROM")[1]


@pytest.mark.parametrize("seed", range(4))
def test_trio_default_path_last_digit(tmp_path, seed):
    """Default (unpruned, exact) path: identical record structure; numeric
    fields differ from the pruned reference by at most ~0.05 in the printed
    value (usually 0 or 1 ulp of the 3-decimal formatting)."""
    famlines, text, use_pop = _trio_cohort(seed)
    ours, ref = run_pair(tmp_path, f"dt{seed}", famlines, text,
                         use_pop=use_pop)
    _assert_structurally_close(ours, ref)


@pytest.mark.parametrize("seed", range(3))
def test_joint_default_path_last_digit(tmp_path, seed):
    famlines, str_text, snp_text, use_pop = _joint_cohort(200 + seed)
    ours, ref = run_pair(tmp_path, f"dj{seed}", famlines, str_text, snp_text,
                         use_pop=use_pop)
    _assert_structurally_close(ours, ref)


def _assert_structurally_close(ours, ref, tol=0.06):
    lo, lr = ours.splitlines(), ref.splitlines()
    assert len(lo) == len(lr)
    for a, b in zip(lo, lr):
        if a == b:
            continue
        ca, cb = a.split("\t"), b.split("\t")
        assert len(ca) == len(cb)
        for fa, fb in zip(ca, cb):
            if fa == fb:
                continue
            va = fa.replace(":", ",").split(",")
            vb = fb.replace(":", ",").split(",")
            assert len(va) == len(vb)
            for xa, xb in zip(va, vb):
                if xa == xb:
                    continue
                assert abs(float(xa) - float(xb)) <= tol, (a, b)

"""Aux tools: viz output + vizaln, phasingchecker, getstuttermodels,
legacy alignment filters."""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import standard_fixture  # noqa: E402

from longtr_tpu.io.bgzf import BgzfWriter, bgzf_open_text  # noqa: E402
from longtr_tpu.pipeline.alignment_filters import (  # noqa: E402
    get_end_dist_to_indel, prefix_match_counts, suffix_match_counts)


def test_viz_out_and_vizaln(tmp_path, capsys):
    fx = standard_fixture(str(tmp_path))
    out = str(tmp_path / "calls.vcf.gz")
    viz = str(tmp_path / "alns.html.gz")
    from longtr_tpu.cli import main as cli_main
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out,
                     "--viz-out", viz, "--min-reads", "5", "--quiet"]) == 0
    assert os.path.exists(viz)
    with bgzf_open_text(viz) as fh:
        lines = fh.readlines()
    # reference rows in the reference's own HTMLCreator format
    # (HTMLCreator.cpp:8-22): locus_id, ALL, <tr class="reference">offset SEQ
    ref_rows = [ln for ln in lines if 'class="reference"' in ln]
    assert ref_rows
    frag = ref_rows[0].rstrip("\n").split("\t")[4]
    assert frag.startswith("<tr") and frag.endswith("</tr>")
    ref_text = frag[frag.index(">0 ") + 3: -len("</tr>")]
    assert len(ref_text) > 100 and set(ref_text) <= set("ACGTN*")
    # block framing: <div>/<table> opener and closer per locus
    assert any("\tALL\t<div>\t" in ln for ln in lines)
    assert any("</table> <br> </div>" in ln for ln in lines)
    # each locus present
    starts = {ln.split("\t")[1] for ln in lines}
    assert "1001" in starts
    # vizaln renders HTML for the first locus
    from longtr_tpu.pipeline.viz import main as viz_main
    html = str(tmp_path / "locus.html")
    assert viz_main([viz, "chr1", "1001", "--out", html]) == 0
    content = open(html).read()
    assert "<html>" in content and "span" in content


def test_phasingchecker(tmp_path):
    # SNP VCF with consistent transmission over many informative sites
    rng = np.random.default_rng(4)
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tMOM\tDAD\tKID"]
    pos = 100
    for _ in range(500):
        pos += int(rng.integers(30, 90))
        dad = (int(rng.integers(2)), int(rng.integers(2)))
        lines.append(f"chr1\t{pos}\tsnp{pos}\tA\tG\t.\t.\t.\tGT\t"
                     f"0|1\t{dad[0]}|{dad[1]}\t1|{dad[0]}")
    snp = str(tmp_path / "snps.vcf.gz")
    w = BgzfWriter(snp)
    w.write("\n".join(lines) + "\n")
    w.close()
    fam = str(tmp_path / "t.fam")
    open(fam, "w").write("F1\tKID\tDAD\tMOM\n")
    bed = str(tmp_path / "r.bed")
    open(bed, "w").write(f"chr1\t{pos // 2}\t{pos // 2 + 20}\tAC\tL1\n")
    out = str(tmp_path / "dist.gz")
    from longtr_tpu.denovo.phasing_checker import main
    assert main(["--fam", fam, "--snp-vcf", snp, "--regions", bed,
                 "--out", out]) == 0
    with bgzf_open_text(out) as fh:
        content = fh.readlines()
    assert content[0].startswith("#CHROM\tPOS\tKID")
    fields = content[1].split("\t")
    assert fields[2].startswith("PASS:")
    # maternal distances: kid hap1 == mom hap2 -> d(0,1) == 0
    mat = fields[2].split(":")[1].split(",")
    assert int(mat[1]) == 0


def test_getstuttermodels(tmp_path, capsys):
    vcf = str(tmp_path / "h.vcf.gz")
    w = BgzfWriter(vcf)
    w.write("##fileformat=VCFv4.1\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "chr1\t100\t.\tACAC\tACACAC\t.\t.\t"
            "START=100;END=110;PERIOD=2;INFRAME_PGEOM=0.95;INFRAME_DOWN=0.001;"
            "INFRAME_UP=0.05;OUTFRAME_PGEOM=0.9;OUTFRAME_DOWN=0.02;"
            "OUTFRAME_UP=0.005\n")
    w.close()
    from longtr_tpu.scripts.get_stutter_models import main
    buf = io.StringIO()
    assert main([vcf], out=buf) == 0
    f = buf.getvalue().strip().split("\t")
    assert f[:3] == ["chr1", "100", "110"]
    # up/down floored at 0.01
    assert float(f[4]) == 0.01      # INFRAME_DOWN
    assert float(f[8]) == 0.01      # OUTFRAME_UP floored
    assert f[9] == "NN"
    # roundtrip into StutterModel.read_models
    p = tmp_path / "models.txt"
    p.write_text(buf.getvalue())
    from longtr_tpu.models.stutter import StutterModel
    models = StutterModel.read_models(str(p))
    assert ("chr1", 100, 110) in models


def test_zalgorithm():
    assert prefix_match_counts("abc", "abcabx")[0] == 3
    assert prefix_match_counts("abc", "abcabx")[3] == 2
    assert suffix_match_counts("xyz", "wxyz")[-1] == 3
    assert suffix_match_counts("xyz", "wxyz")[1] == 0


def test_end_dist_to_indel():
    class R:
        cigar = [("=", 10), ("I", 2), ("=", 5)]
    left, right = get_end_dist_to_indel(R)
    assert left == 10 and right == 5

    class R2:
        cigar = [("=", 7)]
    assert get_end_dist_to_indel(R2) == (-1, -1)


def test_annotate_denovo(tmp_path):
    from test_denovo import write_fam, write_trio_str_vcf
    write_trio_str_vcf(str(tmp_path / "str.vcf.gz"),
                       {"MOM": (0, 1), "DAD": (0, 1), "KID": (0, 2)})
    write_fam(tmp_path / "trio.fam")
    from longtr_tpu.denovo.cli import main as dn_main
    assert dn_main(["--fam", str(tmp_path / "trio.fam"),
                    "--str-vcf", str(tmp_path / "str.vcf.gz"),
                    "--denovo-vcf", str(tmp_path / "dn.vcf.gz"),
                    "--uniform-prior", "--log", str(tmp_path / "log")]) == 0
    from longtr_tpu.scripts.annotate_denovo import main as ann_main
    buf = io.StringIO()
    assert ann_main(["--vcf", str(tmp_path / "str.vcf.gz"),
                     "--denovo-ll-vcf", str(tmp_path / "dn.vcf.gz")],
                    out=buf) == 0
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    fmt = body[0].split("\t")[8]
    assert fmt.endswith("NOMUT:DENOVO:OTHER")
    assert "GL" not in fmt.split(":")
    kid = body[0].split("\t")[11].split(":")
    assert float(kid[-2]) > float(kid[-3])  # DENOVO > NOMUT for mutated child


def test_vizalnpdf(tmp_path):
    fx = standard_fixture(str(tmp_path))
    out = str(tmp_path / "c.vcf.gz")
    viz = str(tmp_path / "alns.gz")
    from longtr_tpu.cli import main as cli_main
    assert cli_main(["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
                     "--regions", fx["bed"], "--tr-vcf", out,
                     "--viz-out", viz, "--min-reads", "5", "--quiet"]) == 0
    from longtr_tpu.pipeline.viz import pdf_main
    pdf = str(tmp_path / "locus.pdf")
    assert pdf_main([viz, "chr1", "1001", pdf]) == 0
    assert os.path.getsize(pdf) > 1000

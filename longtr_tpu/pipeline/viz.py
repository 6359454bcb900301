"""Alignment visualization: --viz-out writer + HTML rendering (VizAln).

Reference: src/SeqAlignment/AlignmentViz.cpp + HTMLCreator.cpp render
per-locus read stacks as HTML; the ``--viz-out`` file is a bgzipped,
tab-separated, tabix-addressable table sliced by VizAln/VizAlnPdf
(bash + scripts/generate_aln_html.py).

Format written per locus line: CHROM START STOP SAMPLE <overlaid strings...>
where the first row is the reference line and each subsequent row is one
read padded against the maximal insertion profile (AlignmentViz.cpp:16-110).
The ``vizaln`` CLI slices our viz file (no tabix needed — the reader scans)
and emits a standalone HTML read-stack view.
"""

from __future__ import annotations

import argparse
import sys

SPACE_CHAR = "*"
NOT_APP_CHAR = "."
DELETION_CHAR = "-"


def max_insertion_sizes(alignments):
    """position -> max insertion length (AlignmentViz.cpp:16-45)."""
    out = {}
    for aln in alignments:
        pos = aln.start
        for op, num in aln.cigar:
            if op in "M=XD":
                pos += num
            elif op == "I":
                out[pos] = max(out.get(pos, 0), num)
    return out


def overlay_alignments(alignments):
    """Pad reads against the insertion profile (AlignmentViz.cpp:47-110).

    Returns (min_start, max_stop, list of strings aligned on columns).
    """
    if not alignments:
        return 0, 0, []
    min_start = min(a.start for a in alignments)
    max_stop = max(a.stop for a in alignments)
    ins = max_insertion_sizes(alignments)
    ins_positions = sorted(ins)

    results = []
    for aln in alignments:
        chunks = []
        # left padding
        for p in ins_positions:
            if p > aln.start:
                break
        pos = min_start
        ii = 0
        while pos <= aln.start:
            if ii < len(ins_positions) and pos == ins_positions[ii]:
                chunks.append(SPACE_CHAR * ins[ins_positions[ii]])
                ii += 1
            if pos != aln.start:
                chunks.append(SPACE_CHAR)
            pos += 1
        nuc = 0
        seq = aln.sequence
        for op, num in aln.cigar:
            if op in "M=X":
                for _ in range(num):
                    if ii < len(ins_positions) and pos == ins_positions[ii]:
                        chunks.append(NOT_APP_CHAR * ins[ins_positions[ii]])
                        ii += 1
                    chunks.append(seq[nuc])
                    nuc += 1
                    pos += 1
            elif op == "D":
                for _ in range(num):
                    if ii < len(ins_positions) and pos == ins_positions[ii]:
                        chunks.append(NOT_APP_CHAR * ins[ins_positions[ii]])
                        ii += 1
                    chunks.append(DELETION_CHAR)
                    pos += 1
            elif op == "I":
                width = ins.get(pos, num)
                chunks.append(seq[nuc: nuc + num].lower())
                chunks.append(NOT_APP_CHAR * (width - num))
                nuc += num
                if ii < len(ins_positions) and pos == ins_positions[ii]:
                    ii += 1
            elif op == "S":
                nuc += num
        results.append("".join(chunks))
    return min_start, max_stop, results


def write_viz_record(out, region, sample_names, sample_label, alignments,
                     ref_line=None, chrom_seq=""):
    """One locus block in the viz file."""
    min_start, max_stop, rows = overlay_alignments(alignments)
    if ref_line is None and chrom_seq and alignments:
        # reference row on the same overlay columns: gap chars at every
        # insertion column (AlignmentViz.cpp writes the ref stack likewise)
        ins = max_insertion_sizes(alignments)
        chunks = []
        for pos in range(min_start, max_stop + 1):
            if pos in ins:
                chunks.append(SPACE_CHAR * ins[pos])
            chunks.append(chrom_seq[pos] if pos < len(chrom_seq) else "N")
        ref_line = "".join(chunks).upper()
    out.write(f"{region.chrom}\t{region.start + 1}\t{region.stop}\tREF\t"
              f"{ref_line or ''}\n")
    for aln, row in zip(alignments, rows):
        sample = sample_names[sample_label[alignments.index(aln)]] \
            if sample_label is not None else ""
        out.write(f"{region.chrom}\t{region.start + 1}\t{region.stop}\t"
                  f"{sample}\t{row}\n")


_CSS = """
body { font-family: monospace; white-space: pre; font-size: 13px; }
.ref { color: #444; font-weight: bold; }
.read { color: #1669c1; }
.mm { color: #c11616; font-weight: bold; }
.ins { color: #0a7d33; font-weight: bold; }
.del { color: #999; }
.sample { color: #000; font-weight: bold; margin-top: 8px; }
"""


def render_html(rows, out=sys.stdout):
    """rows: list of (sample, overlaid string); first REF row is the anchor."""
    print("<html><head><style>%s</style></head><body>" % _CSS, file=out)
    ref = None
    cur_sample = None
    for sample, text in rows:
        if sample == "REF":
            ref = text
            print(f'<div class="ref">REF  {text}</div>', file=out)
            continue
        if sample != cur_sample:
            print(f'<div class="sample">{sample}</div>', file=out)
            cur_sample = sample
        spans = []
        for i, ch in enumerate(text):
            cls = "read"
            if ch == DELETION_CHAR:
                cls = "del"
            elif ch.islower():
                cls = "ins"
            elif ref and i < len(ref) and ref[i] not in (SPACE_CHAR,) and \
                    ch not in (SPACE_CHAR, NOT_APP_CHAR) and ch != ref[i]:
                cls = "mm"
            spans.append(f'<span class="{cls}">{ch}</span>')
        print('<div class="read">     %s</div>' % "".join(spans), file=out)
    print("</body></html>", file=out)


def render_pdf(rows, out_path: str):
    """PDF rendering via reportlab when available (VizAlnPdf analog).

    The reference's html_alns_to_pdf.py needs svglib+reportlab; neither is in
    this image, so we fall back to a monospaced text-to-PDF via matplotlib
    (always present alongside jax) — same read stack, printable output.
    """
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise SystemExit("PDF rendering requires matplotlib or reportlab: " + str(e))
    height = max(2.0, 0.16 * len(rows) + 1)
    width = max(8.0, 0.085 * max((len(t) for _, t in rows), default=10))
    fig, ax = plt.subplots(figsize=(width, height))
    ax.axis("off")
    for i, (sample, text) in enumerate(rows):
        color = "#444444" if sample == "REF" else "#1669c1"
        ax.text(0.01, 1 - (i + 1) / (len(rows) + 1),
                f"{sample[:10]:>10s}  {text}", fontsize=6,
                family="monospace", color=color, transform=ax.transAxes)
    fig.savefig(out_path, format="pdf", bbox_inches="tight")
    plt.close(fig)


def pdf_main(argv=None):
    p = argparse.ArgumentParser(
        prog="vizalnpdf",
        description="Render LongTR --viz-out alignments for one locus as PDF")
    p.add_argument("viz_file")
    p.add_argument("chrom")
    p.add_argument("start", type=int)
    p.add_argument("out", help="Output PDF path")
    p.add_argument("sample", nargs="?", default=None)
    args = p.parse_args(argv)
    from longtr_tpu.io.bgzf import bgzf_open_text
    rows = []
    with bgzf_open_text(args.viz_file) as fh:
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if len(f) < 5 or f[0] != args.chrom or int(f[1]) != args.start:
                continue
            if args.sample and f[3] not in ("REF", args.sample):
                continue
            rows.append((f[3], f[4]))
    render_pdf(rows, args.out)
    print(f"Wrote {args.out}", file=sys.stderr)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="vizaln",
        description="Render LongTR --viz-out alignments for one locus as HTML")
    p.add_argument("viz_file", help="bgzipped --viz-out file")
    p.add_argument("chrom")
    p.add_argument("start", type=int)
    p.add_argument("sample", nargs="?", default=None)
    p.add_argument("--out", default="-", help="Output HTML path (- = stdout)")
    args = p.parse_args(argv)

    from longtr_tpu.io.bgzf import bgzf_open_text
    rows = []
    with bgzf_open_text(args.viz_file) as fh:
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if len(f) < 5:
                continue
            if f[0] != args.chrom or int(f[1]) != args.start:
                continue
            if args.sample and f[3] not in ("REF", args.sample):
                continue
            rows.append((f[3], f[4]))
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    render_html(rows, out)
    if out is not sys.stdout:
        out.close()
        print(f"Wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""CRAM 3.0 reader/writer: codec round-trips, BAM equivalence, e2e.

The reference reads CRAM through htslib (bam_io.h:441-515).  No external
CRAM producer exists in this environment, so conformance is established
structurally: spec-derived writer -> reader round-trips, record-level
equality against the BAM decode of the same data, and a bit-identical
VCF from the full pipeline on either container format.
"""

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from synth import standard_fixture  # noqa: E402

from longtr_tpu.cli import main as cli_main  # noqa: E402
from longtr_tpu.io.bam import BamReader  # noqa: E402
from longtr_tpu.io.cram import (CramReader, CramWriter, itf8_decode,  # noqa: E402
                                itf8_encode, ltf8_decode, ltf8_encode)
from longtr_tpu.io.fasta import FastaReader  # noqa: E402
from longtr_tpu.io.rans import rans_compress, rans_decompress  # noqa: E402


def test_varint_round_trip():
    for v in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
              0xFFFFFFF, 0x10000000, 0x7FFFFFFF, -1, -1000):
        enc = itf8_encode(v)
        dec, pos = itf8_decode(enc, 0)
        assert dec == v and pos == len(enc), v
    for v in (0, 0x7F, 0x80, 1 << 20, 1 << 40, (1 << 63) - 1, -1, -5):
        enc = ltf8_encode(v)
        dec, pos = ltf8_decode(enc, 0)
        assert dec == v and pos == len(enc), v


def test_rans_round_trip():
    rng = np.random.default_rng(3)
    cases = [b"", b"x", b"ACGT" * 500,
             bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
             bytes(rng.choice(list(b"!#0@J"), 10007).astype(np.uint8))]
    for order in (0, 1):
        for data in cases:
            if order == 1 and len(data) < 4:
                continue
            assert rans_decompress(rans_compress(data, order)) == data


def _bam_to_cram(tmp_path, bam_path, fasta):
    r = BamReader(bam_path)
    recs = []
    while (rec := r.get_next_alignment()) is not None:
        recs.append(rec)
    fr = FastaReader(fasta)
    cram_path = str(tmp_path / (os.path.basename(bam_path)[:-4] + ".cram"))
    w = CramWriter(cram_path, r.header.text, r.header.ref_names,
                   r.header.ref_lengths)
    for rid, name in enumerate(r.header.ref_names):
        w.set_reference(rid, fr.get_sequence(name))
    for rec in recs:
        w.save_alignment(rec)
    w.close()
    return cram_path, recs


def test_cram_record_equality(tmp_path):
    fx = standard_fixture(str(tmp_path))
    cram, bam_recs = _bam_to_cram(tmp_path, fx["bams"][0], fx["fasta"])
    c = CramReader(cram, fx["fasta"])
    n = 0
    for a in bam_recs:
        b = c.get_next_alignment()
        assert b is not None
        for f in ("name", "flag", "pos", "mapq", "seq", "qual",
                  "ref_name", "tlen", "tags", "end_pos"):
            assert getattr(a, f) == getattr(b, f), (f, a.name)
        n += 1
    assert c.get_next_alignment() is None and n == len(bam_recs)


def test_cram_region_query(tmp_path):
    fx = standard_fixture(str(tmp_path))
    cram, _ = _bam_to_cram(tmp_path, fx["bams"][0], fx["fasta"])
    c = CramReader(cram, fx["fasta"])
    b = BamReader(fx["bams"][0])
    for chrom, start, stop in (("chr1", 900, 1100), ("chr1", 1900, 2100),
                               ("chr3", 1100, 1400), ("chr1", 5, 10)):
        assert c.set_region(chrom, start, stop)
        b.set_region(chrom, start, stop)
        got, want = [], []
        while (rec := c.get_next_alignment()) is not None:
            got.append(rec.name)
        while (rec := b.get_next_alignment()) is not None:
            want.append(rec.name)
        assert sorted(got) == sorted(want), (chrom, start, stop)


def test_cram_e2e_identical_vcf(tmp_path):
    """Full pipeline on .cram input emits the same VCF as on .bam."""
    fx = standard_fixture(str(tmp_path))
    crams = []
    for bam in fx["bams"]:
        cram, _ = _bam_to_cram(tmp_path, bam, fx["fasta"])
        crams.append(cram)
    out_bam = str(tmp_path / "from_bam.vcf.gz")
    out_cram = str(tmp_path / "from_cram.vcf.gz")
    base = ["--fasta", fx["fasta"], "--regions", fx["bed"],
            "--use-unpaired", "--quiet"]
    assert cli_main(["--bams", ",".join(fx["bams"]),
                     "--tr-vcf", out_bam] + base) == 0
    assert cli_main(["--bams", ",".join(crams),
                     "--tr-vcf", out_cram] + base) == 0

    def body(p):
        text = gzip.decompress(open(p, "rb").read()).decode()
        return [ln for ln in text.splitlines()
                if not ln.startswith("##command")]

    assert body(out_bam) == body(out_cram)


def test_cram_region_query_without_index(tmp_path):
    """Without a .crai the reader falls back to a container scan."""
    fx = standard_fixture(str(tmp_path))
    cram, bam_recs = _bam_to_cram(tmp_path, fx["bams"][0], fx["fasta"])
    os.remove(cram + ".crai")
    c = CramReader(cram, fx["fasta"])
    assert c._index is None
    assert c.set_region("chr1", 1900, 2100)
    got = []
    while (rec := c.get_next_alignment()) is not None:
        got.append(rec.name)
    want = [r.name for r in bam_recs
            if r.ref_name == "chr1" and r.pos < 2100 and r.end_pos > 1900]
    assert sorted(got) == sorted(want) and got


def test_cram_multi_container(tmp_path):
    """Small records_per_slice forces many containers; streaming and
    indexed queries must span container boundaries."""
    fx = standard_fixture(str(tmp_path))
    r = BamReader(fx["bams"][0])
    recs = []
    while (rec := r.get_next_alignment()) is not None:
        recs.append(rec)
    fr = FastaReader(fx["fasta"])
    cram = str(tmp_path / "multi.cram")
    w = CramWriter(cram, r.header.text, r.header.ref_names,
                   r.header.ref_lengths, records_per_slice=16)
    for rid, name in enumerate(r.header.ref_names):
        w.set_reference(rid, fr.get_sequence(name))
    for rec in recs:
        w.save_alignment(rec)
    w.close()
    c = CramReader(cram, fx["fasta"])
    back = []
    while (rec := c.get_next_alignment()) is not None:
        back.append(rec.name)
    assert back == [r.name for r in recs]
    c2 = CramReader(cram, fx["fasta"])
    assert c2.set_region("chr1", 1900, 2100)
    got = []
    while (rec := c2.get_next_alignment()) is not None:
        got.append(rec.name)
    want = [r.name for r in recs
            if r.ref_name == "chr1" and r.pos < 2100 and r.end_pos > 1900]
    assert sorted(got) == sorted(want) and got


def test_cram_byteflip_fuzz(tmp_path):
    """Random byte flips over a real CRAM container must never crash the
    reader: every mutation either decodes or raises a clean Python
    exception (IOError/ValueError/struct.error family), mirroring the
    BAM decoder's fuzz guarantee."""
    import random

    fx = standard_fixture(str(tmp_path))
    cram, _ = _bam_to_cram(tmp_path, fx["bams"][0], fx["fasta"])
    with open(cram, "rb") as fh:
        data = fh.read()
    rng = random.Random(99)

    def try_read(blob):
        p = str(tmp_path / "fuzz.cram")
        with open(p, "wb") as fh:
            fh.write(blob)
        try:
            r = CramReader(p, fx["fasta"])
            n = 0
            while r.get_next_alignment() is not None and n < 10_000:
                n += 1
        except Exception as e:      # clean failure is the contract
            assert not isinstance(e, (SystemExit, KeyboardInterrupt,
                                      MemoryError))

    for _ in range(150):
        mutated = bytearray(data)
        for _k in range(rng.randint(1, 6)):
            mutated[rng.randrange(26, len(mutated))] = rng.randrange(256)
        try_read(bytes(mutated))
    for cut in range(30, min(len(data), 4000), 131):
        try_read(data[:cut])


def test_cram_decode_with_softmasked_fasta(tmp_path):
    """Soft-masked (lowercase) reference FASTAs — standard for GRCh38,
    where tandem repeats are exactly the masked regions — must decode to
    the same uppercase SEQ as the BAM path: fill_match copies reference
    bases verbatim, so the reader uppercases the fetched chromosome."""
    import os

    from longtr_tpu.io.fasta import write_fasta

    fx = standard_fixture(str(tmp_path))
    fr = FastaReader(fx["fasta"])
    masked = str(tmp_path / "masked.fa")
    write_fasta(masked, {n: fr.get_sequence(n).lower()
                         for n, *_ in fr.entries})
    cram, bam_recs = _bam_to_cram(tmp_path, fx["bams"][0], masked)
    c = CramReader(cram, masked)
    for a in bam_recs:
        b = c.get_next_alignment()
        assert b is not None
        assert a.seq == b.seq, a.name
        assert b.seq == b.seq.upper(), a.name
    assert c.get_next_alignment() is None


def test_cram_truncation_raises_not_silent_eof(tmp_path):
    """A CRAM truncated mid-container must raise a clean IOError, not
    silently report end-of-file with the remaining reads dropped (the
    pipeline would otherwise genotype from an incomplete read set with no
    error anywhere)."""
    import pytest

    fx = standard_fixture(str(tmp_path))
    cram, bam_recs = _bam_to_cram(tmp_path, fx["bams"][0], fx["fasta"])
    with open(cram, "rb") as fh:
        data = fh.read()
    # cut mid-container-body and mid-EOF-container-header; both must raise
    for cut in (len(data) // 2, len(data) - 14):
        p = str(tmp_path / "trunc.cram")
        with open(p, "wb") as fh:
            fh.write(data[:cut])
        r = CramReader(p, fx["fasta"])
        with pytest.raises(IOError, match="[Tt]runcated|[Cc]orrupt"):
            while r.get_next_alignment() is not None:
                pass


def test_cram_missing_eof_container_raises(tmp_path):
    """Truncation exactly at a container boundary (the trailing EOF
    container missing — the common mode for a killed writer) must raise
    like htslib's "EOF marker is absent", not read as a complete file."""
    import pytest

    fx = standard_fixture(str(tmp_path))
    cram, bam_recs = _bam_to_cram(tmp_path, fx["bams"][0], fx["fasta"])
    # locate the last container boundary (= start of the EOF container)
    probe = CramReader(cram, fx["fasta"])
    boundaries = []
    while True:
        off = probe.fh.tell()
        if probe._read_container_bytes() is None:
            break
        boundaries.append(off)
    probe.close()
    assert len(boundaries) >= 2  # data container(s) + EOF container
    p = str(tmp_path / "noeof.cram")
    with open(cram, "rb") as fh:
        data = fh.read()
    with open(p, "wb") as fh:
        fh.write(data[:boundaries[-1]])
    r = CramReader(p, fx["fasta"])
    with pytest.raises(IOError, match="EOF marker is absent"):
        while r.get_next_alignment() is not None:
            pass
    r.close()
    # the intact file still streams cleanly to EOF
    r = CramReader(cram, fx["fasta"])
    n = 0
    while r.get_next_alignment() is not None:
        n += 1
    assert n == len(bam_recs)
    r.close()

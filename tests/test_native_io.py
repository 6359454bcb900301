"""Native C++ I/O library vs the pure-Python readers (real HG002 data)."""

import os
import time

import numpy as np
import pytest

from longtr_tpu import native
from longtr_tpu.io.bam import BamReader
from longtr_tpu.io.bgzf import BgzfReader

HG002 = "/root/reference/test_data/HG002_sample_reads.bam"


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native library unavailable (no g++?)")
    return l


def test_bgzf_inflate_matches_python(lib):
    with open(HG002, "rb") as fh:
        comp = fh.read()
    want = BgzfReader(HG002).read_all()
    got = native.bgzf_inflate_all(comp)
    assert got == want


def test_bam_decode_matches_python(lib):
    reader = BamReader(HG002)
    # python records via streaming region (pure path)
    reader._prefetched = None
    py_recs = []
    r2 = BamReader(HG002)
    r2.index = None  # force pure-python sequential scan
    while True:
        rec = r2._read_record()
        if rec is None:
            break
        py_recs.append(rec)

    data = BgzfReader(HG002).read_all()
    # skip BAM header: magic+text+refs
    import struct
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4 + l_name + 4
    batch = native.bam_decode(data[off:])
    assert batch is not None
    assert batch.n == len(py_recs)
    for i in (0, 1, len(py_recs) // 2, len(py_recs) - 1):
        py = py_recs[i]
        ref_id, pos, mapq, flag, mref, mpos, tlen, l_seq = batch.record_fields(i)
        assert (ref_id, pos, mapq, flag) == (py.ref_id, py.pos, py.mapq, py.flag)
        assert batch.name(i) == py.name
        assert batch.cigar(i) == list(py.cigar)
        assert batch.seq(i) == py.seq
        assert batch.qual(i) == py.qual


def test_fetch_fast_matches_streaming(lib):
    r_fast = BamReader(HG002)
    recs_fast = r_fast.fetch_fast("chr1", 776605, 776633)
    assert recs_fast is not None
    r_slow = BamReader(HG002)
    r_slow_fetch = r_slow
    # force pure path by monkeypatching fetch_fast off
    r_slow.fetch_fast = lambda *a: None
    recs_slow = r_slow.fetch("chr1", 776605, 776633)
    assert len(recs_fast) == len(recs_slow)
    for a, b in zip(recs_fast, recs_slow):
        assert (a.name, a.pos, a.end_pos, a.flag, a.seq[:50], a.qual[:50],
                a.tags.get("HP")) == \
               (b.name, b.pos, b.end_pos, b.flag, b.seq[:50], b.qual[:50],
                b.tags.get("HP"))


def test_native_speedup(lib):
    with open(HG002, "rb") as fh:
        comp = fh.read()
    t0 = time.time()
    native.bgzf_inflate_all(comp)
    t_native = time.time() - t0
    t0 = time.time()
    BgzfReader(HG002).read_all()
    t_py = time.time() - t0
    # informative, not strict: native should not be slower than 2x python
    assert t_native < t_py * 2


def test_native_and_pure_python_vcfs_identical(tmp_path, monkeypatch):
    """LONGTR_NO_NATIVE=1 (pure Python IO + jnp scan + Python POA) must
    produce the same VCF as the native fast paths — the bit-identity
    guarantee the C++ layer is built around."""
    import gzip
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synth import standard_fixture

    from longtr_tpu.cli import main as cli_main

    fx = standard_fixture(str(tmp_path))
    base = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--use-unpaired", "--quiet"]
    out1 = str(tmp_path / "native.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out1]) == 0
    monkeypatch.setenv("LONGTR_NO_NATIVE", "1")
    out2 = str(tmp_path / "pure.vcf.gz")
    assert cli_main(base + ["--tr-vcf", out2]) == 0

    def body(p):
        return [ln for ln in
                gzip.decompress(open(p, "rb").read()).decode().splitlines()
                if not ln.startswith("##command")]

    assert body(out1) == body(out2)


def test_corrupt_inputs_rejected_cleanly(lib):
    """Hardening: malformed BGZF/BAM/rANS inputs must yield clean error
    returns (None), never out-of-bounds access (ADVICE.md r1 items)."""
    import ctypes
    import struct
    import zlib

    # -- BGZF block whose xlen is inconsistent with bsize (clen < 0) --
    payload = zlib.compress(b"hello", 9)[2:-4]
    xtra = struct.pack("<BBHH", 66, 67, 2, 0)  # BSIZE+1 = 1 -> bsize 1 < 18
    blk = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 + struct.pack("<H", len(xtra))
           + xtra + payload + struct.pack("<II", 0, 5))
    assert native.bgzf_inflate_all(blk) is None

    # oversized xlen: bsize < 12 + xlen + 8
    xtra2 = struct.pack("<BBHH", 66, 67, 2, 25)  # bsize 26 but xlen says 200
    blk2 = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 + struct.pack("<H", 200)
            + xtra2 + b"\x00" * 8)
    assert native.bgzf_inflate_all(blk2 + b"\x00" * 200) is None

    # -- BAM record with l_read_name == 0 (would memcpy (size_t)-1) --
    rec = bytearray(40)
    struct.pack_into("<i", rec, 0, 36)          # block_size
    struct.pack_into("<ii", rec, 4, 0, 100)     # ref_id, pos
    rec[12] = 0                                  # l_read_name = 0
    assert native.bam_decode(bytes(rec)) is None

    # -- BAM record whose l_seq overruns the block --
    rec2 = bytearray(44)
    struct.pack_into("<i", rec2, 0, 40)
    rec2[12] = 2                                 # l_read_name
    struct.pack_into("<H", rec2, 16, 0)          # n_cigar
    struct.pack_into("<i", rec2, 20, 10**6)      # l_seq huge
    assert native.bam_decode(bytes(rec2)) is None

    # negative l_seq
    rec3 = bytearray(44)
    struct.pack_into("<i", rec3, 0, 40)
    rec3[12] = 2
    struct.pack_into("<i", rec3, 20, -5)
    assert native.bam_decode(bytes(rec3)) is None

    # -- rANS order-0 stream whose frequency table sums > 4096 --
    # header: order 0, csize, usize placeholders (9 bytes)
    body = bytearray()
    body.append(0)                               # order
    body += struct.pack("<II", 0, 64)            # csize, usize (unused here)
    # freq table: symbol 65 freq 0x7FFF (32767), end marker 0
    body += bytes([65, 0xFF, 0xFF, 0])
    body += b"\x00" * 16                         # 4 states
    assert native.rans_decode(bytes(body), 64) is None


def test_window_cache_boundaries_and_reuse(lib):
    """Sliding decode windows: loci crossing window boundaries, cache reuse,
    and truncated window tails must all serve records identical to the
    streaming path (real HiFi BAM, many consecutive regions)."""
    r_slow = BamReader(HG002)
    r_slow.fetch_fast = lambda *a: None

    r_win = BamReader(HG002)
    # Tiny windows: force many window boundaries + evictions over the scan.
    r_win.WINDOW_BYTES = 64 << 10

    # Walk the whole chromosome span covered by the fixture in 5kb steps.
    first = r_slow.fetch("chr1", 0, 1 << 30)
    assert first, "fixture should contain records"
    lo = min(rec.pos for rec in first)
    hi = max(rec.end_pos for rec in first)
    n_checked = 0
    for start in range(max(lo - 2000, 0), hi, 5000):
        end = start + 2000
        fast = r_win.fetch_fast("chr1", start, end)
        assert fast is not None
        slow = BamReader(HG002)
        slow.fetch_fast = lambda *a: None
        want = slow.fetch("chr1", start, end)
        assert [(a.name, a.pos, a.end_pos, a.flag) for a in fast] == \
               [(b.name, b.pos, b.end_pos, b.flag) for b in want]
        n_checked += len(want)
        slow.close()
    assert n_checked > 0
    # window cache must stay bounded
    assert len(r_win._win_cache) <= 2


def test_window_clone_isolation(lib):
    """Records served from the window cache are fresh copies: in-place trims
    must not corrupt later fetches of the same region."""
    r = BamReader(HG002)
    a = r.fetch_fast("chr1", 776605, 776633)
    assert a
    rec = a[0]
    orig = (rec.pos, rec.end_pos, len(rec.seq), list(rec.cigar))
    rec.trim_alignment(rec.pos + 300, rec.end_pos - 300)
    b = r.fetch_fast("chr1", 776605, 776633)
    got = (b[0].pos, b[0].end_pos, len(b[0].seq), list(b[0].cigar))
    assert got == orig


def test_native_left_align_matches_python(monkeypatch):
    """ltr_trim_expand_batch (one native call per locus) must reproduce the
    pure-Python trim_alignment + expand_cigar_vs_ref pair field-for-field
    over random reads with H/S/I/D/X ops, whole-repeat deletions, HP tags
    and overlap/soft-clip rejects."""
    import random

    from longtr_tpu.io.bam import BamRecord
    from longtr_tpu.pipeline import alignment as A

    random.seed(5)
    rng = random.Random(11)

    class RG:
        chrom, start, stop = "chr1", 2300, 2330
        num_regions = 1

    def mkrec(name, pos, cigar, seq, qual, hp=None):
        return BamRecord.raw(
            name, 0, 0, pos, 60, cigar, -1, -1, 0, seq, qual,
            ({"HP": hp} if hp else {}), "f", "chr1", "*",
            pos + sum(n for op, n in cigar if op in "M=XD"))

    chrom = "".join(random.choice("ACGT") for _ in range(5000))

    def rand_read():
        pos = rng.randint(1900, 2300)
        cig = []
        seqlen = span = 0
        if rng.random() < 0.3:
            cig.append(("H", rng.randint(1, 5)))
        if rng.random() < 0.4:
            n = rng.randint(1, 30)
            cig.append(("S", n))
            seqlen += n
        target = rng.randint(100, 900)
        while span < target:
            n = rng.randint(5, 120)
            op = rng.choices("MIDX=", weights=[5, 1, 1, 1, 3])[0]
            if op in "M=X":
                cig.append((op, n))
                seqlen += n
                span += n
            elif op == "I":
                cig.append(("I", n))
                seqlen += n
            else:
                cig.append(("D", n))
                span += n
        if rng.random() < 0.4:
            n = rng.randint(1, 30)
            cig.append(("S", n))
            seqlen += n
        seq = "".join(random.choice("ACGTacgt") for _ in range(seqlen))
        qual = "".join(chr(33 + random.randint(0, 40))
                       for _ in range(seqlen))
        return mkrec(f"r{rng.random()}", pos, cig, seq, qual,
                     random.choice([None, 1, 2]))

    reads = [[rand_read() for _ in range(20)] for _ in range(3)]
    reads[0].append(mkrec(
        "del1", 2100, [("M", 150), ("D", 300), ("M", 150)],
        "".join(random.choice("ACGT") for _ in range(300)), "I" * 300))
    p1 = [[-0.1 * j for j in range(len(s))] for s in reads]
    p2 = [[-0.2 * j for j in range(len(s))] for s in reads]

    def run(no_native):
        if no_native:
            monkeypatch.setenv("LONGTR_NO_NATIVE", "1")
        else:
            monkeypatch.delenv("LONGTR_NO_NATIVE", raising=False)
        rs = [[r.clone() for r in s] for s in reads]
        return A.left_align_reads(RG, chrom, rs, p1, p2)

    nat = run(False)
    py = run(True)
    assert len(nat[0]) == len(py[0]) and len(py[0]) > 10
    for a, b in zip(nat[0], py[0]):
        for f in ("start", "stop", "rev_strand", "deleted", "name",
                  "base_qualities", "sequence", "alignment", "cigar",
                  "use_for_haps"):
            assert getattr(a, f) == getattr(b, f), (b.name, f)
    assert nat[1:] == py[1:]


def test_native_decode_byteflip_fuzz(lib):
    """Deterministic fuzz: random byte flips over a real decoded BAM stream
    must never crash the native decoder — every mutation either decodes
    (partially) or returns a clean None (ADVICE r1 hardening, generalized
    beyond the hand-built corpus above)."""
    import random

    with open(HG002, "rb") as fh:
        comp = fh.read()
    data = native.bgzf_inflate_all(comp)
    assert data is not None
    # skip the plain-text header: mutate the binary record region
    import struct
    l_text = struct.unpack("<i", data[4:8])[0]
    off = 8 + l_text
    n_ref = struct.unpack("<i", data[off:off + 4])[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack("<i", data[off:off + 4])[0]
        off += 4 + l_name + 4
    body = bytearray(data[off:off + 200_000])
    rng = random.Random(1234)
    for _ in range(300):
        mutated = bytearray(body)
        for _k in range(rng.randint(1, 8)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        native.bam_decode(bytes(mutated))          # must not crash
    # truncations at every alignment of the first few records
    for cut in list(range(0, 512, 7)) + [len(body) - 3, len(body) - 1]:
        native.bam_decode(bytes(body[:cut]))


def test_bgzf_empty_midstream_blocks_skipped(tmp_path):
    """htslib tolerates empty BGZF blocks anywhere in a stream (writers may
    flush zero bytes); the reader must skip them, not stop early."""
    from longtr_tpu.io.bgzf import BGZF_EOF, BgzfWriter

    path = str(tmp_path / "mid.bgzf")
    with open(path, "wb") as fh:
        w = BgzfWriter(fh)
        w._flush_block(b"hello ")
        fh.write(BGZF_EOF)          # empty block mid-stream
        w._flush_block(b"world")
        fh.write(BGZF_EOF)          # terminal EOF marker
    r = BgzfReader(path)
    assert r.read_all() == b"hello world"
    r.close()


def test_bgzf_corrupt_bsize_rejected(tmp_path):
    """A block whose declared size is smaller than its own header must raise
    a clean IOError, not read the rest of the file as compressed payload."""
    import struct

    from longtr_tpu.io.bgzf import BGZF_EOF, BgzfWriter

    path = str(tmp_path / "bad.bgzf")
    with open(path, "wb") as fh:
        w = BgzfWriter(fh)
        w._flush_block(b"data")
        fh.write(BGZF_EOF)
    raw = bytearray(open(path, "rb").read())
    # BC bsize field of the first block lives at offset 16 (12-byte header +
    # 4-byte subfield header); declare an impossible 5-byte total size
    raw[16:18] = struct.pack("<H", 4)
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        BgzfReader(path).read_all()


def test_merge_sorted_bams_handles_local_inversions(tmp_path):
    """Per-shard --pass-bam files are only NEAR-sorted: the pairing path
    writes a rescued mate after its higher-pos partner (filters.py), so the
    worker merge must sort, not assume sorted inputs, and still emit a
    coordinate-sorted BAM (stable at equal coordinates, temp files cleaned
    up)."""
    import os

    from longtr_tpu.io.bam import BamReader, BamRecord
    from longtr_tpu.io.bam_write import BamWriter, merge_bams

    header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:10000\n"

    def rec(name, pos):
        return BamRecord(name=name, flag=0, ref_id=0, pos=pos, mapq=60,
                         cigar=[("M", 10)], mate_ref_id=-1, mate_pos=-1,
                         tlen=0, seq="A" * 10, qual="I" * 10, tags={},
                         ref_name="chr1")

    shards = []
    # shard 0 carries an inversion (100 before 50); shard 1 interleaves
    for i, poses in enumerate([[100, 50, 50], [70, 55]]):
        p = str(tmp_path / f"s{i}.bam")
        w = BamWriter(p, header, ["chr1"], [10000])
        for j, pos in enumerate(poses):
            w.save_alignment(rec(f"r{i}_{j}", pos))
        w.close()
        shards.append(p)

    out = str(tmp_path / "merged.bam")
    merge_bams(shards, out)
    r = BamReader(out)
    got = []
    while (x := r.get_next_alignment()) is not None:
        got.append((x.pos, x.name))
    r.close()
    assert [p for p, _ in got] == sorted(p for p, _ in got)
    assert len(got) == 5
    # stable at equal coordinates: shard-0 write order kept for the two
    # pos-50 records
    assert [n for p, n in got if p == 50] == ["r0_1", "r0_2"]
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".sorttmp")]

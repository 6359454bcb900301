"""Device mode-B kernel parity vs the host f64 transcription.

The batched jit scan (ops/mode_b_device.py) must reproduce the host numpy
path (pipeline/mode_b.py, itself oracle-tested against
HapAligner.cpp:27-233) — exactly in float64, within f32 drift in float32.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_mode_b import make_homopolymer_hap, read_for  # noqa: E402

from longtr_tpu.haplotype.blocks import HapBlock, Haplotype, RepeatBlock  # noqa: E402
from longtr_tpu.models.stutter import default_stutter_model  # noqa: E402
from longtr_tpu.pipeline.alignment import Alignment  # noqa: E402
from longtr_tpu.pipeline.mode_b import ModeBAligner, calc_seed_base  # noqa: E402

RNG = np.random.default_rng(97)


def _noisy_read(copies, flank_l, flank_r, rng, err=0.02, start=100):
    seq = list(flank_l + "T" * copies + flank_r)
    for i in range(len(seq)):
        if rng.random() < err:
            seq[i] = rng.choice([c for c in "ACGT" if c != seq[i]])
    seq = "".join(seq)
    quals = "".join(chr(33 + int(q)) for q in rng.integers(15, 40, len(seq)))
    aln = read_for(copies, flank_l, flank_r, start=start)
    aln.sequence = seq
    aln.base_qualities = quals
    return aln


def _batch_vs_host(hap, alns, dtype, rtol):
    aligner = ModeBAligner(hap)
    hs, he = hap.blocks[0].start, hap.blocks[-1].end
    seeds = [calc_seed_base(a, aligner.repeat_starts, aligner.repeat_ends,
                            hs, he) for a in alns]
    keep = [i for i, s in enumerate(seeds) if s >= 0]
    assert keep, "fixture produced no seedable reads"
    alns = [alns[i] for i in keep]
    seeds = [seeds[i] for i in keep]
    batch = aligner.score_reads_batch(alns, seeds, dtype=dtype)
    assert batch is not None
    host = np.stack([aligner.score_read(a, s) for a, s in zip(alns, seeds)])
    if rtol == 0.0:
        np.testing.assert_array_equal(batch, host)
    else:
        np.testing.assert_allclose(batch, host, rtol=rtol, atol=1e-4)
    return batch


def test_device_f64_bit_identical_to_host():
    hap, fl, fr = make_homopolymer_hap([12, 9, 15])
    alns = [_noisy_read(c, fl, fr, RNG) for c in (12, 9, 15, 11, 13, 14)]
    _batch_vs_host(hap, alns, np.float64, 0.0)


def test_device_f32_close_to_host():
    hap, fl, fr = make_homopolymer_hap([12, 9, 15, 4])
    alns = [_noisy_read(c, fl, fr, RNG) for c in (12, 4, 9, 15, 10)]
    _batch_vs_host(hap, alns, np.float32, 1e-4)


def test_device_random_loci_f64():
    # Random flanks/allele sets/read noise across several loci; exact f64
    # agreement each time.
    for trial in range(8):
        rng = np.random.default_rng(1000 + trial)
        fl = "".join(rng.choice(list("ACGT"), 8 + rng.integers(0, 6)))
        fr = "".join(rng.choice(list("ACGT"), 8 + rng.integers(0, 6)))
        ref = int(rng.integers(8, 16))
        alleles = [ref] + sorted({int(a) for a in
                                  rng.integers(4, 22, rng.integers(1, 4))}
                                 - {ref})
        hap, fl, fr = make_homopolymer_hap(alleles, fl, fr)
        alns = [_noisy_read(int(rng.choice(alleles)), fl, fr, rng, err=0.05)
                for _ in range(5)]
        aligner = ModeBAligner(hap)
        hs, he = hap.blocks[0].start, hap.blocks[-1].end
        seeds = [calc_seed_base(a, aligner.repeat_starts,
                                aligner.repeat_ends, hs, he) for a in alns]
        pairs = [(a, s) for a, s in zip(alns, seeds) if s >= 0]
        if not pairs:
            continue
        alns, seeds = [p[0] for p in pairs], [p[1] for p in pairs]
        batch = aligner.score_reads_batch(alns, seeds, dtype=np.float64)
        assert batch is not None
        host = np.stack([aligner.score_read(a, s)
                         for a, s in zip(alns, seeds)])
        np.testing.assert_array_equal(batch, host)


def test_envelope_fallback_empty_block_seq():
    # A config containing an empty repeat allele is outside the kernel
    # envelope; score_reads_batch must decline (caller falls back to host).
    sm = default_stutter_model().with_period(1)
    blocks = [HapBlock(90, 100, "ACGTTGCAGC")]
    rb = RepeatBlock(100, 106, "TTTTTT", 1, sm)
    rb.add_alternate("")
    blocks.append(rb)
    blocks.append(HapBlock(106, 116, "GTCAGGCTAT"))
    hap = Haplotype(blocks)
    aligner = ModeBAligner(hap)
    aln = read_for(6, "ACGTTGCAGC", "GTCAGGCTAT")
    hs, he = hap.blocks[0].start, hap.blocks[-1].end
    seed = calc_seed_base(aln, aligner.repeat_starts, aligner.repeat_ends,
                          hs, he)
    assert seed >= 0
    assert aligner.score_reads_batch([aln], [seed]) is None


def test_batched_artifact_tables_bit_identical_to_per_read():
    """The read-batched artifact-table builder (round 4: one descent per
    (block, D) with reads on a leading axis) must be BIT-identical to the
    per-read _artifact_table across random blocks, alternate sets, and
    segments including empty and 1-char ones.  Relies on numpy exp/log
    value-determinism across array shapes (verified: identical bits for
    identical values regardless of slicing/stacking)."""
    from longtr_tpu.models.stutter import StutterModel

    rng = np.random.default_rng(51)
    bases = np.array(list("ACGT"))
    for trial in range(25):
        lf = "".join(rng.choice(bases, int(rng.integers(3, 40))))
        rf = "".join(rng.choice(bases, int(rng.integers(3, 40))))
        rep_len = int(rng.integers(4, 30))
        rep = "A" * rep_len
        sm = StutterModel(0.9, 0.05, 0.05, 0.9, 0.01, 0.01, "A")
        rs = 1000 + len(lf)
        blocks = [HapBlock(1000, rs, lf)]
        rb = RepeatBlock(rs, rs + rep_len, rep, 1, sm)
        for d in sorted({int(x) for x in
                         rng.integers(-min(6, rep_len - 1), 7, 3)} - {0}):
            if rep_len + d >= 1:
                rb.add_alternate("A" * (rep_len + d))
        blocks.append(rb)
        blocks.append(HapBlock(rs + rep_len, rs + rep_len + len(rf), rf))
        al = ModeBAligner(Haplotype(blocks))
        segs = []
        for _ in range(int(rng.integers(1, 10))):
            L = int(rng.integers(0, 70))
            s = "".join(rng.choice(bases, L))
            lw = list(np.round(rng.uniform(-8, -0.5, L), 3))
            lc = list(np.round(rng.uniform(-0.05, -0.0001, L), 6))
            segs.append((s, lw, lc))
        l_pad = max(max((len(s[0]) for s in segs), default=1), 1)
        for side, blocks_s, saln in ((0, al.fw_blocks, al._fw_stutter),
                                     (1, al.rev_blocks, al._rev_stutter)):
            for bi, blk in enumerate(blocks_s):
                if blk.repeat_info is None:
                    continue
                n_d = len(range(blk.max_del, blk.max_ins + 1, blk.period))
                for opt in range(blk.num_options()):
                    want = np.stack([
                        al._artifact_table(blocks_s, saln, bi, opt,
                                           s, w, c, n_d, l_pad)
                        for (s, w, c) in segs])
                    got = al._artifact_table_batch(blocks_s, saln, bi, opt,
                                                   segs, n_d, l_pad)
                    np.testing.assert_array_equal(want, got)

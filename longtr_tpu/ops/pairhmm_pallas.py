"""Pallas TPU kernel for the mode-A pair-HMM.

Same semantics as :func:`longtr_tpu.ops.pairhmm.pairhmm_scan` (see that
module for the recurrence and the reference mapping to
HapAligner.cpp:236-343), hand-scheduled for the VPU.

Layout: TRANSPOSED — the batch axis rides the 128 lanes and the read axis
rides sublanes, i.e. state tiles are (M, TILE_B) f32.  This makes

* the per-row haplotype character a supported dynamic *sublane* slice
  ``hap_t_ref[pl.ds(i, 1), :]`` broadcast against the whole (M, B) tile,
* the within-row deletion recurrence (a decayed running max) a
  static-slice Hillis–Steele prefix max over sublanes (no wraparound, so
  no per-step masking),
* per-pair reductions (corner pick, band max) lane-preserving
  ``max(axis=0)`` ops.

Each grid program keeps its M/I/D rows resident in VMEM scratch across the
whole row loop; the data-dependent band abort becomes a max-accumulated
flag (same outputs as the reference's early return).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from longtr_tpu.ops.pairhmm import (AlignmentParams, BAND_FAIL_SCORE,
                                    BAND_THRESH, IMPOSSIBLE, LEN_DIFF_LIMIT,
                                    MATCH_EMIT, MIN_FULL_HAP_LEN, MISMATCH_EMIT)

TILE_B = 128


def _vmem_bytes(N, M):
    """Scoped-VMEM footprint model for one batch tile.

    Lane dims pad to 128 regardless of batch tile, so the footprint is set
    by sequence length alone: hap + read inputs, three M/I/D scratch rows
    and ~3 live (M, 128) temporaries, each M*128*4 bytes.  Empirically the
    compiler reports ~512*(N + 7M) bytes (23.7MB at N=M=5376).
    """
    return 512 * (N + 7 * M)


# v5e has 128MiB of VMEM per core; shapes above XLA's ~16MB default
# scoped-vmem limit get an explicit vmem_limit_bytes (multi-kb VNTR pairs
# would otherwise fall back to the host scorer — they are LongTR's
# headline workload).  The gate is the hardware-validated envelope
# (N=M=13312, i.e. ~13kb pairs, bit-identical vs the native scorer on
# v5e): the compiler's true stack allocation exceeds this model by up to
# ~1.65x at mid sizes, and a compile-time VMEM OOM wedges a shared axon
# tunnel for ~40min, so do not raise this without re-validating on
# hardware (tmp history: 2560/4096/5376/8192/13312 all pass).
VMEM_BUDGET = 56 * 1024 * 1024


def pallas_fits(N, M, budget=VMEM_BUDGET):
    """Whether the kernel's scoped VMEM footprint fits for this shape."""
    return _vmem_bytes(N, M) <= budget


def _prefix_max_flat(cm, Mdim):
    """Exact prefix max along axis 0 via static-slice Hillis–Steele steps.

    ``max`` is associative and exact in f32, so any evaluation order is
    bit-identical to the sequential running max.  Static slices (instead of
    rolls) sidestep wraparound, so no per-step iota mask is needed — the
    positions j < s are simply carried through the concat unchanged,
    exactly what the masked-roll formulation computed for them.
    """
    s = 1
    steps = max(1, (Mdim - 1).bit_length())
    for _k in range(steps):
        tail = jnp.maximum(jax.lax.slice_in_dim(cm, s, Mdim, axis=0),
                           jax.lax.slice_in_dim(cm, 0, Mdim - s, axis=0))
        cm = jnp.concatenate(
            [jax.lax.slice_in_dim(cm, 0, s, axis=0), tail], axis=0)
        s *= 2
    return cm


_SCAN_BLOCK = 16


def _prefix_max(cm, Mdim):
    """Exact prefix max along axis 0, blocked two-level formulation.

    Level 1 scans within blocks of ``_SCAN_BLOCK`` rows — log2(block)
    full-tile Hillis–Steele steps instead of log2(Mdim).  Level 2 is an
    exclusive prefix max over the per-block maxima, an (Mdim/block, B)
    array 1/block the size, folded back with one full-tile max whose
    -inf identity row leaves block 0 untouched exactly (max(x, -inf) == x
    bitwise for every finite x, and all DP values here are finite).

    max is associative and exact in f32, so regrouping the reduction is
    bit-identical to the flat scan (tests enforce equality with the
    sequential jnp scan).
    """
    blk = _SCAN_BLOCK
    # Below ~256 rows the two reshapes and the fold-back max cost more than
    # the handful of saved full-tile steps (measured: 192-row resident
    # kernel 77.1 -> 74.9 Gcells/s blocked, 512-row chunked kernel
    # 65.4 -> 68.1 blocked), so small scans keep the flat form.
    if Mdim < 256 or Mdim % blk:
        return _prefix_max_flat(cm, Mdim)
    nb = Mdim // blk
    B = cm.shape[1]
    x = cm.reshape(nb, blk, B)
    s = 1
    while s < blk:
        tail = jnp.maximum(jax.lax.slice_in_dim(x, s, blk, axis=1),
                           jax.lax.slice_in_dim(x, 0, blk - s, axis=1))
        x = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, s, axis=1), tail], axis=1)
        s *= 2
    bm = x[:, blk - 1, :]                               # (nb, B) block maxima
    carry = jnp.concatenate(
        [jnp.full((1, B), -jnp.inf, cm.dtype), bm[: nb - 1]], axis=0)
    carry = _prefix_max_flat(carry, nb)                 # exclusive prefix
    return jnp.maximum(x, carry[:, None, :]).reshape(Mdim, B)


def _kernel(trans_ref, hap_ref, hl_ref, read_ref, rl_ref, fl_ref,
            out_ref, mrow, irow, drow, acc):
    """One batch tile, transposed layout: hap (N, B), read (M, B).

    Dead-value elision (outputs proven bit-identical to the jnp scan by
    tests/test_pairhmm_pallas.py): state rows are NOT frozen at i == n-1
    and padded columns j >= m are NOT masked to NEG.  The DP dataflow is
    strictly rightward in j (pred/cm rolls move j -> j+1; the j = 0 wrap
    landing is overwritten by the column-0 closed forms), every output is
    captured through masks that ignore those cells (corner_mask picks
    j == m-1 at i == n-1 exactly; the band fail term is masked per row by
    row_active and band_mask), and all values stay finite, so the garbage
    cells never reach an output.
    """
    Mdim, B = read_ref.shape
    N = hap_ref.shape[0]
    NEG = jnp.float32(IMPOSSIBLE)
    MA = jnp.float32(MATCH_EMIT)
    MI = jnp.float32(MISMATCH_EMIT)
    i2i = trans_ref[0]
    i2m = trans_ref[1]
    d2d = trans_ref[2]
    d2m = trans_ref[3]
    m2m = trans_ref[4]
    m2i = trans_ref[5]
    m2d = trans_ref[6]

    read = read_ref[:]                                  # (M, B) int32
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (Mdim, B), 0)
    n = hl_ref[:]                                       # (1, B)
    m = rl_ref[:]                                       # (1, B)

    r0 = read[0:1, :]                                   # (1, B)
    # Row-0 emission quirk: hap[j] vs read[0] (HapAligner.cpp:268)
    if N >= Mdim:
        hap_m = hap_ref[0:Mdim, :]
    else:
        hap_m = jnp.concatenate(
            [hap_ref[:], jnp.zeros((Mdim - N, B), jnp.int32)], axis=0)
    emit_row0 = jnp.where(hap_m == r0, MA, MI)
    jf = j_idx.astype(jnp.float32)
    Dk = jnp.where(j_idx >= 1, m2d + (jf - 1.0) * d2d, NEG)
    Dk_shift = jnp.where(j_idx >= 2, m2d + (jf - 2.0) * d2d, NEG)
    h0 = hap_ref[0:1, :]
    M0 = jnp.where(j_idx == 0, jnp.where(h0 == r0, MA, MI),
                   Dk_shift + d2m + emit_row0)
    D0 = Dk
    I0 = jnp.full_like(M0, NEG)

    mrow[:] = M0
    irow[:] = I0
    drow[:] = D0

    col0_read = jnp.where(m > 1, read[1:2, :], read[0:1, :])   # (1, B)
    col0_emit = jnp.where(h0 == col0_read, MA, MI)             # (1, B)

    corner_mask = j_idx == (m - 1)
    best0 = jnp.maximum(M0, D0)        # I0 == NEG everywhere: elided
    corner0 = jnp.max(jnp.where(corner_mask, best0, NEG), axis=0,
                      keepdims=True)                           # (1, B)
    acc[0:1, :] = jnp.where(n == 1, corner0, NEG)
    acc[1:2, :] = jnp.zeros((1, B), jnp.float32)

    # Loop-invariant ramps, kept (M, 1) so they add no (M, B)-sized VMEM
    # pressure at the envelope edge (lane-broadcast in use).  c keeps the
    # reference op order (Mn + m2d) - ((jf + 1) * d2d); the band term
    # |(n-m) - (i-j)| = |j + ((m-n) - i)| is computed in f32 on
    # integer-valued operands < 2^24, so it is exact and bit-equal to the
    # int32-then-cast form.
    jf1 = jax.lax.broadcasted_iota(jnp.int32, (Mdim, 1), 0).astype(jnp.float32)
    c_ramp = (jf1 + 1.0) * d2d                         # (M, 1)
    d_ramp = jf1 * d2d                                 # (M, 1)
    nm_f = (n - m).astype(jnp.float32)                 # (1, B)
    # Loop-invariant masks, hoisted: values defined before the fori_loop
    # are closed over as loop constants, so these compares/ands are paid
    # once instead of every row.
    j0_mask = j_idx == 0
    band_mask = (j_idx >= 1) & (j_idx <= m - 1)

    def row_body(i, _):
        Mp = mrow[:]
        Ip = irow[:]
        Dp = drow[:]
        hrow = hap_ref[pl.ds(i, 1), :]                        # (1, B)
        emit = jnp.where(hrow == read, MA, MI)

        # roll commutes with elementwise max/add: one roll of the fused
        # predecessor instead of three per-matrix rolls (the j=0 wrap
        # landing is overwritten by the column-0 closed forms)
        pred = jnp.maximum(jnp.maximum(Mp + m2m, Dp + d2m), Ip + i2m)
        pred = pltpu.roll(pred, 1, axis=0)
        M_col0 = Ip[0:1, :] + i2m + col0_emit
        I_col0 = MA + m2i + (i.astype(jnp.float32) - 1.0) * i2i
        Mn = jnp.where(j0_mask, M_col0, emit + pred)
        In = jnp.where(j0_mask, I_col0,
                       MA + jnp.maximum(Mp + m2i, Ip + i2i))

        # D row via decayed running max over sublanes
        cm = _prefix_max((Mn + m2d) - c_ramp, Mdim)
        cm1 = pltpu.roll(cm, 1, axis=0)
        Dn = jnp.where(j0_mask, NEG, d_ramp + cm1)

        best = jnp.maximum(jnp.maximum(Mn, In), Dn)
        band = jnp.abs(jf1 + (nm_f - i.astype(jnp.float32))) * d2d
        row_best = jnp.max(jnp.where(band_mask, best + band, NEG), axis=0,
                           keepdims=True)
        row_active = i <= n - 1                                # (1, B)
        fail = jnp.where(row_active & (row_best < BAND_THRESH), 1.0, 0.0)
        acc[1:2, :] = jnp.maximum(acc[1:2, :], fail)

        corner = jnp.max(jnp.where(corner_mask, best, NEG), axis=0,
                         keepdims=True)
        acc[0:1, :] = jnp.where(i == n - 1, corner, acc[0:1, :])

        mrow[:] = Mn
        irow[:] = In
        drow[:] = Dn
        return 0

    jax.lax.fori_loop(1, N, row_body, 0)

    score = jnp.where(acc[1:2, :] > 0.5, jnp.float32(BAND_FAIL_SCORE),
                      acc[0:1, :])
    score = jnp.where(jnp.abs(n - m) > LEN_DIFF_LIMIT,
                      jnp.float32(BAND_FAIL_SCORE), score)
    score = jnp.where(fl_ref[:] <= MIN_FULL_HAP_LEN, NEG, score)
    out_ref[:] = score


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def _pallas_call_u8(hap, hl, read, rl, fl, trans, interpret=False,
                    tile_b=TILE_B):
    """Entry taking untransposed (B, N)/(B, M) uint8 batches.

    Transposing and widening on-device keeps the host->device transfer at
    one byte per base (4x less than shipping transposed int32 — the
    transfer, not the kernel, bounds e2e throughput through a tunnel).
    """
    hap_t = hap.T.astype(jnp.int32)
    read_t = read.T.astype(jnp.int32)
    return _pallas_call(hap_t, hl, read_t, rl, fl, trans,
                        interpret=interpret, tile_b=tile_b)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def _pallas_call(hap_t, hl, read_t, rl, fl, trans, interpret=False,
                 tile_b=TILE_B):
    N, B = hap_t.shape
    Mdim = read_t.shape[0]
    TILE = tile_b
    grid = (B // TILE,)
    need = _vmem_bytes(N, Mdim)
    kwargs = {}
    if need > 4 * 1024 * 1024 and not interpret:
        # past XLA's ~16MB default scoped-vmem limit (the analytic model
        # under-reports the compiler's true stack allocation by up to ~2x
        # at mid sizes, so raise the limit with generous slack): multi-kb
        # pairs must stay on the device
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(max(need * 2.5, 32 * 1024 * 1024),
                                     120 * 1024 * 1024)))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        **kwargs,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # trans (7,)
            pl.BlockSpec((N, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mdim, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Mdim, TILE), jnp.float32),
            pltpu.VMEM((Mdim, TILE), jnp.float32),
            pltpu.VMEM((Mdim, TILE), jnp.float32),
            pltpu.VMEM((8, TILE), jnp.float32),
        ],
        interpret=interpret,
    )(trans, hap_t, hl, read_t, rl, fl)
    return out[0]


def _kernel_chunked(trans_ref, hap_ref, hl_ref, read_ref, hapm_ref, rl_ref,
                    fl_ref, out_ref, mrow, irow, prow, epred, ecm, ermax,
                    r0_ref, acc):
    """J-chunked variant: the read axis streams through VMEM in blocks.

    Grid is (batch_tile, j_chunk) with the chunk axis minor (sequential on
    TPU), so scratch persists across a tile's chunks.  Cross-chunk DP state
    rides three (N, B) edge arrays:

    * ``epred[i]`` — fused predecessor max(M,I,D + trans) of row i at the
      chunk's last column (consumed by the next chunk's row i+1 via a
      one-row stagger carried through the fori_loop);
    * ``ecm[i]``   — the deletion recurrence's decayed running max through
      the chunk's last column (consumed by the next chunk at the same row);
    * ``ermax[i]`` — accumulated band row-max (band fail is decided at the
      last chunk, when the row max is complete).

    Every cross-chunk combine is a pure ``max`` of identically-computed
    terms, so outputs are bit-identical to the resident kernel and the jnp
    scan (tests enforce).  VMEM scales as ~2048*N + O(chunk) instead of
    ~4096*M, lifting the on-device pair length cap from ~13kb to ~40kb.

    Per-row state is (M, I, fused-pred) rather than (M, I, D): the fused
    predecessor tile max(M+m2m, D+d2m, I+i2m) is computed ONCE at the end
    of each row (its last column is the epred edge anyway) and carried in
    ``prow``, so the next row starts with a plain roll instead of
    recomputing the 5-op fused max — and the D tile never needs to be
    stored or reloaded at all.  Same expressions, same order: bit-identical.
    """
    Jc, B = read_ref.shape
    N = hap_ref.shape[0]
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    first = c_idx == 0
    last = c_idx == n_chunks - 1
    cs = c_idx * Jc

    NEG = jnp.float32(IMPOSSIBLE)
    MA = jnp.float32(MATCH_EMIT)
    MI = jnp.float32(MISMATCH_EMIT)
    i2i = trans_ref[0]
    i2m = trans_ref[1]
    d2d = trans_ref[2]
    d2m = trans_ref[3]
    m2m = trans_ref[4]
    m2i = trans_ref[5]
    m2d = trans_ref[6]

    read = read_ref[:]                                   # (Jc, B) int32
    jl_idx = jax.lax.broadcasted_iota(jnp.int32, (Jc, B), 0)
    j_idx = jl_idx + cs                                  # global j
    n = hl_ref[:]                                        # (1, B)
    m = rl_ref[:]                                        # (1, B)
    jf = j_idx.astype(jnp.float32)
    in_chunk = (m - 1 >= cs) & (m - 1 < cs + Jc)         # (1, B)
    # Loop-invariant ramps in global j, kept (Jc, 1)/(1, B) (see the
    # resident kernel): exact-integer f32 arithmetic keeps every value
    # bit-equal to the int32-then-cast forms.
    jl1 = jax.lax.broadcasted_iota(jnp.int32, (Jc, 1), 0).astype(jnp.float32)
    cs_f = cs.astype(jnp.float32)
    c_ramp = ((jl1 + cs_f) + 1.0) * d2d                  # (Jc, 1)
    d_ramp = (jl1 + cs_f) * d2d                          # (Jc, 1)
    nm_cs_f = (n - m).astype(jnp.float32) + cs_f         # (1, B)

    @pl.when(first)
    def _init():
        r0_ref[:] = read[0:1, :]
        col0_read = jnp.where(m > 1, read[1:2, :], read[0:1, :])
        h0_ = hap_ref[0:1, :]
        acc[2:3, :] = jnp.where(h0_ == col0_read, MA, MI)   # col0_emit
        acc[0:1, :] = jnp.full((1, B), NEG)
        acc[1:2, :] = jnp.zeros((1, B), jnp.float32)

    r0 = r0_ref[:]                                       # (1, B)
    col0_emit = acc[2:3, :]
    h0 = hap_ref[0:1, :]

    # ---- row 0 (closed-form in global j; HapAligner.cpp:268 quirk) ----
    # prev chunk's row-0 edge, read BEFORE overwrite (stagger carry)
    carry0 = jnp.where(first, jnp.full((1, B), NEG), epred[0:1, :])
    hap_m = hapm_ref[:]                                  # (Jc, B) int32
    emit_row0 = jnp.where(hap_m == r0, MA, MI)
    Dk = jnp.where(j_idx >= 1, m2d + (jf - 1.0) * d2d, NEG)
    Dk_shift = jnp.where(j_idx >= 2, m2d + (jf - 2.0) * d2d, NEG)
    M0 = jnp.where(j_idx == 0, jnp.where(h0 == r0, MA, MI),
                   Dk_shift + d2m + emit_row0)
    D0 = Dk
    I0 = jnp.full((Jc, B), NEG)
    mrow[:] = M0
    irow[:] = I0
    fused0 = jnp.maximum(jnp.maximum(M0 + m2m, D0 + d2m), I0 + i2m)
    prow[:] = fused0
    epred[0:1, :] = fused0[Jc - 1: Jc, :]

    corner_mask = j_idx == (m - 1)
    best0 = jnp.maximum(M0, D0)        # I0 == NEG everywhere: elided
    corner0 = jnp.max(jnp.where(corner_mask, best0, NEG), axis=0,
                      keepdims=True)
    acc[0:1, :] = jnp.where((n == 1) & in_chunk, corner0, acc[0:1, :])

    thresh = jnp.float32(BAND_THRESH)
    # Loop-invariant masks, hoisted out of the row loop (see _kernel)
    j0_mask = j_idx == 0
    jl0_mask = jl_idx == 0
    band_mask = (j_idx >= 1) & (j_idx <= m - 1)

    def row_body(i, carry_pred):
        # prev chunk's edges for this row, read BEFORE overwrite
        old_pred_i = epred[pl.ds(i, 1), :]
        old_cm_i = jnp.where(first, jnp.full((1, B), NEG),
                             ecm[pl.ds(i, 1), :])
        old_rm_i = jnp.where(first, jnp.full((1, B), NEG),
                             ermax[pl.ds(i, 1), :])
        Mp = mrow[:]
        Ip = irow[:]
        hrow = hap_ref[pl.ds(i, 1), :]                    # (1, B)
        emit = jnp.where(hrow == read, MA, MI)

        pred = pltpu.roll(prow[:], 1, axis=0)
        # chunk boundary: the rolled-in lane is the previous chunk's
        # fused edge at row i-1 (garbage wrap at chunk 0 is discarded by
        # the j==0 where, exactly as in the resident kernel)
        pred = jnp.where(jl0_mask, carry_pred, pred)
        M_col0 = Ip[0:1, :] + i2m + col0_emit
        I_col0 = MA + m2i + (i.astype(jnp.float32) - 1.0) * i2i
        Mn = jnp.where(j0_mask, M_col0, emit + pred)
        In = jnp.where(j0_mask, I_col0,
                       MA + jnp.maximum(Mp + m2i, Ip + i2i))

        # deletion recurrence: decayed running max, seeded by the previous
        # chunk's carry for this row
        cm = jnp.maximum(_prefix_max((Mn + m2d) - c_ramp, Jc), old_cm_i)
        ecm[pl.ds(i, 1), :] = cm[Jc - 1: Jc, :]
        cm1 = pltpu.roll(cm, 1, axis=0)
        cm1 = jnp.where(jl0_mask, old_cm_i, cm1)
        Dn = jnp.where(j0_mask, NEG, d_ramp + cm1)

        best = jnp.maximum(jnp.maximum(Mn, In), Dn)
        band = jnp.abs(jl1 + (nm_cs_f - i.astype(jnp.float32))) * d2d
        row_best = jnp.max(jnp.where(band_mask, best + band, NEG), axis=0,
                           keepdims=True)
        row_best = jnp.maximum(row_best, old_rm_i)
        ermax[pl.ds(i, 1), :] = row_best
        row_active = i <= n - 1                           # (1, B)

        @pl.when(last)
        def _fail():
            fail = jnp.where(row_active & (row_best < thresh), 1.0, 0.0)
            acc[1:2, :] = jnp.maximum(acc[1:2, :], fail)

        corner = jnp.max(jnp.where(corner_mask, best, NEG), axis=0,
                         keepdims=True)
        acc[0:1, :] = jnp.where((i == n - 1) & in_chunk, corner,
                                acc[0:1, :])

        mrow[:] = Mn
        irow[:] = In
        fused = jnp.maximum(jnp.maximum(Mn + m2m, Dn + d2m), In + i2m)
        prow[:] = fused
        epred[pl.ds(i, 1), :] = fused[Jc - 1: Jc, :]
        return old_pred_i

    jax.lax.fori_loop(1, N, row_body,
                      jnp.where(first, jnp.full((1, B), NEG), carry0))

    @pl.when(last)
    def _finish():
        score = jnp.where(acc[1:2, :] > 0.5, jnp.float32(BAND_FAIL_SCORE),
                          acc[0:1, :])
        score = jnp.where(jnp.abs(n - m) > LEN_DIFF_LIMIT,
                          jnp.float32(BAND_FAIL_SCORE), score)
        score = jnp.where(fl_ref[:] <= MIN_FULL_HAP_LEN, NEG, score)
        out_ref[:] = score


# Chunk length swept on hardware at the 8kb bench shape (round 4):
# 64/128/256/512/1024/2048 -> 85.2/90.8/78.8/68.7/57.5/52.0 Gcells/s,
# outputs bit-identical across all values.  128 wins: the per-chunk
# prefix-max scan costs log2(jc) full-tile steps per row while the
# cross-chunk edge-array traffic per cell only grows as 1/jc.
JCHUNK = 128

# hardware-validated chunked-kernel envelope (same discipline as
# VMEM_BUDGET: a compile-time VMEM OOM wedges the shared tunnel, so gate
# to sizes actually compiled on a v5e)
CHUNKED_N_CAP = 40 * 1024


def chunked_vmem_bytes(N, jc=JCHUNK):
    """hap (N,B) i32 + 3 f32 edge arrays (N,B) + ~14 chunk-sized buffers."""
    return 2048 * N + 512 * 14 * jc


def chunked_fits(N, M, jc=JCHUNK):
    return N <= CHUNKED_N_CAP and chunked_vmem_bytes(N, jc) <= VMEM_BUDGET * 2


def device_fits(N, M):
    """Whether any Pallas path (resident or chunked) covers this shape."""
    return pallas_fits(N, M) or chunked_fits(N, M)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b", "jc"))
def _pallas_call_chunked_u8(hap, hl, read, rl, fl, trans, interpret=False,
                            tile_b=TILE_B, jc=JCHUNK):
    """Chunked entry taking untransposed (B, N)/(B, Mpad) uint8 batches."""
    hap_t = hap.T.astype(jnp.int32)
    read_t = read.T.astype(jnp.int32)
    Mdim = read_t.shape[0]
    N = hap_t.shape[0]
    # hap re-indexed along the read axis for the row-0 emission quirk
    # (HapAligner.cpp:268: hap[j] vs read[0]); pad/trim to Mdim
    if N >= Mdim:
        hap_m = hap_t[:Mdim]
    else:
        hap_m = jnp.concatenate(
            [hap_t, jnp.zeros((Mdim - N, hap_t.shape[1]), jnp.int32)], axis=0)
    return _pallas_call_chunked(hap_t, hl, read_t, hap_m, rl, fl, trans,
                                interpret=interpret, tile_b=tile_b, jc=jc)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b", "jc"))
def _pallas_call_chunked(hap_t, hl, read_t, hap_m, rl, fl, trans,
                         interpret=False, tile_b=TILE_B, jc=JCHUNK):
    N, B = hap_t.shape
    Mdim = read_t.shape[0]
    assert Mdim % jc == 0, (Mdim, jc)
    TILE = tile_b
    n_chunks = Mdim // jc
    grid = (B // TILE, n_chunks)
    Npad = -(-N // 8) * 8
    kwargs = {}
    if not interpret:
        need = chunked_vmem_bytes(N, jc)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(max(need * 2, 32 * 1024 * 1024),
                                     120 * 1024 * 1024)))
    out = pl.pallas_call(
        _kernel_chunked,
        grid=grid,
        **kwargs,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # trans (7,)
            pl.BlockSpec((N, TILE), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),               # hap
            pl.BlockSpec((1, TILE), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),               # hl
            pl.BlockSpec((jc, TILE), lambda b, c: (c, b),
                         memory_space=pltpu.VMEM),               # read chunk
            pl.BlockSpec((jc, TILE), lambda b, c: (c, b),
                         memory_space=pltpu.VMEM),               # hap_m chunk
            pl.BlockSpec((1, TILE), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),               # rl
            pl.BlockSpec((1, TILE), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),               # fl
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda b, c: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((jc, TILE), jnp.float32),    # mrow
            pltpu.VMEM((jc, TILE), jnp.float32),    # irow
            pltpu.VMEM((jc, TILE), jnp.float32),    # prow (fused pred)
            pltpu.VMEM((Npad, TILE), jnp.float32),  # epred
            pltpu.VMEM((Npad, TILE), jnp.float32),  # ecm
            pltpu.VMEM((Npad, TILE), jnp.float32),  # ermax
            pltpu.VMEM((1, TILE), jnp.int32),       # r0
            pltpu.VMEM((8, TILE), jnp.float32),     # acc
        ],
        interpret=interpret,
    )(trans, hap_t, hl, read_t, hap_m, rl, fl)
    return out[0]


def pairhmm_batch_pallas(hap_codes, hap_lens, read_codes, read_lens,
                         full_hap_lens, params: AlignmentParams = AlignmentParams(),
                         interpret: bool = False, tile_b: int | None = None,
                         jc: int | None = None):
    """Drop-in replacement for pairhmm.pairhmm_batch using the Pallas kernel.

    Accepts the same (B, N)/(B, M) uint8 batch and transposes into the
    lanes-carry-batch layout expected by the kernel.  Shapes beyond the
    resident kernel's VMEM envelope stream the read axis through the
    chunked kernel (same results bit-for-bit); ``jc`` overrides the chunk
    length (testing hook).
    """
    hap = np.asarray(hap_codes)
    read = np.asarray(read_codes)
    if tile_b is None:
        tile_b = TILE_B
    B = hap.shape[0]
    Bpad = -(-B // tile_b) * tile_b
    if Bpad != B:
        hap = np.pad(hap, ((0, Bpad - B), (0, 0)))
        read = np.pad(read, ((0, Bpad - B), (0, 0)))
    hl = np.pad(np.asarray(hap_lens, np.int32), (0, Bpad - B),
                constant_values=1)
    rl = np.pad(np.asarray(read_lens, np.int32), (0, Bpad - B),
                constant_values=1)
    fl = np.pad(np.asarray(full_hap_lens, np.int32), (0, Bpad - B),
                constant_values=1)
    trans = jnp.asarray(params.as_array())
    hap_u8 = hap.astype(np.uint8, copy=False)
    read_u8 = read.astype(np.uint8, copy=False)
    N, M = hap.shape[1], read.shape[1]
    use_chunked = jc is not None or not pallas_fits(N, M)
    if use_chunked:
        jc_eff = jc or JCHUNK
        if jc_eff < 2:
            raise ValueError(f"jc must be >= 2, got {jc_eff}")
        if not interpret and not chunked_fits(N, M, jc_eff):
            # Refuse rather than dispatch: an out-of-envelope Mosaic
            # compile VMEM-OOMs, which wedges the shared axon tunnel for
            # ~40 min.  Production callers pre-gate with device_fits and
            # fall back to the bit-identical native host scorer.
            raise ValueError(
                f"shape N={N} (jc={jc_eff}) exceeds the hardware-validated "
                f"chunked-kernel envelope (N<={CHUNKED_N_CAP}); score on "
                f"the host (native.pairhmm_batch_native) instead")
        Mpad = -(-M // jc_eff) * jc_eff
        if Mpad != M:
            read_u8 = np.pad(read_u8, ((0, 0), (0, Mpad - M)))
        out = _pallas_call_chunked_u8(
            jnp.asarray(hap_u8), jnp.asarray(hl[None, :]),
            jnp.asarray(read_u8), jnp.asarray(rl[None, :]),
            jnp.asarray(fl[None, :]), trans,
            interpret=interpret, tile_b=tile_b, jc=jc_eff)
        return out[:B]
    out = _pallas_call_u8(jnp.asarray(hap_u8), jnp.asarray(hl[None, :]),
                          jnp.asarray(read_u8), jnp.asarray(rl[None, :]),
                          jnp.asarray(fl[None, :]), trans,
                          interpret=interpret, tile_b=tile_b)
    return out[:B]

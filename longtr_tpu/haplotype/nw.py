"""Affine-gap Needleman-Wunsch with traceback (host-side).

Reference: src/SeqAlignment/NeedlemanWunsch.{h,cpp} — 3-matrix (M/Iref/Iread)
affine NW with match=2, mismatch=-2, gap open=5, gap extend=0.125, N matches
everything, and optional free reference end gaps.  Used for
haplotype-vs-reference alignment (Haplotype.cpp:58-86) and the viz realign
path — not the read hot loop.

All scores are multiples of 0.125, so float32 arithmetic is exact and the
row-vectorized running-max formulation below is bit-identical to the
reference's sequential loop.  The reference's LeftAlign tie-breaking via
IndelTracker (NeedlemanWunsch.cpp:10-75) biases indels leftward; standard
traceback with the same bestIndex tie rules reproduces the common cases, and
indel placement into repeat blocks is then normalized by
``Haplotype.adjust_indels`` (see haplotype.blocks).
"""

from __future__ import annotations

import numpy as np

MATCH = np.float32(2.0)
MISMATCH = np.float32(-2.0)
GAPOPEN = np.float32(5.0)
GAPEXTEND = np.float32(0.125)
LARGE = np.float32(1000000.0)

_BASE_INT = np.full(256, 4, dtype=np.int8)
for _i, _c in enumerate("ACGT"):
    _BASE_INT[ord(_c)] = _i
    _BASE_INT[ord(_c.lower())] = _i
_SCORE = np.full((5, 5), MISMATCH, dtype=np.float32)
np.fill_diagonal(_SCORE, MATCH)
_SCORE[4, :] = MATCH
_SCORE[:, 4] = MATCH


def _best3(s1, s2, s3):
    """bestIndex tie rules (NeedlemanWunsch.cpp:122-141), vectorized."""
    t = np.where(s2 > s1, np.where(s2 > s3, 1, 2), np.where(s3 > s1, 2, 0))
    v = np.where(t == 0, s1, np.where(t == 1, s2, s3))
    return v.astype(np.float32), t.astype(np.int8)


def nw_align(ref_seq: str, read_seq: str, use_ref_end_penalty: bool = True):
    """Global affine alignment.

    Returns (ok, ref_al, read_al, score, cigar_list) where cigar uses
    =/X/I/D ops ('I' consumes read, 'D' consumes ref).  ``ok`` is False when
    the read extends past the reference boundaries (Align():417-421).
    """
    L1, L2 = len(ref_seq), len(read_seq)
    rb = _BASE_INT[np.frombuffer(ref_seq.encode(), dtype=np.uint8)]
    db = _BASE_INT[np.frombuffer(read_seq.encode(), dtype=np.uint8)]

    M = np.full((L2 + 1, L1 + 1), -LARGE, dtype=np.float32)
    Iref = np.full((L2 + 1, L1 + 1), -LARGE, dtype=np.float32)
    Iread = np.full((L2 + 1, L1 + 1), -LARGE, dtype=np.float32)
    tM = np.full((L2 + 1, L1 + 1), -1, dtype=np.int8)
    tIref = np.full((L2 + 1, L1 + 1), -1, dtype=np.int8)
    tIread = np.full((L2 + 1, L1 + 1), -1, dtype=np.int8)

    M[0, 0] = 0.0
    jj = np.arange(1, L1 + 1, dtype=np.float32)
    if use_ref_end_penalty:
        Iref[0, 1:] = -GAPOPEN - (jj - 1) * GAPEXTEND
    else:
        Iref[0, 1:] = 0.0
    tIref[0, 1:] = 1
    ii = np.arange(1, L2 + 1, dtype=np.float32)
    Iread[1:, 0] = -GAPOPEN - (ii - 1) * GAPEXTEND
    tIread[1:, 0] = 2

    colf = np.arange(L1 + 1, dtype=np.float32)
    for i in range(1, L2 + 1):
        sub = _SCORE[rb, db[i - 1]]                       # (L1,)
        # M row from previous row's diagonal
        v, t = _best3(M[i - 1, :-1], Iref[i - 1, :-1], Iread[i - 1, :-1])
        M[i, 1:] = v + sub
        tM[i, 1:] = t
        # Iread from previous row, same column
        v, t = _best3(M[i - 1, 1:] - GAPOPEN, Iref[i - 1, 1:] - GAPOPEN,
                      Iread[i - 1, 1:] - GAPEXTEND)
        Iread[i, 1:] = v
        tIread[i, 1:] = t
        # Iref: within-row decayed running max over base = max(M-GO, Iread-GO)
        # with chain Iref[j] = Iref[j-1]-GE.  All scores are 0.125 multiples,
        # so the scan is exact.
        base = np.maximum(M[i, :-1] - GAPOPEN, Iread[i, :-1] - GAPOPEN)
        c = base + colf[:-1] * GAPEXTEND
        run = np.maximum.accumulate(c)
        # Iref[i, j] = max_{k<=j-1} (base[k] - (j-1-k)*GE) = run[j-1]-(j-1)*GE
        Iref[i, 1:] = run - colf[:-1] * GAPEXTEND
        # also allow starting from Iref[i,0] (=-LARGE unless i==0) — covered
        # by base containing -LARGE floor.
        # trace for Iref from actual predecessor comparison:
        s1 = M[i, :-1] - GAPOPEN
        s2 = Iref[i, :-1] - GAPEXTEND
        s3 = Iread[i, :-1] - GAPOPEN
        _, t = _best3(s1, s2, s3)
        tIref[i, 1:] = t

    # Optimal stop
    if use_ref_end_penalty:
        cand = [(M[L2, L1], L1, 0), (Iref[L2, L1], L1, 1), (Iread[L2, L1], L1, 2)]
        best_val, best_col, best_type = cand[0]
        for v, c, t in cand[1:]:
            if v > best_val:
                best_val, best_col, best_type = v, c, t
    else:
        best_val, best_col, best_type = -LARGE, -1, -1
        for col in range(L1 + 1):
            if M[L2, col] >= best_val:
                best_val, best_col, best_type = M[L2, col], col, 0
            if Iref[L2, col] > best_val:
                best_val, best_col, best_type = Iref[L2, col], col, 1
            if Iread[L2, col] > best_val:
                best_val, best_col, best_type = Iread[L2, col], col, 2

    # Traceback (traceAlignment, NeedlemanWunsch.cpp:247-338)
    ref_al = []
    read_al = []
    raw = []
    for j in range(L1, best_col, -1):
        ref_al.append(ref_seq[j - 1])
        read_al.append("-")
    row, col, typ = L2, best_col, best_type
    while row > 0:
        if typ == 0:
            ref_al.append(ref_seq[col - 1])
            read_al.append(read_seq[row - 1])
            raw.append("=" if _BASE_INT[ord(ref_seq[col - 1])] ==
                       _BASE_INT[ord(read_seq[row - 1])] else "X")
            typ = tM[row, col]
            row -= 1
            col -= 1
        elif typ == 1:
            ref_al.append(ref_seq[col - 1])
            read_al.append("-")
            raw.append("D")
            typ = tIref[row, col]
            col -= 1
        elif typ == 2:
            ref_al.append("-")
            read_al.append(read_seq[row - 1])
            raw.append("I")
            typ = tIread[row, col]
            row -= 1
        else:
            raise RuntimeError("Invalid matrix type in NW traceback")
    for j in range(col, 0, -1):
        ref_al.append(ref_seq[j - 1])
        read_al.append("-")

    ref_al = "".join(reversed(ref_al))
    read_al = "".join(reversed(read_al))
    raw = "".join(reversed(raw))
    cigar = []
    for ch in raw:
        if cigar and cigar[-1][0] == ch:
            cigar[-1][1] += 1
        else:
            cigar.append([ch, 1])
    cigar = [tuple(c) for c in cigar]
    ok = not (cigar and (cigar[0][0] == "S" or cigar[-1][0] == "S"))
    return ok, ref_al, read_al, float(best_val), cigar


def adjust_indels(ref_hap_al: str, alt_hap_al: str, flank_end: int,
                  repeat_start: int):
    """Nudge indels rightward into the repeat block (Haplotype.cpp:8-56).

    ``flank_end``/``repeat_start``: genomic coords of block 0 start and the
    repeat block start.  Returns the adjusted (ref_al, alt_al).
    """
    ref = list(ref_hap_al)
    alt = list(alt_hap_al)
    ref_pos = flank_end
    aln_index = 0
    n = len(alt)
    while aln_index < n:
        if alt[aln_index] == "-" and ref_pos < repeat_start:
            index = aln_index
            while index < n and alt[index] == "-":
                index += 1
            pos = ref_pos
            del_index = aln_index
            del_size = index - aln_index
            while index < n and pos < repeat_start and ref[del_index] == ref[index]:
                alt[del_index] = alt[index]
                alt[index] = "-"
                index += 1
                del_index += 1
                pos += 1
            aln_index = index
            ref_pos = pos + del_size
        elif ref[aln_index] == "-" and ref_pos < repeat_start:
            index = aln_index
            while index < n and ref[index] == "-":
                index += 1
            pos = ref_pos
            ins_index = aln_index
            while index < n and pos < repeat_start and alt[ins_index] == alt[index]:
                ref[ins_index] = ref[index]
                ref[index] = "-"
                index += 1
                ins_index += 1
                pos += 1
            aln_index = index
            ref_pos = pos
        else:
            if ref[aln_index] != "-":
                ref_pos += 1
            aln_index += 1
    return "".join(ref), "".join(alt)

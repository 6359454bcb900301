"""Legacy HipSTR read filters + Z-algorithm.

Reference: src/alignment_filters.{h,cpp} and src/zalgorithm.{h,cpp}.  The
call sites are commented out in LongTR (bam_processor.cpp:294-316), but the
components remain part of the surface; they gate reads on end-match quality
and indel proximity.
"""

from __future__ import annotations


def prefix_match_counts(s1: str, s2: str):
    """For each position i of s2, length of the longest common prefix of
    s1 and s2[i:] (Z-algorithm; zalgorithm.cpp)."""
    s = s1 + "\x00" + s2
    n = len(s)
    z = [0] * n
    z[0] = n
    l = r = 0
    for i in range(1, n):
        if i < r:
            z[i] = min(r - i, z[i - l])
        while i + z[i] < n and s[z[i]] == s[i + z[i]]:
            z[i] += 1
        if i + z[i] > r:
            l, r = i, i + z[i]
    off = len(s1) + 1
    return [min(z[off + i], len(s1)) for i in range(len(s2))]


def suffix_match_counts(s1: str, s2: str):
    rev = prefix_match_counts(s1[::-1], s2[::-1])
    return rev[::-1]


def get_num_end_matches(rec, ref_seq: str, ref_offset: int = 0):
    """(left_match_len, right_match_len) of perfect end matches
    (AlignmentFilters::GetNumEndMatches)."""
    seq = rec.seq
    pos = rec.pos - ref_offset
    # walk cigar to map end bases to reference coords
    left = 0
    p, s = pos, 0
    for op, num in rec.cigar:
        if op in "M=X":
            while num > 0 and s < len(seq):
                if p < 0 or p >= len(ref_seq) or seq[s] != ref_seq[p].upper():
                    break
                left += 1
                p += 1
                s += 1
                num -= 1
            break
        elif op in ("S", "I", "D", "H"):
            break
    right = 0
    p = rec.end_pos - 1 - ref_offset
    s = len(seq) - 1
    for op, num in reversed(rec.cigar):
        if op in "M=X":
            while num > 0 and s >= 0:
                if p < 0 or p >= len(ref_seq) or seq[s] != ref_seq[p].upper():
                    break
                right += 1
                p -= 1
                s -= 1
                num -= 1
            break
        elif op in ("S", "I", "D", "H"):
            break
    return left, right


def get_end_dist_to_indel(rec):
    """Distance from each read end to the nearest indel, or -1 if none
    (AlignmentFilters::GetEndDistToIndel)."""
    left = -1
    dist = 0
    for op, num in rec.cigar:
        if op in ("I", "D"):
            left = dist
            break
        if op in "M=XS":
            dist += num
    right = -1
    dist = 0
    for op, num in reversed(rec.cigar):
        if op in ("I", "D"):
            right = dist
            break
        if op in "M=XS":
            dist += num
    return left, right

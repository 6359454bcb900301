"""Mode-B alignment: the legacy HipSTR stutter HMM for short homopolymers.

Reference: ``HapAligner::align_seq_to_hap_short`` (HapAligner.cpp:27-163),
``StutterAlignerClass`` (StutterAlignerClass.{h,cpp}) and
``compute_aln_logprob`` (HapAligner.cpp:165-233).  Active only when
``--stutter-align-len`` is set and the repeat period is 1
(HapAligner.cpp:552-555).

Semantics:
* a seed base (a `=` position >=5bp from indels/repeats, calc_seed_base,
  HapAligner.cpp:467-542) splits the read; left and right segments align
  independently against the forward and reversed haplotype,
* non-repeat blocks use a max-transition HMM with per-base quality
  emissions; the within-row insert recurrence is a decayed running max, so
  rows vectorize exactly like mode A,
* repeat blocks are scored by marginalizing PCR artifact sizes
  D ∈ [-6·period, +6·period] and artifact positions; for period-1 blocks the
  position loop collapses via the upstream-match skip
  (StutterAlignerClass.cpp:75-100), keeping the host transcription cheap,
* the total LL marginalizes the seed across all non-repeat haplotype
  positions with a uniform prior (compute_aln_logprob).

The reference's homopolymer-length lookups inside the flank recurrence
(HapAligner.cpp:121-122) are computed but never used — omitted here.
"""

from __future__ import annotations

import numpy as np

from longtr_tpu.utils.mathops import LOG_THRESH, int_log

IMPOSSIBLE = -1000000000.0
MIN_SEED_DIST = 5


def fast_lse(vals) -> float:
    """fast_log_sum_exp semantics (term dropping); exact by default, the
    reference's Mineiro bit patterns in reference-fidelity mode."""
    from longtr_tpu.utils import mathops
    if mathops.ref_fidelity():
        from longtr_tpu.utils import fastapprox
        return fastapprox.fast_log_sum_exp_vec(vals)
    arr = np.asarray(vals, dtype=np.float64)
    m = arr.max()
    if not np.isfinite(m):
        return float(m)
    d = arr - m
    return float(m + np.log(np.exp(d[d > LOG_THRESH]).sum()))


class StutterAligner:
    """Per-(block allele) artifact scorer (StutterAlignerClass)."""

    def __init__(self, block_seq: str, period: int, left_align: bool,
                 repeat_info):
        self.block_seq = block_seq
        self.block_len = len(block_seq)
        self.period = period
        self.left_align = left_align
        self.num_insertions = repeat_info.max_ins // period
        self.num_deletions = -(repeat_info.max_del // period)
        while self.num_deletions * period > self.block_len:
            self.num_deletions -= 1
        self.max_insertion = period * self.num_insertions
        self.max_deletion = -period * self.num_deletions

        # upstream_match_lengths_ per deletion multiple (h:36-43)
        self.upstream = []
        for p in range(period, -self.max_deletion + 1 if self.max_deletion else period + 1, period):
            self.upstream.append(self._num_upstream_matches(block_seq, p))
        if self.max_deletion == 0:
            self.upstream.append(self._num_upstream_matches(block_seq, period)
                                 if block_seq else np.zeros(0, dtype=np.int64))

    @staticmethod
    def _num_upstream_matches(seq: str, period: int):
        n = len(seq)
        out = np.zeros(n, dtype=np.int64)
        for i in range(period, n):
            out[i] = 0 if seq[i - period] != seq[i] else 1 + out[i - 1]
        return out

    def load_read(self, base_seq_len, base_seq, base_log_wrong,
                  base_log_correct):
        """Precompute per-offset prefix probabilities (cpp:12-53).

        ``base_seq`` etc. are python sequences indexed 0..base_seq_len-1 in
        READ order; the C++ uses reversed pointers — we mirror with explicit
        reversed indexing: C++ base_seq[-k] == seq_rev[k] here.
        """
        L = base_seq_len
        seq_rev = base_seq[::-1]
        lw_rev = base_log_wrong[::-1]
        lc_rev = base_log_correct[::-1]
        blk_rev = self.block_seq[::-1]
        nI, nD = self.num_insertions, self.num_deletions
        self.ins_probs = np.zeros((L, max(nI, 1)))
        self.del_probs = np.zeros((L, max(nD, 1))) if nD else None
        self.match_probs = np.zeros(L)
        for i in range(L):
            log_prob = 0.0
            j = 0
            di = 0
            # C++ loops on -max_deletion_ (the positive magnitude,
            # StutterAlignerClass.cpp:28,33); max_deletion here mirrors the
            # negative C++ member.
            lim = min(L - i, -self.max_deletion)
            while j < lim:
                log_prob += (lc_rev[i + j] if seq_rev[i + j] == blk_rev[j]
                             else lw_rev[i + j])
                if (j + 1) % self.period == 0:
                    self.del_probs[i, di] = log_prob
                    di += 1
                j += 1
            while j < -self.max_deletion:
                if (j + 1) % self.period == 0:
                    di += 1
                j += 1
            while j < min(L - i, self.block_len):
                log_prob += (lc_rev[i + j] if seq_rev[i + j] == blk_rev[j]
                             else lw_rev[i + j])
                j += 1
            self.match_probs[i] = log_prob

            log_ins = 0.0
            j = 0
            ii = 0
            while j < min(self.max_insertion, L - i):
                if j % self.period < self.block_len:
                    log_ins += (lc_rev[i + j]
                                if seq_rev[i + j] == blk_rev[j % self.period]
                                else lw_rev[i + j])
                else:
                    log_ins += lc_rev[i + j]
                if (j + 1) % self.period == 0:
                    self.ins_probs[i, ii] = log_ins
                    ii += 1
                j += 1
            while j < self.max_insertion:
                if (j + 1) % self.period == 0:
                    self.ins_probs[i, ii] = log_ins
                    ii += 1
                j += 1
        self._seq_rev = seq_rev
        self._lw_rev = lw_rev
        self._lc_rev = lc_rev
        self._blk_rev = blk_rev
        self._L = L

    def _score(self, read_idx, blk_idx):
        """Match log-prob of reversed read pos vs reversed block pos."""
        return (self._lc_rev[read_idx]
                if self._seq_rev[read_idx] == self._blk_rev[blk_idx]
                else self._lw_rev[read_idx])

    def align(self, base_seq_len: int, j_end: int, offset: int, D: int):
        """align_stutter_region_reverse.

        ``j_end``: index of the rightmost read base of this segment in READ
        order (the C++ passes seq_0+j with reversed walking); ``offset``:
        reversed-offset of that base.  Returns (log_prob, best_pos).
        """
        if D == 0:
            return self.match_probs[offset], -1
        if D > 0:
            return self._align_insertion(base_seq_len, offset, D)
        return self._align_deletion(base_seq_len, offset, D)

    def _align_insertion(self, base_seq_len, offset, D):
        blk_len = self.block_len
        log_probs = []
        log_prior = -int_log(blk_len + 1)
        upstream = self.upstream[0]

        log_prob = log_prior + self.ins_probs[offset, D // self.period - 1] + \
            (self.match_probs[offset + D] if base_seq_len > D else 0.0)
        best_pos = 0
        best_ll = log_prob
        log_probs.append(log_prob)

        # reversed-index helpers: C++ base_seq[idx] with idx<=0 maps to
        # self reversed arrays at offset - idx... base_seq points at read pos
        # offset (reversed); base_seq[index] for index<=0 = rev[offset - index]
        i = 0
        lim = -min(max(0, base_seq_len - D), blk_len)
        while i > lim:
            if -i + self.period < blk_len:
                um = upstream[blk_len - 1 + i]
                if um == 0:
                    idx = i - self.period
                    while idx >= i - D:
                        r = offset - idx
                        log_prob -= self._score(r, -i)
                        log_prob += self._score(r, -(i - self.period))
                        idx -= self.period
                    log_probs.append(log_prob)
                else:
                    log_probs.append(int_log(um) + log_prob)
                    i -= (um - 1)
            else:
                log_probs.append(log_prob)
            if log_prob > best_ll or (self.left_align and log_prob == best_ll):
                best_pos = 1 - i
                best_ll = log_prob
            i -= 1

        if i > -blk_len:
            log_probs.append(int_log(blk_len + i) + log_prob)
        return fast_lse(log_probs), best_pos

    def _align_deletion(self, base_seq_len, offset, D):
        blk_len = self.block_len
        log_probs = []
        upstream = self.upstream[-D // self.period - 1]
        log_prior = -int_log(blk_len + D + 1)
        log_prob = log_prior
        if offset + D >= 0:
            log_prob += self.match_probs[offset + D] - \
                self.del_probs[offset + D, -D // self.period - 1]
        else:
            for j in range(0, -base_seq_len, -1):
                r = offset - j
                log_prob += (self._lc_rev[r]
                             if self._blk_rev[-(j + D)] == self._seq_rev[r]
                             else self._lw_rev[r])
        best_pos = 0
        best_ll = log_prob
        log_probs.append(log_prob)

        i = 0
        while i > -base_seq_len:
            um = upstream[blk_len - 1 + i]
            r = offset - i
            if um == 0:
                log_prob -= (self._lc_rev[r]
                             if self._blk_rev[-(i + D)] == self._seq_rev[r]
                             else self._lw_rev[r])
                log_prob += self._score(r, -i)
                log_probs.append(log_prob)
            else:
                log_probs.append(int_log(um) + log_prob)
                i -= (um - 1)
            if log_prob > best_ll or (self.left_align and log_prob == best_ll):
                best_pos = 1 - i
                best_ll = log_prob
            i -= 1

        if -i < blk_len + D:
            log_probs.append(int_log(blk_len + D + i) + log_prob)
        return fast_lse(log_probs), best_pos

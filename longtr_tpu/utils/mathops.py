"""Log-space math helpers mirroring the reference semantics.

Reference: src/mathops.{h,cpp}.  The reference mixes exact log-sum-exp with a
"fast" variant that drops terms smaller than ``max + log(0.001)`` and uses the
Mineiro fastlog/fastexp approximations (src/mathops.cpp:87-107).  On TPU we use
exact f32/f64 math; the term-dropping threshold is preserved where the
reference's *selection* behaviour (not just precision) depends on it.
"""

from __future__ import annotations

import math

import numpy as np

LOG_ONE_HALF = math.log(0.5)
TOLERANCE = 1e-10
LOG_E_BASE_10 = 0.4342944819
# Reference: src/mathops.h:36 — fast LSE drops terms < max + log(0.001).
LOG_THRESH = math.log(0.001)
# Reference: src/mathops.cpp:17 — int_log(0) is defined as -1000.
INT_LOG_ZERO = -1000.0


def int_log(val: int) -> float:
    """log(val) with the reference's convention that int_log(0) == -1000."""
    if val <= 0:
        return INT_LOG_ZERO
    return math.log(val)


def log_sum_exp(vals) -> float:
    """Exact log-sum-exp over a 1-D array/list (reference: mathops.cpp:45-71)."""
    arr = np.asarray(vals, dtype=np.float64)
    if arr.size == 0:
        return -np.inf
    m = arr.max()
    if not np.isfinite(m):
        return float(m)
    return float(m + np.log(np.exp(arr - m).sum()))


def fast_log_sum_exp(vals) -> float:
    """Log-sum-exp that drops terms below max+LOG_THRESH.

    Mirrors mathops.cpp:98-107 (selection behaviour), computed exactly rather
    than with Mineiro float approximations.
    """
    arr = np.asarray(vals, dtype=np.float64)
    if arr.size == 0:
        return -np.inf
    m = arr.max()
    if not np.isfinite(m):
        return float(m)
    d = arr - m
    kept = d[d > LOG_THRESH]
    return float(m + np.log(np.exp(kept).sum()))


def streaming_lse_update(log_val: float, max_val: float, total: float):
    """One step of the streaming log-sum-exp (mathops.cpp:73-81)."""
    if log_val <= max_val:
        return max_val, total + math.exp(log_val - max_val)
    return log_val, total * math.exp(max_val - log_val) + 1.0


def streaming_lse_finish(max_val: float, total: float) -> float:
    return max_val + math.log(total)

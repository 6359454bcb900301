"""Thread-level parallelism coordination.

The pipeline parallelizes haplotype generation ACROSS loci (one worker
per locus window slot).  The generation internals (per-sample rescue
clustering, per-cluster POA, batched edit distances) have their own
thread pools for the serial path; running those nested inside a locus
worker oversubscribes the host 4x4x4 and thrashes.  A thread-local flag
marks locus-worker context so inner layers fall back to serial loops.
"""

from __future__ import annotations

import os
import threading

_tl = threading.local()
_lock = threading.Lock()
_active_builds = 0


def available_cores() -> int:
    """Cores this process may actually run on: the scheduling-affinity set
    (respects taskset/cgroup pinning — e.g. emulated multi-host shards),
    falling back to os.cpu_count()."""
    try:
        return len(os.sched_getaffinity(0)) or 1
    except (AttributeError, OSError):
        return os.cpu_count() or 4


def in_locus_worker() -> bool:
    return getattr(_tl, "flag", False)


def spare_workers() -> int:
    """Cores per active locus build: middle-layer pools (per-sample
    rescue) size themselves to this so one dominant locus fans out across
    idle cores, while a window of uniformly heavy loci stays one-thread-
    per-locus instead of oversubscribing."""
    with _lock:
        act = max(1, _active_builds)
    return max(1, available_cores() // act)


class locus_worker_scope:
    """Marks locus-build context; counts concurrent builds.

    ``nested=True`` re-enters the flag in a child thread without counting
    a new build (used when a build fans work to its own helper threads).
    """

    def __init__(self, nested: bool = False):
        self._nested = nested

    def __enter__(self):
        global _active_builds
        self._prev = getattr(_tl, "flag", False)
        _tl.flag = True
        if not self._nested:
            with _lock:
                _active_builds += 1
        return self

    def __exit__(self, *exc):
        global _active_builds
        _tl.flag = self._prev
        if not self._nested:
            with _lock:
                _active_builds -= 1
        return False

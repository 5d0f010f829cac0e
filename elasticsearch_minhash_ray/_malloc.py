"""glibc malloc tuning for vectorized-kernel worker processes.

numpy temporaries in the hot stages (LSH verify gathers/popcounts, signature
matrices) are a few MB each — above glibc's default 128 KB mmap threshold, so
every temporary is mmap'd on allocation and munmap'd on free. Under many
concurrent worker processes the munmaps trigger cross-CPU TLB-shootdown IPIs
that throttle ALL workers: measured on the 600k-doc bench corpus, the LSH
verify stage's summed in-worker time at 8-way concurrency dropped from 13.3 s
(default) to 7.7 s (tuned) — below even the 1-process serial total — and the
straggler max task fell 1.21 s → 0.17 s.

Raising M_MMAP_THRESHOLD keeps those temporaries on the brk heap (reused, no
munmap); raising M_TRIM_THRESHOLD stops the allocator from trimming that heap
back. Cost: worker RSS holds its high-water mark (bounded by batch size ×
arrays in flight, ~hundreds of MB per worker) — the right trade on machines
sized for data processing.

Called at package import, so every Ray worker that deserializes one of our
stage callables is tuned before the first batch. No-op off Linux/glibc.
"""

from __future__ import annotations

import sys

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_done = False


def tune_malloc(
    mmap_threshold: int = 256 * 1024 * 1024, trim_threshold: int = 256 * 1024 * 1024
) -> bool:
    """Idempotent; returns True if the thresholds were applied."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(ctypes.c_int(_M_MMAP_THRESHOLD), ctypes.c_int(mmap_threshold)) == 1
        ok &= libc.mallopt(ctypes.c_int(_M_TRIM_THRESHOLD), ctypes.c_int(trim_threshold)) == 1
        _done = bool(ok)
        return _done
    except Exception:
        return False

"""Host-memory tuning for grid-sized serving allocations.

The serving paths churn very large host buffers — 540 MB value grids at
513³ (`generate/mise.py`), 134 MB batched logit fetches, mesh vertex
arrays — far above glibc's mmap threshold, so every free munmaps and the
next allocation re-faults its pages from the OS. On the bench VM a
first-touch of a 540 MB grid in a grown process measured **3.3 s**
(recycled heap pages: 0.12 s); a full bench run's 512³ MISE host share
blew up ~10× versus the same leg run in isolation for exactly this
reason. :func:`enable_heap_reuse` tells glibc to serve and keep large
allocations on the heap (no per-allocation mmap/munmap), so grid-sized
buffers recycle warm pages across extractions. The native engines'
block pool (native/mise.cpp) does the same for C++-side buffers; this
covers the numpy side.

Trade-off: process RSS stays at its high-water mark (fine for dedicated
serving hosts; call sites are the bench and the serving/train CLIs, not
library import).
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def enable_heap_reuse(threshold_bytes: int = 1 << 30) -> bool:
    """Keep allocations below ``threshold_bytes`` on the glibc heap and
    never trim freed space back to the OS. Returns True when applied
    (glibc only; a no-op False on other libcs)."""
    try:
        libc = ctypes.CDLL(None)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes)
        return bool(ok1 and ok2)
    except Exception:
        return False

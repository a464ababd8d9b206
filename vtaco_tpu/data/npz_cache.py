"""In-memory npz read cache for the input pipeline.

Field loads re-read the same ``points.npz`` / ``pointcloud.npz`` every
epoch (the random transforms differ per access, but the on-disk arrays do
not). With a single-host CPU feeding a TPU, the decompress+read cost can
starve the device; this LRU keeps decoded arrays in RAM.

Enable via ``VTACO_NPZ_CACHE_MB`` (default 2048; 0 disables). The cache is
process-local and thread-safe.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

import numpy as np

_LOCK = threading.Lock()
_CACHE: "OrderedDict[str, dict]" = OrderedDict()
_SIZE = 0


def _limit_bytes():
    return int(os.environ.get("VTACO_NPZ_CACHE_MB", "2048")) * 1024 * 1024


def _nbytes(d):
    return sum(v.nbytes for v in d.values() if hasattr(v, "nbytes"))


def load_npz(path: str) -> dict:
    """np.load with caching; returns a dict of arrays (read-only views)."""
    limit = _limit_bytes()
    if limit <= 0:
        with np.load(path, allow_pickle=True) as z:
            return {k: z[k] for k in z.files}
    global _SIZE
    with _LOCK:
        if path in _CACHE:
            _CACHE.move_to_end(path)
            return _CACHE[path]
    with np.load(path, allow_pickle=True) as z:
        data = {k: z[k] for k in z.files}
    for v in data.values():
        if hasattr(v, "setflags"):
            v.setflags(write=False)
    with _LOCK:
        if path in _CACHE:
            # another thread loaded it while we read: keep the existing
            # entry (re-adding would double-count _SIZE, which eviction
            # only subtracts once per path)
            _CACHE.move_to_end(path)
            return _CACHE[path]
        _CACHE[path] = data
        _SIZE += _nbytes(data)
        while _SIZE > limit and len(_CACHE) > 1:
            _, old = _CACHE.popitem(last=False)
            _SIZE -= _nbytes(old)
    return data


def clear():
    global _SIZE
    with _LOCK:
        _CACHE.clear()
        _SIZE = 0

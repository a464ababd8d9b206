"""Native C++ host extensions.

Self-building: on first import the extension compiles with g++ into the
package directory (no pip/pybind11 dependency — plain C ABI + ctypes).
Delete the ``.so`` to force a rebuild. The marching-cubes tables header is
generated from vtaco_tpu.generate.mc_tables so the C++ and numpy
implementations share one source of truth.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvtaco_mc.so")
_SRC = os.path.join(_DIR, "mc.cpp")
_HDR = os.path.join(_DIR, "mc_tables.h")


def _generate_tables_header():
    from vtaco_tpu.generate.mc_tables import TRI_TABLE

    lines = [
        "// generated from vtaco_tpu/generate/mc_tables.py — do not edit",
        "#pragma once",
        "#include <cstdint>",
        "static const int16_t MC_TRI_TABLE[256][16] = {",
    ]
    for row in TRI_TABLE:
        lines.append("  {" + ", ".join(str(int(v)) for v in row) + "},")
    lines.append("};")
    with open(_HDR, "w") as f:
        f.write("\n".join(lines) + "\n")


def _build():
    _generate_tables_header()
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.vtaco_mc_run.restype = ctypes.c_void_p
    lib.vtaco_mc_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
    ]
    lib.vtaco_mc_num_verts.restype = ctypes.c_int64
    lib.vtaco_mc_num_verts.argtypes = [ctypes.c_void_p]
    lib.vtaco_mc_num_faces.restype = ctypes.c_int64
    lib.vtaco_mc_num_faces.argtypes = [ctypes.c_void_p]
    lib.vtaco_mc_copy.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vtaco_mc_free.argtypes = [ctypes.c_void_p]
    return lib


class _MC:
    """ctypes facade exposing ``marching_cubes(volume, level)``."""

    def __init__(self):
        self._lib = None

    def _ensure(self):
        if self._lib is None:
            self._lib = _load()
        return self._lib

    def marching_cubes(self, volume, level):
        import numpy as np

        lib = self._ensure()
        vol = np.ascontiguousarray(volume, np.float32)
        nx, ny, nz = vol.shape
        handle = lib.vtaco_mc_run(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(level),
        )
        try:
            nv = lib.vtaco_mc_num_verts(handle)
            nf = lib.vtaco_mc_num_faces(handle)
            verts = np.empty((nv, 3), np.float32)
            faces = np.empty((nf, 3), np.int32)
            if nv:
                lib.vtaco_mc_copy(
                    handle,
                    verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                )
        finally:
            lib.vtaco_mc_free(handle)
        return verts, faces


mc = _MC()

"""Point-cloud IO helpers (PLY export/import, OFF reader).

Counterpart of src/utils/io.py:6-45 — thin wrappers over
vtaco_tpu.utils.meshio so the reference's utility surface exists under the
same names.
"""

from __future__ import annotations

import numpy as np

from vtaco_tpu.utils import meshio


def export_pointcloud(vertices, out_file, as_text=True):
    assert vertices.shape[1] == 3
    meshio.write_ply(out_file, vertices.astype(np.float32))


def load_pointcloud(in_file):
    verts, _ = meshio.read_ply(in_file)
    return verts


def read_off(file):
    """Read an OFF file path (the reference took an open file handle)."""
    if hasattr(file, "read"):
        import os
        import tempfile

        data = file.read()
        with tempfile.NamedTemporaryFile("w", suffix=".off", delete=False) as f:
            f.write(data if isinstance(data, str) else data.decode())
            path = f.name
        try:
            return meshio.read_off(path)
        finally:
            os.unlink(path)
    return meshio.read_off(file)

"""manopth auxiliary layers vs the reference torch implementations
(anchors, per-joint axes, midpoint mesh subdivision)."""

import sys
import types

import numpy as np
import pytest

from vtaco_tpu.models.mano_aux import (
    hand_axes,
    recover_anchors,
    subdivide_topology,
    upsample_mesh,
)


def _ref_module(name):
    """Import one reference manopth module with its heavy deps stubbed."""
    torch = pytest.importorskip("torch")
    for stub in ("open3d",):
        sys.modules.setdefault(stub, types.ModuleType(stub))
    # stub the native deps src.encoder's package __init__ chain imports
    ts = types.ModuleType("torch_scatter")
    ts.scatter_mean = lambda *a, **k: None
    ts.scatter_max = lambda *a, **k: None
    sys.modules.setdefault("torch_scatter", ts)
    pykdtree = types.ModuleType("pykdtree")
    pykdtree_kdtree = types.ModuleType("pykdtree.kdtree")
    pykdtree_kdtree.KDTree = object
    pykdtree.kdtree = pykdtree_kdtree
    sys.modules.setdefault("pykdtree", pykdtree)
    sys.modules.setdefault("pykdtree.kdtree", pykdtree_kdtree)
    pybullet = types.ModuleType("pybullet")
    pybullet.computeProjectionMatrixFOV = lambda *a, **k: [0.0] * 16
    sys.modules.setdefault("pybullet", pybullet)
    # upsample_layer imports `manopth.manolayer` (the duplicate tree) only
    # for its demo main; stub it
    manopth = types.ModuleType("manopth")
    manolayer = types.ModuleType("manopth.manolayer")
    manolayer.ManoLayer = object
    manopth.manolayer = manolayer
    sys.modules.setdefault("manopth", manopth)
    sys.modules.setdefault("manopth.manolayer", manolayer)
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        return importlib.import_module(f"src.encoder.manopth.{name}")
    finally:
        sys.path.pop(0)


def test_recover_anchors_matches_reference(rng):
    torch = pytest.importorskip("torch")
    au = _ref_module("anchorutils")
    B, A = 3, 32
    verts = rng.standard_normal((B, 778, 3)).astype(np.float32)
    idx = rng.integers(0, 778, (A, 3))
    w = rng.standard_normal((A, 2)).astype(np.float32)
    ref = au.recover_anchor_batch(
        torch.from_numpy(verts),
        torch.from_numpy(idx)[None],
        torch.from_numpy(w)[None],
    ).numpy()
    ours = np.asarray(recover_anchors(verts, idx, w))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_hand_axes_match_reference(rng):
    torch = pytest.importorskip("torch")
    al = _ref_module("axislayer")
    B = 2
    joints = rng.standard_normal((B, 21, 3)).astype(np.float32)
    # random rigid transforms
    transf = np.tile(np.eye(4, dtype=np.float32), (B, 16, 1, 1))
    q = rng.standard_normal((B, 16, 3, 3)).astype(np.float32)
    u, _, vt = np.linalg.svd(q)
    transf[:, :, :3, :3] = u @ vt
    layer = al.AxisLayer()
    rb, ru, rl = layer(torch.from_numpy(joints), torch.from_numpy(transf))
    b, up, l = hand_axes(joints, transf)
    np.testing.assert_allclose(np.asarray(b), rb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(up), ru.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), rl.numpy(), atol=1e-5)


def test_upsample_matches_reference(rng):
    torch = pytest.importorskip("torch")
    ul = _ref_module("upsample_layer")
    # a small closed-ish mesh: two tetrahedra sharing a face
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2], [1, 4, 2], [2, 4, 3]],
        np.int64,
    )
    B, V = 2, 5
    verts = rng.standard_normal((B, V, 3)).astype(np.float32)
    layer = ul.UpSampleLayer()
    rv, rf = layer(
        torch.from_numpy(verts),
        torch.from_numpy(faces)[None].expand(B, -1, -1),
    )
    ov, of = upsample_mesh(verts, faces)
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(of, rf[0].numpy())
    np.testing.assert_array_equal(of, rf[1].numpy())


def test_upsample_repeated_topology():
    """Repeated subdivision quadruples faces and adds one vertex per edge;
    the MANO-case shared topology stays batch-consistent."""
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    verts = np.zeros((1, 4, 3), np.float32)
    verts[0, :, 0] = np.arange(4)
    v, f = verts, faces
    for _ in range(3):
        v, f = upsample_mesh(v, f)
    assert f.shape[0] == 2 * 4**3
    # Euler bookkeeping: each step adds E vertices
    e0 = subdivide_topology(faces, 4)[0].shape[0]
    assert e0 == 5  # edges of the two-triangle strip
    assert v.shape[1] > 4 and np.isfinite(np.asarray(v)).all()

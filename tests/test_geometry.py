"""Geometry ops vs reference formulas (numpy re-derivations, not copies)."""

import numpy as np
import pytest

from vtaco_tpu.ops import geometry as G


def test_normalize_coordinate_planes(rng):
    p = rng.uniform(-0.6, 0.6, size=(2, 10, 3)).astype(np.float32)
    for plane, (a, b) in G.PLANE_AXES.items():
        got = np.asarray(G.normalize_coordinate(p, padding=0.1, plane=plane))
        want = np.stack([p[..., a], p[..., b]], axis=-1) / (1.1 + 1e-5) + 0.5
        want = np.clip(want, 0.0, 1 - 1e-5)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_coordinate2index_bounds(rng):
    p = rng.uniform(-0.7, 0.7, size=(2, 100, 3)).astype(np.float32)
    xy = G.normalize_coordinate(p, plane="xz")
    idx = np.asarray(G.coordinate2index(xy, 32))
    assert idx.min() >= 0 and idx.max() < 32 * 32
    p3 = G.normalize_3d_coordinate(p)
    idx3 = np.asarray(G.coordinate2index(p3, 16, coord_type="3d"))
    assert idx3.min() >= 0 and idx3.max() < 16**3


def test_make_3d_grid_ordering():
    g = G.make_3d_grid((-0.5,) * 3, (0.5,) * 3, (2, 2, 2))
    assert g.shape == (8, 3)
    # last coordinate (z) varies fastest, first (x) slowest
    np.testing.assert_allclose(g[0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(g[1], [-0.5, -0.5, 0.5])
    np.testing.assert_allclose(g[4], [0.5, -0.5, -0.5])


def test_R_from_PYR_orthonormal(rng):
    r = rng.uniform(-np.pi, np.pi, size=3).astype(np.float32)
    R = np.asarray(G.R_from_PYR(r))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
    # zero rotation → identity
    np.testing.assert_allclose(
        np.asarray(G.R_from_PYR(np.zeros(3, np.float32))), np.eye(3), atol=1e-7
    )


def test_norm_pc_1(rng):
    pc_obj = rng.standard_normal((100, 3)).astype(np.float32)
    pc = rng.standard_normal((40, 3)).astype(np.float32)
    got = np.asarray(G.norm_pc_1(pc, pc_obj))
    centroid = pc_obj.mean(0)
    m = np.sqrt(((pc_obj - centroid) ** 2).sum(1)).max()
    np.testing.assert_allclose(got, (pc - centroid) / (2 * m), atol=1e-5)
    # normalized object cloud fits in radius 0.5
    obj_n = np.asarray(G.norm_pc_1(pc_obj, pc_obj))
    assert np.sqrt((obj_n**2).sum(1)).max() <= 0.5 + 1e-6


def test_pc_cam_to_world_invertible(rng):
    rot = rng.uniform(-np.pi, np.pi, size=3).astype(np.float32)
    trans = rng.standard_normal(3).astype(np.float32)
    pc = rng.standard_normal((20, 3)).astype(np.float32)
    out = np.asarray(G.pc_cam_to_world(pc, rot, trans))
    # out = R_inv @ pc + T  →  recover pc
    # rebuild R the same way to check self-consistency
    out0 = np.asarray(G.pc_cam_to_world(np.zeros((1, 3), np.float32), rot, trans))
    np.testing.assert_allclose(out0[0], trans, atol=1e-5)
    # distances preserved (rigid transform)
    d_in = np.linalg.norm(pc[0] - pc[1])
    d_out = np.linalg.norm(out[0] - out[1])
    assert d_out == pytest.approx(d_in, rel=1e-5)


def test_batch_rodrigues_vs_scipy(rng):
    from scipy.spatial.transform import Rotation

    v = rng.standard_normal((8, 3)).astype(np.float64)
    got = np.asarray(G.batch_rodrigues(v))
    want = Rotation.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axisang_to_euler_vs_scipy(rng):
    from scipy.spatial.transform import Rotation

    v = rng.standard_normal(3) * 0.8
    got = np.asarray(G.axisang_to_euler_xyz(v.astype(np.float32)))
    want = Rotation.from_rotvec(v).as_euler("XYZ")
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rot6d(rng):
    x = rng.standard_normal((4, 6)).astype(np.float32)
    R = np.asarray(G.rot6d_to_rotmat(x))
    for i in range(4):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)


def test_camera_backprojection():
    cam = G.Camera(width=240, height=320, near_plane=0.019, far_plane=0.022, fov=60)
    depth = np.full((320, 240), 0.020, np.float32)
    cloud = np.asarray(cam.depth_to_camera_pointcloud(depth))
    assert cloud.shape == (320 * 240, 3)
    # frame is (z, -x, -y): first channel is depth
    np.testing.assert_allclose(cloud[:, 0], 0.020, atol=1e-6)
    assert np.asarray(cam.valid_mask(cloud)).all()
    far = np.asarray(cam.depth_to_camera_pointcloud(np.full((320, 240), 0.022)))
    assert not np.asarray(cam.valid_mask(far)).any()

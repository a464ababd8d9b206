"""Native C++ geometry extension vs reference implementations (CPU)."""

import numpy as np
import pytest

from vtaco_tpu.utils import meshio

geom = pytest.importorskip("vtaco_tpu.native").geom


def test_kdtree_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2000, 3)).astype(np.float32)
    q = rng.standard_normal((500, 3)).astype(np.float32)
    d2, idx = geom.nearest(pts, q)
    d_ref, i_ref = cKDTree(pts).query(q)
    np.testing.assert_allclose(np.sqrt(d2), d_ref, rtol=1e-5, atol=1e-6)
    # indices may differ only on exact ties; distances decide
    np.testing.assert_allclose(
        np.linalg.norm(pts[idx] - q, axis=1), d_ref, rtol=1e-5, atol=1e-6
    )


def test_winding_matches_device_impl():
    import jax.numpy as jnp

    from vtaco_tpu.ops.winding import winding_number, winding_number_host

    verts, faces = meshio.icosphere(2, radius=0.3)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.5, 0.5, (256, 3)).astype(np.float32)
    w_host = winding_number_host(verts, faces, pts)
    w_dev = np.asarray(winding_number(jnp.asarray(verts), jnp.asarray(faces),
                                      jnp.asarray(pts)))
    np.testing.assert_allclose(w_host, w_dev, atol=2e-4)
    inside = np.linalg.norm(pts, axis=1) < 0.29
    outside = np.linalg.norm(pts, axis=1) > 0.31
    assert np.all(w_host[inside] > 0.5) and np.all(w_host[outside] < 0.5)


def test_mesh_reader_matches_python(tmp_path):
    verts, faces = meshio.icosphere(1, radius=0.7)
    for ext, writer in ((".off", meshio.write_off), (".obj", meshio.write_obj)):
        path = str(tmp_path / f"m{ext}")
        writer(path, verts, faces)
        v_n, f_n = geom.read_triangle_mesh(path)
        v_p, f_p = (meshio.read_off if ext == ".off" else meshio.read_obj)(path)
        np.testing.assert_allclose(v_n, v_p, atol=1e-6)
        np.testing.assert_array_equal(f_n, f_p)
        # the dispatcher takes the native path too
        v_d, f_d = meshio.read_triangle_mesh(path)
        np.testing.assert_allclose(v_d, v_n, atol=1e-6)


def test_off_body_comments_and_bad_faces(tmp_path):
    """Comments are legal anywhere in an OFF body (igl accepts them); a
    desynced/malformed face index must not read out of bounds in the
    winding kernel (skipped faces contribute zero solid angle)."""
    path = str(tmp_path / "c.off")
    with open(path, "w") as f:
        f.write("OFF\n# header comment\n4 2 0\n"
                "# comment inside the vertex block\n"
                "0 0 0\n1 0 0\n# another\n0 1 0\n0 0 1\n"
                "# comment inside the face block\n"
                "3 0 1 2\n3 0 2 3\n")
    v, fc = geom.read_triangle_mesh(path)
    np.testing.assert_allclose(
        v, [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], atol=0)
    np.testing.assert_array_equal(fc, [[0, 1, 2], [0, 2, 3]])

    # out-of-range face ids are skipped, not dereferenced
    bad = np.array([[0, 1, 99], [0, -1, 2]], np.int32)
    w = geom.winding_number(v, bad, np.zeros((3, 3), np.float32))
    assert np.allclose(w, 0.0)


def test_chamfer_kdtree_native_path():
    from vtaco_tpu.ops.metrics import chamfer_distance, chamfer_distance_kdtree

    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 2048, 3)).astype(np.float32)
    b = rng.standard_normal((1, 2048, 3)).astype(np.float32)
    cd_tree = chamfer_distance_kdtree(a, b)
    cd_brute = np.asarray(chamfer_distance(a, b))
    np.testing.assert_allclose(cd_tree, cd_brute, rtol=1e-4)

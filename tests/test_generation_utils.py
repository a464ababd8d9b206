"""Dense decode, MISE refinement, voxel utils, ICP, crop fields."""

import jax
import jax.numpy as jnp
import numpy as np

from vtaco_tpu.utils import meshio


def test_dense_decode_matches_gather(rng):
    from vtaco_tpu.models.decoder import LocalDecoder
    from vtaco_tpu.ops.dense_decode import dense_feature_volume, dense_query_grid
    from vtaco_tpu.ops.geometry import make_3d_grid

    nx, R, C = 12, 6, 4
    box, pad = 1.1, 0.1
    c_planes = {
        "grid": jnp.asarray(rng.standard_normal((1, R, R, R, C)), jnp.float32),
        "yz": jnp.asarray(rng.standard_normal((1, R, R, C)), jnp.float32),
    }
    dec = LocalDecoder(c_dim=C, hidden_size=8, n_blocks=2)
    pts_ref = box * make_3d_grid((-0.5,) * 3, (0.5,) * 3, (nx,) * 3)
    pts_dense = dense_query_grid(nx, box)
    np.testing.assert_allclose(pts_ref, pts_dense, atol=1e-6)

    p = jnp.asarray(pts_ref[None])

    def allp(d):
        d(p, c_planes)
        d.forward_feats(p[0], jnp.zeros((p.shape[1], C)))

    v = dec.init(jax.random.PRNGKey(0), method=allp)
    ref = np.asarray(dec.apply(v, p, c_planes))[0]
    feats = dense_feature_volume(c_planes, nx, box, pad)
    fast = np.asarray(
        dec.apply(v, jnp.asarray(pts_dense), feats,
                  method=lambda m, pp, f: m.forward_feats(pp, f))
    )
    np.testing.assert_allclose(fast, ref, atol=1e-4)


def test_mise_extractor_refines_boundary():
    from vtaco_tpu.generate.mise import MultiGridExtractor

    # sphere occupancy on a coarse grid, refined twice
    mg = MultiGridExtractor(8, 0.5, invert=False)

    def occ_at(pts_int, reso):
        coords = pts_int / reso - 0.5
        return (np.linalg.norm(coords, axis=1) < 0.35).astype(np.float32)

    pts = mg.query()
    assert len(pts) == 9**3  # everything unknown at level 0
    mg.update(pts, occ_at(pts, 8))
    total = 9**3
    for _ in range(2):
        mg.increase_resolution()
        pts = mg.query()
        # only boundary-adjacent corners needed — far fewer than dense
        assert 0 < len(pts) < (mg.resolution + 1) ** 3 * 0.6
        mg.update(pts, occ_at(pts, mg.resolution))
        total += len(pts)
    assert mg.resolution == 32
    assert total < 33**3 * 0.4  # large saving vs dense evaluation
    # final occupancy field matches the analytic sphere on known values
    known = np.where(mg.value_known)
    coords = np.stack(known, -1) / mg.resolution - 0.5
    want = np.linalg.norm(coords, axis=1) < 0.35
    got = mg.values[known] >= 0.5
    assert (got == want).mean() > 0.999


def test_mise_native_matches_numpy():
    """The C++ bookkeeping engine (native/mise.cpp) replays the numpy
    protocol bit-exactly: same queries (order included), same values,
    same known mask, at every level."""
    import pytest

    from vtaco_tpu.generate.mise import (
        MultiGridExtractorNumpy,
    )

    try:
        from vtaco_tpu.generate.mise import MultiGridExtractorNative

        nat = MultiGridExtractorNative(8, 0.1, invert=False)
    except Exception:
        pytest.skip("native mise engine unavailable (no g++)")

    ref = MultiGridExtractorNumpy(8, 0.1, invert=False)
    r = np.random.default_rng(3)

    def field(pts, reso):
        coords = pts / reso - 0.5
        base = 0.38 - np.linalg.norm(coords, axis=1)
        noise = r.standard_normal(len(pts)) * 0.01
        return (base + noise).astype(np.float32)

    for step in range(3):
        if step:
            ref.increase_resolution()
            nat.increase_resolution()
            assert nat.resolution == ref.resolution
        p_ref = ref.query()
        p_nat = nat.query()
        np.testing.assert_array_equal(p_nat, p_ref)
        vals = field(p_ref, ref.resolution)
        ref.update(p_ref, vals)
        nat.update(p_nat, vals)
        np.testing.assert_array_equal(nat.value_known, ref.value_known)
        known = ref.value_known
        np.testing.assert_array_equal(
            nat.values[known], ref.values[known].astype(np.float32)
        )
    # update_queried (query-order values, no points re-pass) equals update
    nat2 = MultiGridExtractorNative(8, 0.1, invert=False)
    r = np.random.default_rng(3)
    for step in range(3):
        if step:
            nat2.increase_resolution()
        pts = nat2.query()
        nat2.update_queried(field(pts, nat2.resolution))
    np.testing.assert_array_equal(nat2.values, nat.values)
    np.testing.assert_array_equal(nat2.value_known, nat.value_known)
    # query_cn: channels-first int16 layout, last-point padding
    nat3 = MultiGridExtractorNative(4, 0.0, invert=False)
    pts = nat3.query()
    cn, n = nat3.query_cn(len(pts) + 5)
    assert n == len(pts)
    np.testing.assert_array_equal(cn[:, :n].T, pts.astype(np.int16))
    np.testing.assert_array_equal(
        cn[:, n:], np.repeat(cn[:, n - 1 : n], 5, axis=1)
    )


def test_voxelgrid_roundtrip(rng):
    from vtaco_tpu.utils.voxels import (
        VoxelGrid,
        check_voxel_boundary,
        check_voxel_occupied,
        check_voxel_unoccupied,
    )

    verts, faces = meshio.icosphere(2, radius=0.3)
    vg = VoxelGrid.from_mesh(verts, faces, 24, loc=(0, 0, 0), scale=1.0)
    # voxelized volume ≈ sphere volume
    vol = vg.data.mean()
    want = 4 / 3 * np.pi * 0.3**3
    assert abs(vol - want) / want < 0.15
    # containment agrees with the analytic sphere away from the surface
    pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    clear = np.abs(np.linalg.norm(pts, axis=1) - 0.3) > 0.06
    got = vg.contains(pts)[clear]
    want_in = (np.linalg.norm(pts, axis=1) < 0.3)[clear]
    assert (got == want_in).mean() > 0.97
    # cube mesh is watertight
    mv, mf = vg.to_mesh()
    e = np.sort(np.concatenate([mf[:, [0, 1]], mf[:, [1, 2]], mf[:, [2, 0]]]), 1)
    _, c = np.unique(e, axis=0, return_counts=True)
    assert (c == 2).all()
    occ = vg.data
    assert check_voxel_occupied(occ).shape == (23, 23, 23)
    assert (
        check_voxel_occupied(occ) | check_voxel_unoccupied(occ)
        | check_voxel_boundary(occ)
    ).all()


def test_icp_recovers_rigid_transform(rng):
    from vtaco_tpu.utils.icp import icp

    from scipy.spatial.transform import Rotation

    A = rng.standard_normal((200, 3))
    R = Rotation.from_rotvec([0.05, -0.1, 0.08]).as_matrix()
    t = np.array([0.02, -0.03, 0.01])
    B = A @ R.T + t
    T, dists, its = icp(A, B, max_iterations=50, tolerance=1e-9)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)


def test_patch_fields(tmp_path, rng):
    from vtaco_tpu.data.fields import PatchPointCloudField, PatchPointsField

    # build a model dir with points/pointcloud npz
    mdir = tmp_path / "cat" / "model_0000"
    mdir.mkdir(parents=True)
    pts = rng.uniform(-0.5, 0.5, (1000, 3)).astype(np.float32)
    np.savez(mdir / "points.npz", points=pts,
             occupancies=(rng.random(1000) > 0.5).astype(np.float32))
    np.savez(mdir / "pointcloud.npz", points=pts,
             normals=np.ones_like(pts))

    vol = {
        "plane_type": ["xz", "grid"],
        "reso": 8,
        "input_vol": [np.full(3, -0.4, np.float32), np.full(3, 0.4, np.float32)],
        "query_vol": [np.full(3, -0.3, np.float32), np.full(3, 0.3, np.float32)],
    }
    pf = PatchPointsField("points.npz")
    d = pf.load(str(mdir), 0, vol)
    assert (np.abs(d[None]) <= 0.3 + 1e-6).all()
    assert set(d["normalized"].keys()) == {"xz", "grid"}
    assert d["normalized"]["xz"].shape[1] == 2
    assert d["normalized"]["grid"].shape[1] == 3

    pcf = PatchPointCloudField("pointcloud.npz")
    d2 = pcf.load(str(mdir), 0, vol)
    outside = d2["mask"]
    assert outside.any() and (~outside).any()
    # masked points map to the overflow cell
    assert (d2["ind"]["grid"][0, outside] == 8**3).all()
    assert (d2["ind"]["xz"][0, outside] == 8**2).all()
    assert d2["ind"]["grid"][0, ~outside].max() < 8**3


def test_crop_model_pipeline(rng):
    """PatchLocalPoolPointnet + PatchLocalDecoder consume the crop field
    outputs end-to-end."""
    from vtaco_tpu.models.decoder import PatchLocalDecoder
    from vtaco_tpu.models.pointnet import PatchLocalPoolPointnet

    B, N, reso = 1, 64, 4
    pts = jnp.asarray(rng.uniform(0, 1, (B, N, 3)), jnp.float32)
    idx = {
        "xz": jnp.asarray(rng.integers(0, reso**2 + 1, (B, N)), jnp.int32),
    }
    enc = PatchLocalPoolPointnet(
        c_dim=4, hidden_dim=4, plane_type=["xz"], plane_resolution=reso,
        n_blocks=2,
    )
    v = enc.init(jax.random.PRNGKey(0), {"points": pts, "index": idx},
                 train=False)
    fea = enc.apply(v, {"points": pts, "index": idx}, train=False)
    assert fea["xz"].shape == (B, reso, reso, 4)

    dec = PatchLocalDecoder(c_dim=4, hidden_size=8, n_blocks=2)
    p = {
        "p": jnp.asarray(rng.uniform(-0.5, 0.5, (B, 16, 3)), jnp.float32),
        "p_n": {"xz": jnp.asarray(rng.uniform(0, 1, (B, 16, 2)), jnp.float32)},
    }
    vd = dec.init(jax.random.PRNGKey(0), p, fea)
    out = dec.apply(vd, p, fea)
    assert out.shape == (B, 16)


def test_heap_reuse_applies():
    """glibc accepts the serving hosts' large-allocation heap-reuse
    mallopt (utils/host.py); non-glibc returns False instead of raising."""
    from vtaco_tpu.utils.host import enable_heap_reuse

    assert enable_heap_reuse() in (True, False)

"""Winding-number labels, metrics, and mesh IO."""

import numpy as np
import jax.numpy as jnp

from vtaco_tpu.ops import metrics
from vtaco_tpu.ops.winding import MeshBank, winding_number, winding_number_batch
from vtaco_tpu.utils import meshio


def test_winding_sphere_labels(rng):
    verts, faces = meshio.icosphere(2, radius=0.3)
    pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    w = np.asarray(winding_number(jnp.asarray(verts), jnp.asarray(faces),
                                  jnp.asarray(pts), face_chunk=512))
    inside = np.linalg.norm(pts, axis=1) < 0.29
    outside = np.linalg.norm(pts, axis=1) > 0.31
    assert np.allclose(w[inside], 1.0, atol=1e-3)
    assert np.allclose(w[outside], 0.0, atol=1e-3)


def test_winding_meshbank_padded_batch(rng):
    sv, sf = meshio.icosphere(1, radius=0.25)
    bv, bf = meshio.box((0.4, 0.3, 0.5))
    bank = MeshBank({"sph": (sv, sf), "box": (bv, bf)})
    ids = bank.ids_for(["box", "sph"])
    V, F = bank.gather(jnp.asarray(ids))
    assert V.shape[0] == 2 and F.shape[1] == max(len(sf), len(bf))
    pts = rng.uniform(-0.5, 0.5, (2, 300, 3)).astype(np.float32)
    w = np.asarray(winding_number_batch(V, F, jnp.asarray(pts), face_chunk=128))
    box_inside = (np.abs(pts[0]) <= np.array([0.2, 0.15, 0.25])).all(-1)
    assert ((w[0] > 0.5) == box_inside).mean() > 0.99


def test_winding_matmul_matches_reference_form(rng):
    """The MXU (dot-product expansion) solid-angle formulation must agree
    with the direct point-to-vertex broadcast form and stay label-accurate
    against geometry, including with (0,0,0) padding faces."""
    from vtaco_tpu.ops.winding import _solid_angles, _solid_angles_matmul

    verts, faces = meshio.icosphere(2, radius=0.3)
    tri = jnp.asarray(verts)[jnp.asarray(faces)]
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32))
    ref = np.asarray(_solid_angles(tri, pts))
    fast = np.asarray(_solid_angles_matmul(tri, pts))
    np.testing.assert_allclose(fast, ref, atol=2e-4)
    # padding faces (all-zero index -> degenerate triangle) contribute 0
    pad_tri = jnp.broadcast_to(jnp.asarray(verts)[0], (4, 3, 3))
    assert np.allclose(np.asarray(_solid_angles_matmul(pad_tri, pts)), 0.0,
                       atol=1e-6)


def test_compute_iou_legacy_quirk(rng):
    occ_gt = (rng.random((1, 100)) > 0.7).astype(np.float32)
    logits = rng.standard_normal((1, 100)).astype(np.float32)
    # legacy: both sides thresholded at mean(occ2); threshold arg ignored
    got = float(np.asarray(metrics.compute_iou(occ_gt, logits, threshold=0.5))[0])
    thr = logits.mean()
    b1, b2 = occ_gt >= thr, logits >= thr
    want = (b1 & b2).sum() / (b1 | b2).sum()
    assert abs(got - want) < 1e-6
    # corrected variant honors the fixed threshold
    got2 = float(
        np.asarray(
            metrics.compute_iou(occ_gt, logits, 0.5, legacy_mean_threshold=False)
        )[0]
    )
    b1, b2 = occ_gt >= 0.5, logits >= 0.5
    assert abs(got2 - (b1 & b2).sum() / (b1 | b2).sum()) < 1e-6

    # trained-model degeneracy (why eval also logs iou_fixed): every loss
    # path L1-regresses the decoder output to occupancy VALUES, so a
    # well-trained field sits near 0 in empty space and near 1 inside.
    # Over a mostly-empty query set mean(prediction) ≈ the positive
    # fraction — a threshold deep inside the empty-space noise, so the
    # quirk metric classifies half the noise as occupied. The value-space
    # fixed threshold (0.5, what eval's iou_fixed uses) reads the perfect
    # agreement.
    occ = np.zeros((1, 1000), np.float32)
    occ[0, :30] = 1.0
    vals = occ + rng.normal(0, 0.05, occ.shape).astype(np.float32)
    quirk = float(np.asarray(metrics.compute_iou(occ, vals, 0.5))[0])
    fixed = float(np.asarray(metrics.compute_iou(
        occ, (vals >= 0.5).astype(np.float32), 0.5,
        legacy_mean_threshold=False))[0])
    assert fixed > 0.99
    assert quirk < 0.2  # collapses despite the perfect reconstruction


def test_chamfer_and_emd(rng):
    a = rng.standard_normal((1, 64, 3)).astype(np.float32)
    # identical clouds → zero distance
    assert float(np.asarray(metrics.chamfer_distance(a, a))[0]) < 1e-9
    assert metrics.earth_mover_distance(a[0], a[0]) < 1e-9
    b = a + 0.1
    cd = float(np.asarray(metrics.chamfer_distance(a, b))[0])
    assert cd > 0
    # kdtree host variant agrees with brute force
    cdk = metrics.chamfer_distance(a, b, use_kdtree=True)[0]
    assert abs(cd - cdk) < 1e-4


def test_meshio_roundtrip(tmp_path, rng):
    verts, faces = meshio.icosphere(1, radius=0.5)
    for ext in ("off", "obj", "ply"):
        p = str(tmp_path / f"m.{ext}")
        meshio.write_triangle_mesh(p, verts, faces)
        v2, f2 = meshio.read_triangle_mesh(p)
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)


def test_binvox_roundtrip(tmp_path, rng):
    from vtaco_tpu.data import binvox_rw

    data = rng.random((8, 8, 8)) > 0.5
    vox = binvox_rw.Voxels(data, [8, 8, 8], [0, 0, 0], 1.0, "xyz")
    p = tmp_path / "m.binvox"
    with open(p, "wb") as f:
        binvox_rw.write(vox, f)
    with open(p, "rb") as f:
        back = binvox_rw.read_as_3d_array(f)
    np.testing.assert_array_equal(back.data, data)


def test_synthetic_dataset_pipeline(tmp_path):
    from vtaco_tpu.core.config import get_dataset, load_config
    from vtaco_tpu.data import BatchLoader
    from vtaco_tpu.data.synthetic import generate

    root, mesh_root = generate(
        str(tmp_path), n_models=4, n_query=500, n_surface=800,
        img_h=16, img_w=12, seed=3,
    )
    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    cfg["data"]["path"] = root
    cfg["data"]["points_subsample"] = 256
    cfg["data"]["pointcloud_n"] = 128
    ds = get_dataset("train", cfg)
    assert len(ds) == 2
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=2, seed=0)))
    assert batch["points"].shape == (2, 256, 3)
    assert batch["points.occ"].shape == (2, 256)
    assert batch["inputs"].shape == (2, 128, 3)
    assert batch["inputs.img"].shape == (2, 5, 16, 12, 3)
    assert batch["inputs.depth"].shape == (2, 5, 16 * 12)
    assert batch["inputs.touch_success"].shape == (2, 5)
    assert batch["points.mano"].shape == (2, 51)
    assert batch["points.pc_hand"].shape == (2, 778, 3)
    assert len(batch["points.name"]) == 2
    # legacy double-/255 scaling leaves images in [0, 1/255]
    assert batch["inputs.img"].max() <= 1 / 255 + 1e-6
    # GT meshes exist for every model name
    import os
    for name in batch["points.name"]:
        assert os.path.exists(os.path.join(mesh_root, "mesh_obj", name + ".off"))


def test_loader_surfaces_producer_errors(tmp_path):
    """A crashing dataset must raise in the consumer, not hang the loader."""
    import pytest

    from vtaco_tpu.data import BatchLoader

    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = BatchLoader(Boom(), batch_size=2, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader))

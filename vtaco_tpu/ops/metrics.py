"""Evaluation metrics.

Counterparts of src/common.py:11-175 (IoU with the reference's
mean-threshold behavior, brute-force and KD-tree chamfer distance,
Hungarian earth-mover distance, hand joint error). Device-side metrics are
pure JAX; the Hungarian assignment and KD-tree run on host (scipy), exactly
where the reference kept them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_iou(occ1, occ2, threshold=0.5, legacy_mean_threshold=True):
    """IoU between two occupancy sets.

    ``legacy_mean_threshold=True`` reproduces the reference's quirk
    (src/common.py:33-35): BOTH sides are binarized at ``mean(occ2)`` and
    the ``threshold`` argument is ignored. Pass False for the conventional
    fixed-threshold IoU.
    """
    occ1 = jnp.asarray(occ1)
    occ2 = jnp.asarray(occ2)
    if occ1.ndim >= 2:
        occ1 = occ1.reshape(occ1.shape[0], -1)
    if occ2.ndim >= 2:
        occ2 = occ2.reshape(occ2.shape[0], -1)
    thr = jnp.mean(occ2) if legacy_mean_threshold else threshold
    b1 = occ1 >= thr
    b2 = occ2 >= thr
    union = jnp.sum(b1 | b2, axis=-1).astype(jnp.float32)
    inter = jnp.sum(b1 & b2, axis=-1).astype(jnp.float32)
    return inter / union


def chamfer_distance(points1, points2, use_kdtree=False, give_id=False):
    """Symmetric squared chamfer distance, (B, T, 3) each → (B,).

    Matches chamfer_distance_naive (src/common.py:69-91) including the
    truncation of points1 when points2 has fewer than 2048 points. The
    brute-force pairwise distance runs on device (the shipped pipeline
    calls use_kdtree=False; a host KD-tree variant is provided for parity).
    """
    if use_kdtree:
        return chamfer_distance_kdtree(points1, points2, give_id=give_id)
    points1 = jnp.asarray(points1)
    points2 = jnp.asarray(points2)
    if points2.shape[1] < 2048:
        points1 = points1[:, : points2.shape[1], :]
    d = jnp.sum(
        (points1[:, :, None, :] - points2[:, None, :, :]) ** 2, axis=-1
    )  # (B, T, T)
    chamfer1 = jnp.min(d, axis=1).mean(axis=1)
    chamfer2 = jnp.min(d, axis=2).mean(axis=1)
    return chamfer1 + chamfer2


def _nearest_host(points, queries):
    """(M,) squared NN distances + indices of queries in points — the C++
    KD-tree (native/geom.cpp, replacing pykdtree) with scipy fallback."""
    try:
        from vtaco_tpu.native import geom

        return geom.nearest(points, queries)
    except Exception:
        from scipy.spatial import cKDTree

        d, i = cKDTree(points).query(queries)
        return d**2, i


def chamfer_distance_kdtree(points1, points2, give_id=False):
    """Host KD-tree chamfer (C++ KD-tree replaces the reference's
    pykdtree, src/common.py:94-140)."""
    p1 = np.asarray(points1)
    p2 = np.asarray(points2)
    B = p1.shape[0]
    c1 = np.zeros(B)
    c2 = np.zeros(B)
    idx12, idx21 = [], []
    for b in range(B):
        d12, i12 = _nearest_host(p2[b], p1[b])
        d21, i21 = _nearest_host(p1[b], p2[b])
        c1[b] = np.mean(d12)
        c2[b] = np.mean(d21)
        idx12.append(i12)
        idx21.append(i21)
    chamfer = c1 + c2
    if give_id:
        return c1, c2, np.stack(idx12), np.stack(idx21)
    return chamfer


def earth_mover_distance(points1, points2):
    """Hungarian-assignment EMD (host). Matches src/common.py:45-51."""
    from scipy.optimize import linear_sum_assignment
    from scipy.spatial import distance

    d = distance.cdist(np.asarray(points1), np.asarray(points2))
    assignment = linear_sum_assignment(d)
    return d[assignment].sum() / len(d)


# reference-name alias (src/common.py:45)
EarthMoverDistance = earth_mover_distance


def hand_joint_error(joints_gt, joints_pred):
    """Mean per-joint L2 error. Matches src/common.py:142-154."""
    j_gt = np.asarray(joints_gt).squeeze()
    j_pred = np.asarray(joints_pred).squeeze()
    return float(np.mean(np.linalg.norm(j_gt - j_pred, axis=1)))

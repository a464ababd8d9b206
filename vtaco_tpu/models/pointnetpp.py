"""PointNet++ encoder (registry key ``pointnet_plus_plus``).

Counterpart of src/encoder/pointnetpp.py:10-294 (three set-abstraction
levels, three feature-propagation levels → per-point c_dim features).

TPU-first differences:
  * Farthest-point sampling is a jittable ``lax.scan`` (the reference's
    python loop over npoint, pointnetpp.py:188-209, same greedy rule,
    deterministic first pick instead of randint).
  * Ball query keeps the reference's sort-based capping semantics
    (pointnetpp.py:212-232): indices beyond the radius fall back to the
    nearest in-ball point.
  * Channel-last throughout; pointwise convs are Dense layers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def square_distance(src, dst):
    """(B, N, C) x (B, M, C) → (B, N, M) squared distances.
    pointnetpp.py:144-165."""
    d = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
    d += jnp.sum(src**2, -1)[:, :, None]
    d += jnp.sum(dst**2, -1)[:, None, :]
    return d


def index_points(points, idx):
    """Gather (B, N, C) at (B, ...) indices → (B, ..., C).
    pointnetpp.py:168-185."""
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(idx.shape + (points.shape[-1],))


def farthest_point_sample(xyz, npoint: int):
    """Greedy FPS as a scan; starts from point 0. pointnetpp.py:188-209."""
    B, N, _ = xyz.shape
    init_dist = jnp.full((B, N), 1e10)
    init_far = jnp.zeros((B,), jnp.int32)

    def step(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, -1)
        distance = jnp.minimum(distance, d)
        nxt = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return (distance, nxt), farthest

    (_, _), centroids = jax.lax.scan(step, (init_dist, init_far), None, length=npoint)
    return centroids.T  # (B, npoint)


def query_ball_point(radius, nsample, xyz, new_xyz):
    """Indices of ≤nsample in-ball neighbors, padded with the nearest one.
    pointnetpp.py:212-232."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)
    ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    ids = jnp.where(sqrdists > radius**2, N, ids)
    group_idx = jnp.sort(ids, axis=-1)[:, :, :nsample]
    first = group_idx[:, :, :1]
    return jnp.where(group_idx == N, first, group_idx)


class SetAbstraction(nn.Module):
    """FPS + ball grouping + shared MLP + max pool. pointnetpp.py:10-51."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, points, train: bool = True):
        B, N, _ = xyz.shape
        if self.group_all:
            new_xyz = jnp.zeros((B, 1, 3))
            grouped = xyz[:, None]
            if points is not None:
                grouped = jnp.concatenate([grouped, points[:, None]], axis=-1)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = index_points(xyz, fps_idx)
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            grouped = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate([grouped, index_points(points, idx)], -1)
        x = grouped
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, name=f"mlp{i}")(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x))
        return new_xyz, jnp.max(x, axis=2)


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN interpolation + pointwise MLP.
    pointnetpp.py:53-103."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = True):
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            dists = square_distance(xyz1, xyz2)
            k = min(3, S)
            neg_d, idx = jax.lax.top_k(-dists, k)
            d = jnp.maximum(-neg_d, 0.0)
            recip = 1.0 / (d + 1e-8)
            weight = recip / jnp.sum(recip, axis=2, keepdims=True)
            interpolated = jnp.sum(
                index_points(points2, idx) * weight[..., None], axis=2
            )
        x = interpolated
        if points1 is not None:
            x = jnp.concatenate([points1, interpolated], axis=-1)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, name=f"mlp{i}")(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x))
        return x


class PointNetPlusPlus(nn.Module):
    """Full PN++ stack (pointnetpp.py:105-129): returns (xyz, per-point
    c_dim features)."""

    dim: Optional[int] = None
    c_dim: int = 128
    padding: float = 0.1

    @nn.compact
    def __call__(self, xyz, train: bool = True):
        l0_points = xyz
        l0_xyz = xyz[..., :3]
        l1_xyz, l1_points = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                           name="sa1")(l0_xyz, l0_points, train)
        l2_xyz, l2_points = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                           name="sa2")(l1_xyz, l1_points, train)
        l3_xyz, l3_points = SetAbstraction(None, None, None, (256, 512, 1024),
                                           group_all=True, name="sa3")(
            l2_xyz, l2_points, train
        )
        l2_points = FeaturePropagation((256, 256), name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train
        )
        l1_points = FeaturePropagation((256, 128), name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train
        )
        l0_points = FeaturePropagation((128, 128, self.c_dim), name="fp1")(
            l0_xyz, l1_xyz, None, l1_points, train
        )
        return xyz, l0_points

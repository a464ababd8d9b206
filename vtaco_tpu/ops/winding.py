"""On-device winding numbers: occupancy labels computed inside the jitted
train/eval step.

The reference computes occupancy labels for freshly sampled query points by
calling libigl's C++ ``fast_winding_number_for_meshes`` on the host in the
middle of every training step (src/conv_onet/training.py:723,862 — a
device→host→device round-trip per batch). Here the winding number is the
exact triangle solid-angle sum (van Oosterom & Strackee), evaluated as a
batched einsum on the TPU — no host round-trip, differentiable, and
vectorizable over the batch.

Meshes are passed as fixed-shape padded arrays so the op stays jittable:
pad faces with (0, 0, 0) index triples (degenerate triangles contribute a
zero solid angle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _solid_angles(tri, points):
    """Solid angle of each triangle seen from each point (reference form).

    tri:    (F, 3, 3) triangle vertex positions.
    points: (P, 3) query points.
    Returns (P, F) signed solid angles.

    Kept as the numpy-obvious oracle for the matmul formulation below
    (tests check them against each other).
    """
    # vectors from query points to triangle vertices: (P, F, 3, 3)
    r = tri[None] - points[:, None, None, :]
    a, b, c = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    det = jnp.einsum("pfi,pfi->pf", a, jnp.cross(b, c))
    denom = (
        la * lb * lc
        + jnp.einsum("pfi,pfi->pf", a, b) * lc
        + jnp.einsum("pfi,pfi->pf", b, c) * la
        + jnp.einsum("pfi,pfi->pf", c, a) * lb
    )
    return 2.0 * jnp.arctan2(det, denom)


def _solid_angles_matmul(tri, points):
    """MXU formulation of the van Oosterom–Strackee solid angle.

    Every point-dependent quantity in the formula is affine in dot
    products of the query point with per-face constants:

      a·b   = A·B − p·A − p·B + |p|²          (a = A − p, …)
      |a|²  = |A|² − 2 p·A + |p|²
      det   = a·(b×c) = A·(B×C) − p·N,  N = B×C + C×A + A×B
              (signed-tetra-volume identity)

    so the (P, F) interaction reduces to ONE (P, 3) @ (3, 4F) matmul
    (p·A, p·B, p·C, p·N) plus per-face constants and elementwise math —
    instead of materializing (P, F, 3, 3) point-to-vertex difference
    tensors. On TPU the pairwise term rides the MXU and the memory
    traffic per chunk drops ~9×.
    """
    A, B, C = tri[:, 0], tri[:, 1], tri[:, 2]            # (F, 3)
    N = (jnp.cross(B, C) + jnp.cross(C, A) + jnp.cross(A, B))
    hi = jax.lax.Precision.HIGHEST
    det0 = jnp.einsum("fi,fi->f", A, jnp.cross(B, C), precision=hi)
    dAB = jnp.einsum("fi,fi->f", A, B, precision=hi)
    dBC = jnp.einsum("fi,fi->f", B, C, precision=hi)
    dCA = jnp.einsum("fi,fi->f", C, A, precision=hi)
    nA2 = jnp.einsum("fi,fi->f", A, A, precision=hi)
    nB2 = jnp.einsum("fi,fi->f", B, B, precision=hi)
    nC2 = jnp.einsum("fi,fi->f", C, C, precision=hi)

    F = tri.shape[0]
    W = jnp.stack([A, B, C, N], axis=1).reshape(4 * F, 3)  # (4F, 3)
    # HIGHEST: this runs inside the train step's
    # default_matmul_precision('default') context; bf16 passes would wreck
    # the large-minus-large expansions below (la² = |A|² − 2p·A + |p|²,
    # det = det0 − p·N) exactly for near-surface points whose labels
    # matter most. The contraction depth is 3, so full precision is free.
    pd = jnp.matmul(points, W.T, precision=hi).reshape(
        points.shape[0], F, 4)                             # one MXU matmul
    pA, pB, pC, pN = pd[..., 0], pd[..., 1], pd[..., 2], pd[..., 3]
    pp = jnp.sum(points * points, axis=-1)[:, None]        # (P, 1)

    la = jnp.sqrt(jnp.maximum(nA2 - 2.0 * pA + pp, 0.0))
    lb = jnp.sqrt(jnp.maximum(nB2 - 2.0 * pB + pp, 0.0))
    lc = jnp.sqrt(jnp.maximum(nC2 - 2.0 * pC + pp, 0.0))
    det = det0 - pN
    denom = (
        la * lb * lc
        + (dAB - pA - pB + pp) * lc
        + (dBC - pB - pC + pp) * la
        + (dCA - pC - pA + pp) * lb
    )
    return 2.0 * jnp.arctan2(det, denom)


def winding_number(verts, faces, points, face_chunk: int = 4096):
    """Generalized winding number of ``points`` w.r.t. a triangle mesh.

    ≈1 inside a watertight mesh, ≈0 outside (matching igl's convention for
    the occupancy threshold at 0.5).

    Args:
      verts:  (V, 3) float vertices (padding rows are fine).
      faces:  (F, 3) int32 faces; degenerate (v,v,v) rows contribute 0 and
              serve as padding.
      points: (P, 3) query points.
      face_chunk: max triangles per accumulation step (bounds the (P, F)
              intermediate); small meshes use one lane-aligned chunk.
    Returns:
      (P,) float32 winding numbers.

    The solid angle is translation-invariant, so both operands are centered
    on the query points' mean before the matmul: the expanded forms in
    ``_solid_angles_matmul`` (|a|² = |A|² − 2p·A + |p|², det = det0 − p·N)
    cancel catastrophically for coordinates far from the origin, and
    centering removes that scale dependence without changing the
    one-matmul structure.
    """
    center = jnp.mean(points, axis=0)
    points = points - center
    verts = verts - center
    F = faces.shape[0]
    # don't pad a small mesh all the way to face_chunk — just to the lanes
    face_chunk = min(face_chunk, max(128, -(-F // 128) * 128))
    pad = (-F) % face_chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0
        )
    tri = verts[faces]  # (F', 3, 3)
    tri = tri.reshape(-1, face_chunk, 3, 3)

    def body(acc, tri_chunk):
        return (
            acc + jnp.sum(_solid_angles_matmul(tri_chunk, points), axis=1),
            None,
        )

    acc, _ = jax.lax.scan(body, jnp.zeros(points.shape[0]), tri)
    return acc / (4.0 * jnp.pi)


def winding_number_batch(verts, faces, points, face_chunk: int = 4096):
    """vmapped variant: (B, V, 3), (B, F, 3), (B, P, 3) → (B, P)."""
    return jax.vmap(lambda v, f, p: winding_number(v, f, p, face_chunk))(
        verts, faces, points
    )


def winding_number_host(verts, faces, points):
    """C++ host variant (native/geom.cpp) for input-pipeline label
    precompute — same solid-angle formula as the device version, no device
    round-trip, double accumulation. Drop-in for the reference's
    ``igl.fast_winding_number_for_meshes`` call sites (training.py:723)."""
    from vtaco_tpu.native import geom

    return geom.winding_number(verts, faces, points)


def pad_mesh(verts: np.ndarray, faces: np.ndarray, v_max: int, f_max: int):
    """Host-side: pad a mesh to fixed (v_max, f_max) for jittable batching.

    Padding faces are (0,0,0) → zero solid angle. Raises if the mesh
    exceeds the budget (caller should decimate or raise the budget).
    """
    V, F = len(verts), len(faces)
    if V > v_max or F > f_max:
        raise ValueError(f"mesh ({V} verts, {F} faces) exceeds pad budget "
                         f"({v_max}, {f_max})")
    pv = np.zeros((v_max, 3), np.float32)
    pv[:V] = verts
    pf = np.zeros((f_max, 3), np.int32)
    pf[:F] = faces
    return pv, pf


class MeshBank:
    """A fixed-shape bank of padded meshes, indexable on device.

    Replaces the reference's host-side ``vf_dict`` (train.py:162-174): all
    ground-truth object meshes are padded to a common size and stacked once;
    the train step gathers each sample's mesh by integer id — keeping the
    winding-number labels entirely on device.
    """

    def __init__(self, meshes: dict, v_max=None, f_max=None):
        """meshes: {name: (verts, faces)} host arrays."""
        self.names = sorted(meshes.keys())
        self.index = {n: i for i, n in enumerate(self.names)}
        v_max = v_max or max(len(meshes[n][0]) for n in self.names)
        f_max = f_max or max(len(meshes[n][1]) for n in self.names)
        vs, fs = [], []
        for n in self.names:
            pv, pf = pad_mesh(np.asarray(meshes[n][0], np.float32),
                              np.asarray(meshes[n][1], np.int32), v_max, f_max)
            vs.append(pv)
            fs.append(pf)
        self.verts = jnp.asarray(np.stack(vs))  # (M, v_max, 3)
        self.faces = jnp.asarray(np.stack(fs))  # (M, f_max, 3)

    def ids_for(self, names):
        return np.asarray([self.index[n] for n in names], np.int32)

    def gather(self, mesh_ids):
        """(B,) int ids → ((B, v_max, 3), (B, f_max, 3)) on device."""
        return self.verts[mesh_ids], self.faces[mesh_ids]

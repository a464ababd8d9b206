"""MANO auxiliary geometry layers: anchors, per-joint axes, mesh upsampling.

TPU-native rework of the reference's manopth helper layers
(src/encoder/manopth/anchorlayer.py:11-26, axislayer.py:8-33,
upsample_layer.py:46-104, anchorutils.py:17-70). Nothing in the reference
*pipeline* calls them (they serve its demo scripts), but they are part of
the manopth surface, so they exist here as capabilities: pure jittable
functions for the device math, with the data-dependent topology work
(edge enumeration for subdivision) done once on the host per topology and
cached — the device then runs only static-shape gathers.
"""

from __future__ import annotations

import functools
import os
import pickle

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Anchors (anchorlayer.py + anchorutils.py)
# ---------------------------------------------------------------------------


def load_anchors(anchor_root):
    """Load the hand-anchor definition files (anchorutils.py:17-35).

    Returns (face_vert_idx (A,3) int, anchor_weight (A,2) float,
    merged_vertex_assignment (V,) int, anchor_mapping dict).
    """
    face_vert_idx = np.loadtxt(
        os.path.join(anchor_root, "face_vertex_idx.txt"), dtype=np.int64
    )
    anchor_weight = np.loadtxt(os.path.join(anchor_root, "anchor_weight.txt"))
    merged_vertex_assignment = np.loadtxt(
        os.path.join(anchor_root, "merged_vertex_assignment.txt"),
        dtype=np.int64,
    )
    with open(os.path.join(anchor_root, "anchor_mapping_path.pkl"), "rb") as f:
        anchor_mapping = pickle.load(f)
    return face_vert_idx, anchor_weight, merged_vertex_assignment, anchor_mapping


def recover_anchors(vertices, face_vert_idx, anchor_weight):
    """Rebuild anchor positions from hand vertices
    (anchorutils.py recover_anchor_batch:52-70).

    vertices (B, 778, 3); face_vert_idx (A, 3) vertex ids; anchor_weight
    (A, 2) barycentric-style weights on the two face edge vectors.
    Returns (B, A, 3).
    """
    vertices = jnp.asarray(vertices)
    idx = jnp.asarray(face_vert_idx, jnp.int32)
    w = jnp.asarray(anchor_weight, vertices.dtype)
    tri = vertices[:, idx, :]  # (B, A, 3, 3)
    v1 = tri[:, :, 1, :] - tri[:, :, 0, :]
    v2 = tri[:, :, 2, :] - tri[:, :, 0, :]
    return tri[:, :, 0, :] + w[None, :, 0:1] * v1 + w[None, :, 1:2] * v2


# ---------------------------------------------------------------------------
# Per-joint axes (axislayer.py)
# ---------------------------------------------------------------------------

# child joint of each of the 15 articulated MANO joints, in the MANO
# 21-joint ordering (axislayer.py:11)
_JOINTS_MAPPING = np.array([5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3])
_UP_AXIS_BASE = np.concatenate(
    [np.tile([[0.0, 1.0, 0.0]], (12, 1)), np.tile([[1.0, 1.0, 1.0]], (3, 1))]
)


def hand_axes(hand_joints, transf):
    """Per-joint (back, up, left) unit axes in each joint's local frame
    (axislayer.py:15-33).

    hand_joints (B, 21, 3); transf (B, 16, 4, 4) per-joint rigid
    transforms (ManoLayer's th_results-style stack, root first).
    Returns three (B, 15, 3) unit-vector arrays.
    """
    hand_joints = jnp.asarray(hand_joints)
    transf = jnp.asarray(transf)
    jm = jnp.asarray(_JOINTS_MAPPING)
    b = hand_joints[:, jm] - hand_joints[:, jm + 1]
    rot_t = jnp.swapaxes(transf[:, 1:, :3, :3], 2, 3)
    b = jnp.einsum("bjxy,bjy->bjx", rot_t, b)
    up = jnp.asarray(_UP_AXIS_BASE, b.dtype)
    l = jnp.cross(b, jnp.broadcast_to(up, b.shape))
    u = jnp.cross(l, b)

    def _norm(x):
        return x / jnp.linalg.norm(x, axis=2, keepdims=True)

    return _norm(b), _norm(u), _norm(l)


# ---------------------------------------------------------------------------
# Midpoint mesh subdivision (upsample_layer.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _subdivide_topology_cached(faces_bytes, n_faces, vn):
    faces = np.frombuffer(faces_bytes, np.int64).reshape(n_faces, 3)
    a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
    # per-face edges in the reference's visit order e1=(a,b) e2=(b,c)
    # e3=(c,a), each sorted (upsample_layer.py:55-66)
    e = np.stack(
        [
            np.sort(np.stack([a, b], 1), 1),
            np.sort(np.stack([b, c], 1), 1),
            np.sort(np.stack([c, a], 1), 1),
        ],
        axis=1,
    ).reshape(-1, 2)
    # insertion-order unique (the reference assigns edge ids on first visit)
    uniq, first, inv = np.unique(e, axis=0, return_index=True,
                                 return_inverse=True)
    order = np.argsort(first)
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))
    edge_id = rank[inv].reshape(n_faces, 3)
    edge_idx = uniq[order].astype(np.int64)  # (E, 2) endpoint vertex ids
    x, y, z = (edge_id + vn).T
    new_faces = np.stack(
        [
            np.stack([x, y, z], 1),
            np.stack([a, x, z], 1),
            np.stack([b, y, x], 1),
            np.stack([c, z, y], 1),
        ],
        axis=1,
    ).reshape(-1, 3)
    return edge_idx, new_faces


def subdivide_topology(faces, vn):
    """1→4 midpoint-subdivision topology, host-side, cached per topology.

    faces (F, 3) int; vn = current vertex count. Returns
    (edge_idx (E, 2): endpoint ids of each new midpoint vertex,
    new_faces (4F, 3)) — identical ids/order to the reference's
    calculate_faces (upsample_layer.py:50-73).
    """
    faces = np.ascontiguousarray(np.asarray(faces, np.int64))
    return _subdivide_topology_cached(faces.tobytes(), faces.shape[0], vn)


def upsample_mesh(vertices, faces):
    """One midpoint-subdivision step (upsample_layer.py:75-104).

    vertices (B, V, 3); faces (F, 3) shared across the batch (the MANO
    topology case — the reference expands one topology batch-wide).
    Returns (new_vertices (B, V+E, 3) jnp, new_faces (4F, 3) np).
    The vertex math is a static-shape gather+mean, safe under jit.
    """
    vertices = jnp.asarray(vertices)
    edge_idx, new_faces = subdivide_topology(faces, vertices.shape[1])
    mids = vertices[:, jnp.asarray(edge_idx), :].mean(axis=2)
    return jnp.concatenate([vertices, mids], axis=1), new_faces

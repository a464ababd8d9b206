"""Geometry / coordinate ops (pure JAX, shape-static, jit-friendly).

Behavioral contracts mirror the reference implementation in
``/root/reference/src/common.py`` (cited per function) but are written as
functional JAX ops: no in-place mutation, no data-dependent shapes, and
the camera/projection math is closed-form (the reference used pybullet for
its projection matrix, common.py:499).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Plane axis pairs used by the tri-plane encoders/decoders.
# Reference: src/common.py:276-281 (normalize_coordinate plane selection).
PLANE_AXES = {
    "xz": (0, 2),
    "xy": (0, 1),
    "yz": (1, 2),
}


def normalize_coordinate(p, padding: float = 0.1, plane: str = "xz"):
    """Project points onto a canonical plane and normalize to [0, 1).

    Matches src/common.py:268-291: divide by (1 + padding + 1e-5), shift by
    0.5, then clamp outliers into [0, 1 - 1e-5).
    """
    a, b = PLANE_AXES[plane]
    xy = jnp.stack([p[..., a], p[..., b]], axis=-1)
    xy = xy / (1 + padding + 10e-6) + 0.5
    # Reference remaps only true outliers: >=1 to 1-1e-5, <0 to 0; values
    # in [1-1e-5, 1) pass through untouched (NOT a symmetric clip).
    xy = jnp.where(xy >= 1.0, 1 - 10e-6, jnp.maximum(xy, 0.0))
    return xy


def normalize_3d_coordinate(p, padding: float = 0.1):
    """Normalize 3D points to [0, 1) for the grid feature volume.

    Matches src/common.py:293-309 (note the different epsilon, 1e-3).
    """
    p_nor = p / (1 + padding + 10e-4) + 0.5
    # same outlier-only remap as normalize_coordinate (eps 1e-3 here)
    p_nor = jnp.where(p_nor >= 1.0, 1 - 10e-4, jnp.maximum(p_nor, 0.0))
    return p_nor


def coordinate2index(x, reso: int, coord_type: str = "2d"):
    """Flat cell index of normalized coordinates.

    Matches src/common.py:333-348: ``floor(x * reso)`` then row-major
    ``x + reso * y (+ reso^2 * z)`` flattening (x = fastest axis).
    Returns int32 of shape (..., N) (the reference keeps a singleton channel
    dim; we return the squeezed index and let callers broadcast).
    """
    xi = (x * reso).astype(jnp.int32)
    if coord_type == "2d":
        index = xi[..., 0] + reso * xi[..., 1]
    elif coord_type == "3d":
        index = xi[..., 0] + reso * (xi[..., 1] + reso * xi[..., 2])
    else:
        raise ValueError(coord_type)
    return index


def make_3d_grid(bb_min, bb_max, shape):
    """Dense query grid, ordered so the *last* coordinate varies fastest.

    Matches src/common.py:178-197: linspace per axis, expand, flatten with
    ``p[:, 0]`` = slowest axis. Returns float32 (N, 3).
    """
    pxs = np.linspace(bb_min[0], bb_max[0], shape[0], dtype=np.float32)
    pys = np.linspace(bb_min[1], bb_max[1], shape[1], dtype=np.float32)
    pzs = np.linspace(bb_min[2], bb_max[2], shape[2], dtype=np.float32)
    gx, gy, gz = np.meshgrid(pxs, pys, pzs, indexing="ij")
    return np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)


def R_from_PYR(wrist_rot):
    """Composed rotation ``R_pitch @ R_yaw @ R_roll`` from (roll, pitch, yaw).

    Matches src/common.py:591-604 including its non-standard axis
    conventions (roll about z, pitch about x with transposed sign, yaw about
    y with transposed sign). Works for jnp or np inputs; returns a 3x3.
    """
    roll, pitch, yaw = wrist_rot[0], wrist_rot[1], wrist_rot[2]
    z = jnp.zeros(())
    o = jnp.ones(())
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    R_roll = jnp.array([[cr, -sr, z], [sr, cr, z], [z, z, o]])
    R_pitch = jnp.array([[o, z, z], [z, cp, sp], [z, -sp, cp]])
    R_yaw = jnp.array([[cy, z, -sy], [z, o, z], [sy, z, cy]])
    return R_pitch @ R_yaw @ R_roll


def norm_pc_1(pc, pc_obj):
    """Center by the object-cloud centroid and scale by 2x its max radius.

    Matches src/common.py:606-612.
    """
    centroid = jnp.mean(pc_obj, axis=0)
    pc = pc - centroid
    pc_obj = pc_obj - centroid
    m = jnp.max(jnp.sqrt(jnp.sum(pc_obj**2, axis=1)))
    return pc / (2 * m)


def pc_cam_to_world(pc, rot, trans):
    """Camera→world transform with the reference's bespoke extrinsics.

    Matches src/common.py:614-641: builds ``extrinsic[:3,:3] = rot_z @ rot_x
    @ rot_y`` (each a non-standard axis matrix), inverts it, and applies
    ``R_inv @ p + T`` where T is the *uninverted* translation.
    """
    dx, dy, dz = rot[0], rot[1], rot[2]
    z = jnp.zeros(())
    o = jnp.ones(())
    cx, sx = jnp.cos(dx), jnp.sin(dx)
    cy, sy = jnp.cos(dy), jnp.sin(dy)
    cz, sz = jnp.cos(dz), jnp.sin(dz)
    rot_x = jnp.array([[cx, z, sx], [z, o, z], [-sx, z, cx]])
    rot_y = jnp.array([[cy, -sy, z], [sy, cy, z], [z, z, o]])
    rot_z = jnp.array([[z, z, o], [cz, sz, z], [-sz, cz, z]])
    R = rot_z @ rot_x @ rot_y
    R_inv = jnp.linalg.inv(R)
    T = jnp.asarray(trans)
    return (R_inv @ pc.T).T + T


class Camera:
    """Pinhole camera matching the reference's RFUniverseCamera.

    Reference: src/common.py:476-588. The pybullet projection-matrix call is
    replaced by the closed-form intrinsics the reference itself derives at
    common.py:522-526 (f = h / (2 tan(fov/2))); only the intrinsics are used
    by the pipeline.
    """

    def __init__(self, width, height, near_plane, far_plane, fov=90):
        self.width, self.height = width, height
        self.near, self.far = near_plane, far_plane
        self.fov = fov
        self.f = height / (2 * math.tan(math.radians(fov / 2)))
        self.intrinsic_matrix = np.array(
            [[self.f, 0, width / 2], [0, self.f, height / 2], [0, 0, 1]]
        )

    def depth_to_camera_pointcloud(self, depth):
        """Back-project an (H, W) depth map into the camera frame.

        Matches src/common.py:553-588: returns an (H*W, 3) cloud in the
        permuted frame ``(z, -x, -y)``. Unlike the reference (which also
        returns a filtered copy via np.delete — dynamic shape), the caller
        applies the far-plane validity mask explicitly.
        """
        xp = jnp if isinstance(depth, jnp.ndarray) else np
        xmap = xp.arange(self.width)
        ymap = xp.arange(self.height)
        xmap, ymap = xp.meshgrid(xmap, ymap)
        cx, cy = self.width / 2, self.height / 2
        pz = depth
        px = (xmap - cx) * pz / self.f
        py = (ymap - cy) * pz / self.f
        cloud = xp.stack([pz, -px, -py], axis=-1)
        return cloud.reshape(-1, 3)

    def valid_mask(self, cloud):
        """True where a back-projected point is closer than the far plane
        (the reference deletes points with z > far - 5e-4, common.py:584)."""
        return cloud[..., 0] <= self.far - 0.0005


def transform_points(points, transform):
    """Apply a (B, 3, 4) RT or (B, 3, 3) K to (B, N, 3) points.

    Matches src/common.py:200-219.
    """
    if transform.shape[2] == 4:
        R = transform[:, :, :3]
        t = transform[:, :, 3:]
        return points @ jnp.swapaxes(R, 1, 2) + jnp.swapaxes(t, 1, 2)
    K = transform
    return points @ jnp.swapaxes(K, 1, 2)


def project_to_camera(points, transform):
    """Perspective projection. Matches src/common.py:233-242."""
    p_cam = transform_points(points, transform)
    return p_cam[..., :2] / p_cam[..., 2:]


# ---------------------------------------------------------------------------
# Sliding-window (pointcloud_crop) helpers — host-side numpy, used by the
# patch data fields. Reference: src/common.py:311-414.
# ---------------------------------------------------------------------------


def normalize_coord(p, vol_range, plane="xz"):
    """Normalize coords to [0, 1] within a crop volume, then project.

    Matches src/common.py:311-331 (in-place in the reference; pure here).
    p: (N, 3); vol_range: [(3,), (3,)] lower/upper bounds.
    """
    p = np.asarray(p, np.float32).copy()
    lo, hi = np.asarray(vol_range[0]), np.asarray(vol_range[1])
    p = (p - lo) / (hi - lo)
    if plane == "xz":
        return p[:, [0, 2]]
    if plane == "xy":
        return p[:, [0, 1]]
    if plane == "yz":
        return p[:, [1, 2]]
    return p


def coord2index(p, vol_range, reso=None, plane="xz"):
    """Flat cell index within a crop volume; out-of-range clamps to the
    overflow cell reso^k. Matches src/common.py:350-375. Returns (1, N)."""
    x = normalize_coord(p, vol_range, plane=plane)
    x = np.floor(x * reso).astype(np.int64)
    if x.shape[1] == 2:
        index = x[:, 0] + reso * x[:, 1]
        index[index > reso**2] = reso**2
    else:
        index = x[:, 0] + reso * (x[:, 1] + reso * x[:, 2])
        index[index > reso**3] = reso**3
    return index[None]


def update_reso(reso, depth):
    """Round a resolution up so a depth-level U-Net divides it.
    Matches src/common.py:377-390."""
    base = 2 ** (int(depth) - 1)
    if not float(reso / base).is_integer():
        for i in range(base):
            if float((reso + i) / base).is_integer():
                reso = reso + i
                break
    return reso


def decide_total_volume_range(query_vol_metric, recep_field, unit_size,
                              unet_depth):
    """Crop input/query volume bounds for scene-scale inference.
    Matches src/common.py:392-414."""
    reso = query_vol_metric / unit_size + recep_field - 1
    reso = update_reso(int(reso), unet_depth)
    input_vol_metric = reso * unit_size
    p_c = np.array([0.0, 0.0, 0.0], np.float32)
    lb_i, ub_i = p_c - input_vol_metric / 2, p_c + input_vol_metric / 2
    lb_q, ub_q = p_c - query_vol_metric / 2, p_c + query_vol_metric / 2
    if reso > 10000:
        reso = 1
    return [lb_i, ub_i], [lb_q, ub_q], reso


# ---------------------------------------------------------------------------
# Rotation utilities (reference: src/encoder/manopth/{rodrigues_layer,rot6d,
# quatutils,rotproj}.py) — batched, pure JAX.
# ---------------------------------------------------------------------------


def quat2mat(quat):
    """Quaternion (w, x, y, z) → rotation matrix, normalizing first.

    Matches manopth/rodrigues_layer.py:15-47.
    """
    norm = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = norm[..., 0], norm[..., 1], norm[..., 2], norm[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(axisang):
    """Axis-angle (N, 3) → rotation matrices (N, 3, 3) via quaternions.

    Matches manopth/rodrigues_layer.py:50-62 (including the +1e-8 norm
    epsilon inside the magnitude).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat2mat(quat)


def rot6d_to_rotmat(x):
    """6D rotation representation → rotation matrix (Zhou et al. CVPR'19).

    Matches manopth/rot6d.py:4-24 (compute_rotation_matrix_from_ortho6d).
    """
    a1 = x[..., :3]
    a2 = x[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)


def rotmat_projection(mats):
    """Project (..., 3, 3) matrices onto SO(3) via SVD.

    Counterpart of manopth/rotproj.py batch_rotprojs (used by the 'rotmat'
    joint mode): nearest rotation with det +1.
    """
    U, _, Vt = jnp.linalg.svd(mats)
    R = U @ Vt
    det = jnp.linalg.det(R)
    # flip the last singular direction where det is negative
    U_fix = U.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return U_fix @ Vt


# quaternion algebra (manopth/quatutils.py counterparts); (w, x, y, z) order
def quaternion_mul(q, r):
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quaternion_inv(q):
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0])
    return conj / jnp.sum(q * q, axis=-1, keepdims=True)


def quaternion_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# alias matching the reference name (quatutils.quaternion_to_rotation_matrix)
def quaternion_to_rotation_matrix(q):
    return quat2mat(q)


def axisang_to_euler_xyz(rotvec):
    """Axis-angle → intrinsic XYZ Euler angles.

    Equivalent of scipy's ``R.from_rotvec(v).as_euler('XYZ')`` used at
    generation.py:91-92, but jit-friendly.
    """
    R = batch_rodrigues(rotvec.reshape(1, 3))[0]
    # Intrinsic XYZ: R = Rx(a) @ Ry(b) @ Rz(c)
    b = jnp.arcsin(jnp.clip(R[0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[1, 2], R[2, 2])
    c = jnp.arctan2(-R[0, 1], R[0, 0])
    return jnp.stack([a, b, c])

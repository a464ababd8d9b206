"""Tactile contact machinery as fixed-shape, jittable ops.

The reference interleaves numpy host work inside its losses
(src/conv_onet/training.py:548-614, 685-729, 817-869): per batch element
and per finger it back-projects depth maps, selects a variable number of
contact pixels / fingertip-proximal query points with np.where, and mixes
them into the 2048-point decode sample. On TPU all of that becomes masked
tensor ops with static shapes:

  * contact *pixels* per finger are selected with a randomized top-k over
    the contact mask (uniform among contacts, like np.random.randint over
    the np.where set);
  * invalid slots (finger not touching / fewer contacts than slots) fall
    back to ordinary random query points, so the sample always has exactly
    ``num_sample`` points;
  * per-point tactile features are scattered by slot masks instead of
    python index assignment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vtaco_tpu.ops.geometry import R_from_PYR, norm_pc_1, pc_cam_to_world


def random_topk_select(mask, k, rng):
    """Pick up to k uniformly-random True positions of a boolean mask.

    Returns (idx (k,), valid (k,)): indices of chosen positions; valid is
    False for slots beyond the number of True entries.
    """
    r = jax.random.uniform(rng, mask.shape)
    key = jnp.where(mask, 1.0 + r, r)
    val, idx = jax.lax.top_k(key, k)
    # >=: uniform can return exactly 0.0, putting a genuinely selected
    # entry at key 1.0; unmasked keys are strictly < 1.0, so this is exact
    return idx, val >= 1.0


def backproject_depth(depth_hw, f, width, height):
    """Depth map (H, W) → camera-frame cloud (H*W, 3) in (z, -x, -y) axes.

    Mirrors Camera.depth_2_camera_pointcloud (src/common.py:553-581) but
    batched/jittable; no far-plane deletion (callers mask).
    """
    xmap = jnp.arange(width, dtype=depth_hw.dtype)
    ymap = jnp.arange(height, dtype=depth_hw.dtype)
    xg, yg = jnp.meshgrid(xmap, ymap)
    cx, cy = width / 2.0, height / 2.0
    pz = depth_hw
    px = (xg - cx) * pz / f
    py = (yg - cy) * pz / f
    return jnp.stack([pz, -px, -py], axis=-1).reshape(-1, 3)


class ContactSample(NamedTuple):
    points: jnp.ndarray   # (B, num_sample, 3) decode sample
    valid: jnp.ndarray    # (B, num_sample) True where slot holds a contact point
    finger: jnp.ndarray   # (B, num_sample) finger id of the slot (-1 none)


def t2d_contact_sample(
    depths, touch_success, cam_pos, cam_rot, pc_ply, query_points,
    depth_origin, cam_f, height, width, num_sample, per_finger, rng,
):
    """Back-projected contact points mixed into the decode sample.

    The jittable equivalent of training.py:685-729 / 817-854: for each
    touching finger, ≤``per_finger`` pixels whose depth deviates from the
    rest-gel reference by >1e-4 are back-projected, rotated to world with
    the GT sensor pose (+[-π/2, 0, π/2] offset), normalized into the object
    frame, and placed in the first slots of the sample; every remaining or
    invalid slot gets a uniformly-random query point.

    Args:
      depths:        (B, 5, H*W) GT depth maps.
      touch_success: (B, 5) bool.
      cam_pos/cam_rot: (B, 5, 3) sensor poses (rot in radians).
      pc_ply:        (B, P, 3) object scan (normalization anchor).
      query_points:  (B, N, 3) loaded query points to sample the rest from.
      depth_origin:  (H*W,) rest-gel depth reference.
      rng:           PRNG key.
    Returns:
      ContactSample with points (B, num_sample, 3).
    """
    B = depths.shape[0]
    per_finger = min(per_finger, num_sample // 5)
    n_contact_slots = 5 * per_finger

    rot_off = jnp.array([-jnp.pi / 2, 0.0, jnp.pi / 2])

    def per_batch(depth_b, touch_b, cpos_b, crot_b, ply_b, q_b, rng_b):
        rngs = jax.random.split(rng_b, 6)

        def per_finger_fn(f_idx, rng_f):
            d = depth_b[f_idx]
            diff = jnp.abs(d - depth_origin) > 0.0001
            mask = diff & touch_b[f_idx]
            idx, valid = random_topk_select(mask, per_finger, rng_f)
            cloud = backproject_depth(
                d.reshape(height, width), cam_f, width, height
            )
            pts_cam = cloud[idx]
            pts_world = pc_cam_to_world(
                pts_cam, crot_b[f_idx] + rot_off, cpos_b[f_idx]
            )
            pts_norm = norm_pc_1(pts_world, ply_b)
            return pts_norm, valid

        pts_list, valid_list = [], []
        for f_idx in range(5):
            p_f, v_f = per_finger_fn(f_idx, rngs[f_idx])
            pts_list.append(p_f)
            valid_list.append(v_f)
        contact_pts = jnp.concatenate(pts_list, axis=0)       # (5*pf, 3)
        contact_valid = jnp.concatenate(valid_list, axis=0)   # (5*pf,)
        finger_ids = jnp.repeat(jnp.arange(5), per_finger)

        # fallback + filler random query points
        rand_idx = jax.random.randint(
            rngs[5], (num_sample,), 0, q_b.shape[0]
        )
        filler = q_b[rand_idx]
        pts = filler.at[:n_contact_slots].set(
            jnp.where(contact_valid[:, None], contact_pts,
                      filler[:n_contact_slots])
        )
        valid = jnp.zeros(num_sample, bool).at[:n_contact_slots].set(contact_valid)
        finger = jnp.full(num_sample, -1, jnp.int32).at[:n_contact_slots].set(
            jnp.where(contact_valid, finger_ids, -1)
        )
        return pts, valid, finger

    rngs = jax.random.split(rng, B)
    pts, valid, finger = jax.vmap(per_batch)(
        depths, touch_success, cam_pos, cam_rot, pc_ply, query_points, rngs
    )
    return ContactSample(pts, valid, finger)


def tips_in_object_frame(mano_joints, wrist_pos, wrist_rot_euler, pc_ply):
    """Fingertip positions mapped from the canonical MANO frame to the
    normalized object frame.

    Mirrors training.py:544-559 / generation.py:180-187: subtract the fixed
    canonical offset [0.11, 0.005, 0], undo the canonical wrist rotation
    R(-π/2, π/2, 0), undo the GT wrist euler, add the wrist position, then
    normalize with the object scan.

    Args:
      mano_joints: (B, 21, 3) canonical-frame joints.
      wrist_pos:   (B, 3) GT wrist translation (mano[:3]).
      wrist_rot_euler: (B, 3).
      pc_ply:      (B, P, 3).
    Returns:
      (B, 5, 3) fingertip positions in the normalized object frame.
    """
    tips_idx = jnp.array([4, 8, 12, 16, 20])
    offset = jnp.array([0.11, 0.005, 0.0])
    R_canon_inv = jnp.linalg.inv(R_from_PYR(jnp.array([-jnp.pi / 2, jnp.pi / 2, 0.0])))

    def per_batch(joints_b, wpos_b, wrot_b, ply_b):
        tips = joints_b[tips_idx] - offset
        tips = (R_canon_inv @ tips.T)
        tips = jnp.linalg.inv(R_from_PYR(wrot_b)) @ tips
        tips = tips.T + wpos_b
        return norm_pc_1(tips, ply_b)

    return jax.vmap(per_batch)(mano_joints, wrist_pos, wrist_rot_euler, pc_ply)


def fingertip_gated_sample(
    query_points, occ, tips, touch_success, num_sample, per_finger, rng,
):
    """Resample query points biased to fingertip neighborhoods.

    Jittable equivalent of training.py:562-614 (compute_loss_img): points
    within 0.05 of their nearest *touching* fingertip occupy the leading
    slots (≤per_finger each) with that finger's id; the rest are uniform
    random picks. Returns the sample, its occupancy labels gathered from
    ``occ``, and slot validity/finger ids.

    Note: the reference caps each finger at 512; with num_sample=2048 that
    can nominally overflow the sample. Here per_finger is capped so
    5*per_finger ≤ num_sample (deviation only matters when >num_sample/5
    points crowd one fingertip).
    """
    B, N, _ = query_points.shape
    per_finger = min(per_finger, num_sample // 5)
    n_contact_slots = 5 * per_finger

    def per_batch(q_b, occ_b, tips_b, touch_b, rng_b):
        rngs = jax.random.split(rng_b, 6)
        d = jnp.linalg.norm(q_b[:, None, :] - tips_b[None, :, :], axis=-1)  # (N, 5)
        near = jnp.min(d, axis=1) < 0.05
        assign = jnp.argmin(d, axis=1)

        idx_parts, valid_parts = [], []
        for f_idx in range(5):
            mask = near & (assign == f_idx) & touch_b[f_idx]
            idx_f, val_f = random_topk_select(mask, per_finger, rngs[f_idx])
            idx_parts.append(idx_f)
            valid_parts.append(val_f)
        contact_idx = jnp.concatenate(idx_parts)
        contact_valid = jnp.concatenate(valid_parts)
        finger_ids = jnp.repeat(jnp.arange(5), per_finger)

        rand_idx = jax.random.randint(rngs[5], (num_sample,), 0, N)
        sel = rand_idx.at[:n_contact_slots].set(
            jnp.where(contact_valid, contact_idx, rand_idx[:n_contact_slots])
        )
        pts = q_b[sel]
        occ_sel = occ_b[sel]
        valid = jnp.zeros(num_sample, bool).at[:n_contact_slots].set(contact_valid)
        finger = jnp.full(num_sample, -1, jnp.int32).at[:n_contact_slots].set(
            jnp.where(contact_valid, finger_ids, -1)
        )
        return pts, occ_sel, valid, finger

    rngs = jax.random.split(rng, B)
    pts, occ_sel, valid, finger = jax.vmap(per_batch)(
        query_points, occ, tips, touch_success, rngs
    )
    return ContactSample(pts, valid, finger), occ_sel


def scatter_finger_features(c_img, sample: ContactSample, init: str = "zeros"):
    """Per-point tactile feature matrix from slot assignments.

    c_img: (B, 5, C) per-finger features. init 'zeros' matches
    compute_loss_img (training.py:539); 'ones' matches compute_loss_t2d_img
    (training.py:814).
    """
    B, _, C = c_img.shape
    num_sample = sample.finger.shape[1]
    base = jnp.zeros((B, num_sample, C)) if init == "zeros" else jnp.ones(
        (B, num_sample, C)
    )
    f_safe = jnp.clip(sample.finger, 0, 4)
    gathered = jnp.take_along_axis(c_img, f_safe[..., None], axis=1)
    return jnp.where(sample.valid[..., None], gathered, base)


def assign_features_by_proximity(query_points, tips, touch_success, c_img):
    """Eval-time per-point feature assignment (no resampling).

    Mirrors training.py:215-220 / generation.py:195-200: every point within
    0.05 of its nearest touching fingertip gets that finger's feature;
    everything else zeros.
    """
    d = jnp.linalg.norm(
        query_points[:, :, None, :] - tips[:, None, :, :], axis=-1
    )  # (B, N, 5)
    near = jnp.min(d, axis=-1) < 0.05
    assign = jnp.argmin(d, axis=-1)  # (B, N)
    touched = jnp.take_along_axis(touch_success, assign, axis=1)
    mask = near & touched
    feat = jnp.take_along_axis(c_img, assign[..., None], axis=1)
    return jnp.where(mask[..., None], feat, 0.0)

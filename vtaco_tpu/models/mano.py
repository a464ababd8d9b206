"""Differentiable MANO hand layer in pure JAX.

Functional counterpart of the reference's torch ManoLayer
(src/encoder/manolayer.py:14-364): pose coefficients → linear blend
skinning → 778 vertices + 21 joints (16 MANO joints + 5 fingertip
vertices, reordered to the visualization convention).

Design differences from the reference (same math, TPU-first shape):
  * The level-1/2/3 batched-chain trick (manolayer.py:264-297) is replaced
    by a statically-unrolled forward-kinematics pass over the 16-joint
    kintree — identical transforms, simpler trace.
  * Assets come from a pre-converted npz (no chumpy/pickle at runtime).
  * No torch buffers: the layer is a frozen pytree of jnp constants and a
    pure ``__call__``; it holds no learnable parameters (as in the
    reference).

Shipped-config semantics covered: use_pca on/off, flat_hand_mean on/off,
axisang root/joint rotations (the VTacO configs use use_pca=False,
flat_hand_mean=False, axisang — manolayer_kwargs in configs/VTacO_YCB.yaml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vtaco_tpu.models.mano_assets import load_mano_assets
from vtaco_tpu.ops.geometry import batch_rodrigues, rot6d_to_rotmat

# MANO joint output reorder to wrist/thumb/index/middle/ring/pinky blocks
# (manolayer.py:329).
JOINT_REORDER = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
# Fingertip vertex ids appended as extra joints (manolayer.py:319-322).
TIPS_RIGHT = [745, 317, 444, 556, 673]
TIPS_LEFT = [745, 317, 445, 556, 673]


class ManoLayer:
    def __init__(
        self,
        center_idx=None,
        flat_hand_mean=True,
        ncomps=6,
        side="right",
        mano_root=None,  # accepted for config compatibility; npz assets used
        use_pca=True,
        root_rot_mode="axisang",
        joint_rot_mode="axisang",
        robust_rot=False,
        return_transf=False,
        return_full_pose=False,
        assets_npz=None,
    ):
        if use_pca and joint_rot_mode != "axisang":
            raise TypeError("use_pca requires joint_rot_mode='axisang'")
        if root_rot_mode == "axisang":
            self.rot = 3
        elif root_rot_mode == "rotmat":
            self.rot = 6
        else:
            raise KeyError(f"root_rot_mode {root_rot_mode}")

        self.center_idx = center_idx
        self.use_pca = use_pca
        self.ncomps = ncomps if use_pca else 45
        self.side = side
        self.root_rot_mode = root_rot_mode
        self.joint_rot_mode = joint_rot_mode
        self.robust_rot = robust_rot
        self.return_transf = return_transf
        self.return_full_pose = return_full_pose

        a = load_mano_assets(assets_npz)
        self.shapedirs = jnp.asarray(a["shapedirs"])          # (778, 3, S)
        self.posedirs = jnp.asarray(a["posedirs"])            # (778, 3, 135)
        self.v_template = jnp.asarray(a["v_template"])        # (778, 3)
        self.J_regressor = jnp.asarray(a["J_regressor"])      # (16, 778)
        self.weights = jnp.asarray(a["weights"])              # (778, 16)
        self.betas = jnp.asarray(a["betas"])                  # (S,)
        self.faces = jnp.asarray(a["faces"])                  # (1538, 3) int32
        self.kintree_parents = [int(p) for p in a["kintree_parents"]]
        hands_mean = (
            np.zeros_like(a["hands_mean"]) if flat_hand_mean else a["hands_mean"]
        )
        self.hands_mean = jnp.asarray(hands_mean)             # (45,)
        self.selected_comps = jnp.asarray(a["hands_components"][: self.ncomps])

    # dict-style alias kept for reference API parity (th_faces buffer)
    @property
    def th_faces(self):
        return self.faces

    def __call__(self, pose_coeffs, betas=None, trans=None):
        """pose_coeffs: (B, rot + ncomps) → (verts (B,778,3), joints (B,21,3)[, ...])."""
        B = pose_coeffs.shape[0]

        # --- pose params → per-joint rotations (manolayer.py:186-209) ---
        hand_pose = pose_coeffs[:, self.rot : self.rot + self.ncomps]
        if self.use_pca:
            full_hand_pose = hand_pose @ self.selected_comps
        else:
            full_hand_pose = hand_pose
        full_pose = jnp.concatenate(
            [pose_coeffs[:, : self.rot], self.hands_mean + full_hand_pose], axis=1
        )
        if self.root_rot_mode == "axisang":
            all_rots = batch_rodrigues(full_pose.reshape(B * 16, 3)).reshape(B, 16, 3, 3)
            root_rot = all_rots[:, 0]
            joint_rots = all_rots[:, 1:]                      # (B, 15, 3, 3)
        else:
            joint_rots = batch_rodrigues(
                full_pose[:, 6:].reshape(B * 15, 3)
            ).reshape(B, 15, 3, 3)
            root_rot = rot6d_to_rotmat(full_pose[:, :6])
        pose_map = (joint_rots - jnp.eye(3)).reshape(B, 15 * 9)

        # --- shape & pose blendshapes (manolayer.py:243-256) ---
        if betas is None:
            v_shaped = (
                jnp.einsum("vis,s->vi", self.shapedirs, self.betas) + self.v_template
            )[None]
            j_rest = jnp.einsum("jv,bvi->bji", self.J_regressor, v_shaped)
            v_shaped = jnp.broadcast_to(v_shaped, (B, 778, 3))
            j_rest = jnp.broadcast_to(j_rest, (B, 16, 3))
        else:
            v_shaped = (
                jnp.einsum("vis,bs->bvi", self.shapedirs, betas) + self.v_template
            )
            j_rest = jnp.einsum("jv,bvi->bji", self.J_regressor, v_shaped)
        v_posed = v_shaped + jnp.einsum("vip,bp->bvi", self.posedirs, pose_map)

        # --- forward kinematics over the kintree (== manolayer.py:259-298) ---
        rots = jnp.concatenate([root_rot[:, None], joint_rots], axis=1)  # (B,16,3,3)
        transforms = [None] * 16
        for j in range(16):
            parent = self.kintree_parents[j]
            if j == 0:
                rel_t = j_rest[:, 0]
            else:
                rel_t = j_rest[:, j] - j_rest[:, parent]
            t_local = (
                jnp.zeros((B, 4, 4))
                .at[:, :3, :3].set(rots[:, j])
                .at[:, :3, 3].set(rel_t)
                .at[:, 3, 3].set(1.0)
            )
            transforms[j] = t_local if j == 0 else transforms[parent] @ t_local
        G = jnp.stack(transforms, axis=1)                     # (B, 16, 4, 4)

        # remove rest-pose joint translation (manolayer.py:300-302)
        Rj = jnp.einsum("bkij,bkj->bki", G[:, :, :3, :3], j_rest)
        A = G.at[:, :, :3, 3].add(-Rj)

        # --- linear blend skinning (manolayer.py:304-315) ---
        T = jnp.einsum("bkij,vk->bvij", A, self.weights)      # (B, 778, 4, 4)
        v_h = jnp.concatenate([v_posed, jnp.ones((B, 778, 1))], axis=-1)
        verts = jnp.einsum("bvij,bvj->bvi", T, v_h)[..., :3]

        jtr = G[:, :, :3, 3]                                  # (B, 16, 3)
        tips = verts[:, TIPS_RIGHT if self.side == "right" else TIPS_LEFT]
        jtr = jnp.concatenate([jtr, tips], axis=1)[:, JOINT_REORDER]

        # --- recentring (manolayer.py:331-343) ---
        if trans is None:
            if self.center_idx is not None:
                center = jtr[:, self.center_idx : self.center_idx + 1]
            else:
                center = jnp.zeros_like(jtr[:, :1])
            jtr = jtr - center
            verts = verts - center
        else:
            center = jnp.zeros_like(jtr[:, :1])
            jtr = jtr + trans[:, None]
            verts = verts + trans[:, None]

        results = [verts, jtr]
        if self.return_transf:
            g_t = G[:, :, :3, 3:] - center[:, :, :, None]
            if trans is not None:
                g_t = g_t + trans[:, None, :, None]
            transf = (
                jnp.zeros((B, 16, 4, 4))
                .at[:, :, :3, :3].set(G[:, :, :3, :3])
                .at[:, :, :3, 3:].set(g_t)
                .at[:, :, 3, 3].set(1.0)
            )
            results.append(transf)
        if self.return_full_pose:
            results.append(full_pose)
        return tuple(results)

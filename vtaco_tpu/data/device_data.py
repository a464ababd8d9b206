"""Device-resident dataset with on-device augmentation.

For datasets that fit in HBM (the YCB capture is a few GB), the whole raw
field set uploads once and every training batch is assembled ON the TPU: a
jitted sampler gathers the batch's models and applies the reference's
transforms (query-point subsampling, cloud subsampling + Gaussian noise,
tactile image noise + the legacy double-/255 scaling) with device RNG.

Per-step host→device traffic drops from ~15MB of fresh arrays to one PRNG
key and B int32 ids — the "minimize host↔device transfers" rule applied to
the input pipeline. (In this build's tunneled-TPU harness the per-step
uploads also degrade the remote endpoint over time; device residency
sidesteps that entirely.)

Images are stored uint8 on device (4x smaller); noise/scale runs in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataset:
    """Stacked raw fields for every model of a split, on device."""

    def __init__(self, dataset, legacy_image_scale=True, noise_std=7.0,
                 pointcloud_noise=0.005):
        """dataset: a Shapes3dDataset whose fields include PointsField +
        PointCloudField (the object-scale configs)."""
        from vtaco_tpu.data.npz_cache import load_npz
        import os

        self.legacy_image_scale = legacy_image_scale
        self.noise_std = noise_std
        self.pointcloud_noise = pointcloud_noise
        self.names = []
        cols = {k: [] for k in (
            "points", "occ", "contact", "pc_hand", "mano", "wrist",
            "cam_pos", "cam_rot", "pc_points", "pc_normals", "pc_ply",
            "img", "depth", "touch_success",
        )}
        for entry in dataset.models:
            mdir = os.path.join(
                dataset.dataset_folder, entry["category"], entry["model"]
            )
            pd = load_npz(os.path.join(mdir, "points.npz"))
            cd = load_npz(os.path.join(mdir, "pointcloud.npz"))
            self.names.append(entry["model"][:-5])
            cols["points"].append(pd["points"].astype(np.float32))
            cols["occ"].append(pd["occupancies"].astype(np.float32))
            cols["contact"].append(pd["contact"].astype(np.float32))
            cols["pc_hand"].append(pd["pc_hand"].astype(np.float32))
            cols["mano"].append(pd["mano"].astype(np.float32))
            cols["wrist"].append(pd["wrist_rot"].astype(np.float32))
            cols["cam_pos"].append(pd["cam_pos"].astype(np.float32))
            cols["cam_rot"].append(
                pd["cam_rot"].astype(np.float32) / 180 * np.pi
            )
            cols["pc_points"].append(cd["points"].astype(np.float32))
            cols["pc_normals"].append(cd["normals"].astype(np.float32))
            cols["pc_ply"].append(cd["pc_ply"].astype(np.float32))
            img = np.asarray(cd["img"])
            if img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
                img = img.transpose(0, 2, 3, 1)
            cols["img"].append(np.clip(img, 0, 255).astype(np.uint8))
            cols["depth"].append(cd["depth"].astype(np.float32))
            cols["touch_success"].append(
                np.asarray(cd["touch_success"]).astype(bool)
            )
        self.data = {
            k: jnp.asarray(np.stack(v)) for k, v in cols.items()
        }
        self.n_models = len(self.names)

    def nbytes(self):
        return sum(int(v.nbytes) for v in self.data.values())

    @functools.partial(jax.jit, static_argnames=("self", "n_points", "n_cloud"))
    def _sample(self, rng, ids, n_points: int, n_cloud: int):
        d = self.data
        g = lambda k: d[k][ids]
        B = ids.shape[0]
        r_pts, r_pc, r_pcn, r_img = jax.random.split(rng, 4)

        # SubsamplePoints (transforms.py:58-86)
        Nq = d["points"].shape[1]
        idx = jax.random.randint(r_pts, (B, n_points), 0, Nq)
        take = lambda arr: jnp.take_along_axis(
            arr, idx[..., None] if arr.ndim == 3 else idx, axis=1
        )
        points = take(g("points"))
        occ = take(g("occ"))
        contact = take(g("contact"))

        # SubsamplePointcloud + PointcloudNoise (transforms.py:5-55)
        Ns = d["pc_points"].shape[1]
        cidx = jax.random.randint(r_pc, (B, n_cloud), 0, Ns)
        cloud = jnp.take_along_axis(g("pc_points"), cidx[..., None], axis=1)
        cloud = cloud + self.pointcloud_noise * jax.random.normal(
            r_pcn, cloud.shape
        )

        # tactile image noise + scaling (fields.py:335-337 semantics)
        img = g("img").astype(jnp.float32)
        img = jnp.clip(
            img + self.noise_std * jax.random.normal(r_img, img.shape),
            0, 255,
        ) / 255.0
        if self.legacy_image_scale:
            img = img / 255.0

        return {
            "points": points,
            "points.occ": occ,
            "points.contact": contact,
            "points.pc_hand": g("pc_hand"),
            "points.mano": g("mano"),
            "points.wrist": g("wrist"),
            "points.cam_pos": g("cam_pos"),
            "points.cam_rot": g("cam_rot"),
            "inputs": cloud,
            "inputs.pc_ply": g("pc_ply"),
            "inputs.img": img,
            "inputs.depth": g("depth"),
            "inputs.touch_success": g("touch_success"),
        }

    def sample_batch(self, rng, ids, n_points, n_cloud):
        """(rng, (B,) int ids) → batch dict of device arrays + names list."""
        ids = jnp.asarray(ids, jnp.int32)
        batch = dict(self._sample(rng, ids, n_points, n_cloud))
        batch["points.name"] = [self.names[int(i)] for i in np.asarray(ids)]
        return batch


class DeviceBatchLoader:
    """Shuffling epoch iterator over a DeviceDataset (drop_last)."""

    def __init__(self, device_dataset: DeviceDataset, batch_size,
                 n_points, n_cloud, seed=0, shuffle=True):
        self.ds = device_dataset
        self.batch_size = batch_size
        self.n_points = n_points
        self.n_cloud = n_cloud
        self.shuffle = shuffle
        self.host_rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

    def __len__(self):
        return self.ds.n_models // self.batch_size

    def __iter__(self):
        order = np.arange(self.ds.n_models)
        if self.shuffle:
            self.host_rng.shuffle(order)
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            self._key, sub = jax.random.split(self._key)
            yield self.ds.sample_batch(
                sub, order[i : i + self.batch_size],
                self.n_points, self.n_cloud,
            )

    # -- multi-step (fused dispatch) API ------------------------------
    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def take_ids(self, k):
        """(k, B) int32 model ids from an infinite shuffled epoch stream
        (blocks may span epoch boundaries; partial epoch tails are kept)."""
        need = k * self.batch_size
        buf = getattr(self, "_id_buf", np.empty(0, np.int64))
        while buf.size < need:
            order = np.arange(self.ds.n_models)
            if self.shuffle:
                self.host_rng.shuffle(order)
            buf = np.concatenate([buf, order])
        self._id_buf = buf[need:]
        return buf[:need].reshape(k, self.batch_size).astype(np.int32)

"""npz data fields — same on-disk contract as the reference.

Counterparts of src/data/fields.py. Each field's ``load(model_path, idx,
category)`` returns a dict whose ``None`` key is the field's main array;
the dataset flattens other keys into ``'<field>.<key>'`` batch entries.

Layout notes (TPU-first):
  * tactile images are returned channel-last (5, H, W, 3); on-disk
    (5, 3, H, W) reference data is transposed on load.
  * The reference's image scaling divides by 255 twice
    (src/data/fields.py:335-337), leaving images in [0, 1/255]. That is
    what its trained weights expect, so ``legacy_image_scale=True`` keeps
    it; set False for sane [0, 1] scaling.
"""

from __future__ import annotations

import os

import numpy as np

from vtaco_tpu.data.npz_cache import load_npz


class Field:
    """Field protocol (src/data/core.py:13-33)."""

    def load(self, model_path, idx, category):
        raise NotImplementedError

    def check_complete(self, files):
        raise NotImplementedError


class IndexField(Field):
    """Dataset index passthrough. src/data/fields.py:12-30."""

    def load(self, model_path, idx, category):
        return idx

    def check_complete(self, files):
        return True


def _resolve(model_path, file_name, multi_files):
    if multi_files is None:
        return os.path.join(model_path, file_name)
    num = np.random.randint(multi_files)
    return os.path.join(model_path, file_name, "%s_%02d.npz" % (file_name, num))


class PointsField(Field):
    """Query points + occupancy + hand/camera supervision.

    src/data/fields.py:99-177. Keys loaded: points, occupancies
    (optionally packed bits), points_obj (GT surface points, shuffled,
    first 2048), contact, pc_hand, mano (51-d), wrist_rot, cam_pos,
    cam_rot (degrees → radians).
    """

    def __init__(self, file_name, transform=None, unpackbits=False, multi_files=None):
        self.file_name = file_name
        self.transform = transform
        self.unpackbits = unpackbits
        self.multi_files = multi_files

    def load(self, model_path, idx, category):
        name = model_path.split("/")[-1][:-5]
        file_path = _resolve(model_path, self.file_name, self.multi_files)
        d = load_npz(file_path)

        points = d["points"]
        if points.dtype == np.float16:  # break symmetry (fields.py:137-139)
            points = points.astype(np.float32)
            points += 1e-4 * np.random.randn(*points.shape)
        occ = d["occupancies"]
        if self.unpackbits:
            occ = np.unpackbits(occ)[: points.shape[0]]
        occ = occ.astype(np.float32)

        points_obj = d["points_obj"].astype(np.float32)
        np.random.shuffle(points_obj)
        points_obj = points_obj[:2048]

        cam_rot = d["cam_rot"].astype(np.float32) / 180 * np.pi

        data = {
            None: points.astype(np.float32),
            "name": name,
            "occ": occ,
            "points_obj": points_obj,
            "contact": d["contact"].astype(np.float32),
            "pc_hand": d["pc_hand"].astype(np.float32),
            "mano": d["mano"].astype(np.float32),
            "wrist": d["wrist_rot"].astype(np.float32),
            "cam_pos": d["cam_pos"].astype(np.float32),
            "cam_rot": cam_rot,
        }
        if self.transform is not None:
            data = self.transform(data)
        return data

    def check_complete(self, files):
        return self.file_name in files


class PointCloudField(Field):
    """Input point cloud + tactile images/depths.

    src/data/fields.py:295-361. Keys: points, normals, pc_ply (object
    scan), img (5 tactile RGB), depth (5 x H*W), touch_success (5 bools).
    """

    def __init__(self, file_name, transform=None, multi_files=None,
                 legacy_image_scale=True, noise_std=7.0):
        self.file_name = file_name
        self.transform = transform
        self.multi_files = multi_files
        self.legacy_image_scale = legacy_image_scale
        self.noise_std = noise_std

    def load(self, model_path, idx, category):
        file_path = _resolve(model_path, self.file_name, self.multi_files)
        d = load_npz(file_path)

        images = np.asarray(d["img"], np.float32)
        if images.ndim == 4 and images.shape[1] == 3 and images.shape[-1] != 3:
            images = images.transpose(0, 2, 3, 1)  # (5,3,H,W) → (5,H,W,3)
        noise = np.random.normal(0, self.noise_std, images.shape)
        images = np.clip(images + noise, 0, 255) / 255
        if self.legacy_image_scale:
            images = images / 255  # fields.py:337 — images end in [0, 1/255]

        data = {
            None: d["points"].astype(np.float32),
            "normals": d["normals"].astype(np.float32),
            "pc_ply": d["pc_ply"].astype(np.float32),
            "touch_success": np.asarray(d["touch_success"]),
            "img": images.astype(np.float32),
            "depth": d["depth"].astype(np.float32),
        }
        if self.transform is not None:
            data = self.transform(data)
        return data

    def check_complete(self, files):
        return self.file_name in files


class PartialPointCloudField(Field):
    """Random-box-cropped partial cloud. src/data/fields.py:364-423."""

    def __init__(self, file_name, transform=None, multi_files=None, part_ratio=0.7):
        self.file_name = file_name
        self.transform = transform
        self.multi_files = multi_files
        self.part_ratio = part_ratio

    def load(self, model_path, idx, category):
        file_path = _resolve(model_path, self.file_name, self.multi_files)
        d = load_npz(file_path)
        points = d["points"].astype(np.float32)
        normals = d["normals"].astype(np.float32)

        side = np.random.randint(3)
        xb = [points[:, side].min(), points[:, side].max()]
        length = np.random.uniform(self.part_ratio * (xb[1] - xb[0]), xb[1] - xb[0])
        ind = (points[:, side] - xb[0]) <= length
        data = {None: points[ind], "normals": normals[ind]}
        if self.transform is not None:
            data = self.transform(data)
        return data

    def check_complete(self, files):
        return self.file_name in files


class PatchPointsField(Field):
    """Crop-masked query points for sliding-window training.

    src/data/fields.py:33-97: keep points inside the crop's query volume,
    attach per-plane coordinates normalized to the crop's input volume.
    ``category`` is the precomputed vol-info dict from the dataset.
    """

    def __init__(self, file_name, transform=None, unpackbits=False, multi_files=None):
        self.file_name = file_name
        self.transform = transform
        self.unpackbits = unpackbits
        self.multi_files = multi_files

    def load(self, model_path, idx, vol):
        from vtaco_tpu.ops.geometry import normalize_coord

        file_path = _resolve(model_path, self.file_name, self.multi_files)
        d = load_npz(file_path)
        points = d["points"]
        if points.dtype == np.float16:
            points = points.astype(np.float32)
            points += 1e-4 * np.random.randn(*points.shape)
        occ = d["occupancies"]
        if self.unpackbits:
            occ = np.unpackbits(occ)[: points.shape[0]]
        occ = occ.astype(np.float32)

        ind = np.ones(len(points), bool)
        for i in range(3):
            ind &= (points[:, i] >= vol["query_vol"][0][i]) & (
                points[:, i] <= vol["query_vol"][1][i]
            )
        data = {None: points[ind].astype(np.float32), "occ": occ[ind]}
        if self.transform is not None:
            # crop points carry no contact labels
            data.setdefault("contact", np.zeros_like(data["occ"]))
            data = self.transform(data)
        p_n = {}
        for key in vol["plane_type"]:
            p_n[key] = normalize_coord(
                data[None].copy(), vol["input_vol"], plane=key
            )
        data["normalized"] = p_n
        return data

    def check_complete(self, files):
        return self.file_name in files


class PatchPointCloudField(Field):
    """Crop-masked input cloud with precomputed scatter indices.

    src/data/fields.py:221-293: points outside the input volume are zeroed
    and their indices set to the overflow cell (reso^k), which the crop
    encoder drops.
    """

    def __init__(self, file_name, transform=None, transform_add_noise=None,
                 multi_files=None):
        self.file_name = file_name
        self.transform = transform
        self.multi_files = multi_files

    def load(self, model_path, idx, vol):
        from vtaco_tpu.ops.geometry import coord2index

        file_path = _resolve(model_path, self.file_name, self.multi_files)
        d = load_npz(file_path)
        points = d["points"].astype(np.float32)
        normals = d["normals"].astype(np.float32)

        data = {None: points, "normals": normals}
        if self.transform is not None:
            data = self.transform(data)
            points = data[None]

        mask = np.ones(len(points), bool)
        for i in range(3):
            mask &= (points[:, i] >= vol["input_vol"][0][i]) & (
                points[:, i] <= vol["input_vol"][1][i]
            )
        mask = ~mask  # True = outside
        data["mask"] = mask
        points[mask] = 0.0

        index = {}
        for key in vol["plane_type"]:
            index[key] = coord2index(
                points.copy(), vol["input_vol"], reso=vol["reso"], plane=key
            )
            if key == "grid":
                index[key][:, mask] = vol["reso"] ** 3
            else:
                index[key][:, mask] = vol["reso"] ** 2
        data["ind"] = index
        return data

    def check_complete(self, files):
        return self.file_name in files


class VoxelsField(Field):
    """binvox voxel grids. src/data/fields.py:179-218."""

    def __init__(self, file_name, transform=None):
        self.file_name = file_name
        self.transform = transform

    def load(self, model_path, idx, category):
        from vtaco_tpu.data import binvox_rw

        file_path = os.path.join(model_path, self.file_name)
        with open(file_path, "rb") as f:
            voxels = binvox_rw.read_as_3d_array(f)
        voxels = voxels.data.astype(np.float32)
        if self.transform is not None:
            voxels = self.transform(voxels)
        return voxels

    def check_complete(self, files):
        return self.file_name in files

"""Dataset + host input pipeline.

``Shapes3dDataset`` mirrors the reference's directory-per-category layout
and field protocol (src/data/core.py:36-251): model lists come from
``<split>.lst`` files, optional ``metadata.yaml`` maps category ids to
names, and each sample is the flattened union of its fields' dicts. Failed
samples are skipped (the reference returns None and filters in collate,
core.py:154-164, 254-263).

The loader is a thread-prefetching batcher producing fixed-shape numpy
dicts ready for device put — the TPU-side equivalent of the reference's
torch DataLoader with worker processes (train.py:63-77).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import yaml

logger = logging.getLogger(__name__)


class Shapes3dDataset:
    def __init__(self, dataset_folder, fields, split=None, categories=None,
                 no_except=True, transform=None, cfg=None, shard=None):
        self.dataset_folder = dataset_folder
        self.fields = fields
        self.no_except = no_except
        self.transform = transform
        self.cfg = cfg

        if categories is None:
            categories = [
                c for c in sorted(os.listdir(dataset_folder))
                if os.path.isdir(os.path.join(dataset_folder, c))
            ]

        metadata_file = os.path.join(dataset_folder, "metadata.yaml")
        if os.path.exists(metadata_file):
            with open(metadata_file) as f:
                self.metadata = yaml.safe_load(f)
        else:
            self.metadata = {c: {"id": c, "name": "n/a"} for c in categories}
        for c_idx, c in enumerate(categories):
            self.metadata[c]["idx"] = c_idx

        self.models = []
        for c_idx, c in enumerate(categories):
            subpath = os.path.join(dataset_folder, c)
            if not os.path.isdir(subpath):
                logger.warning("Category %s does not exist in dataset.", c)
                continue
            if split is None:
                models_c = sorted(
                    d for d in os.listdir(subpath)
                    if os.path.isdir(os.path.join(subpath, d))
                )
            else:
                with open(os.path.join(subpath, split + ".lst")) as f:
                    models_c = [m for m in f.read().split("\n") if m]
            self.models += [{"category": c, "model": m} for m in models_c]

        # multi-host input sharding: keep every num_shards-th model,
        # strided so each process's shard spans all categories. Shards
        # are disjoint and cover the full list (tests/test_data.py);
        # epoch semantics stay exact across the pod.
        if shard is not None:
            shard_index, num_shards = shard
            if not 0 <= shard_index < num_shards:
                raise ValueError(f"shard {shard_index}/{num_shards}")
            self.shard = (shard_index, num_shards)
            self.models = self.models[shard_index::num_shards]
        else:
            self.shard = None

        # sliding-window (pointcloud_crop) precomputation
        # (src/data/core.py:106-126)
        if cfg is not None and cfg["data"].get("input_type") == "pointcloud_crop":
            from vtaco_tpu.ops.geometry import decide_total_volume_range

            self.split = split
            query_vol_metric = cfg["data"]["padding"] + 1
            unit_size = cfg["data"]["unit_size"]
            recep_field = 2 ** (
                cfg["model"]["encoder_kwargs"]["unet3d_kwargs"]["num_levels"] + 2
            )
            enc_kw = cfg["model"]["encoder_kwargs"]
            if "unet" in enc_kw and enc_kw.get("unet"):
                depth = enc_kw["unet_kwargs"]["depth"]
            else:
                depth = enc_kw["unet3d_kwargs"]["num_levels"]
            self.depth = depth
            if cfg["generation"].get("sliding_window"):
                vols = decide_total_volume_range(
                    100000, recep_field, unit_size, depth
                )
            else:
                vols = decide_total_volume_range(
                    query_vol_metric, recep_field, unit_size, depth
                )
            self.total_input_vol, self.total_query_vol, self.total_reso = vols

    def get_vol_info(self, model_path):
        """Per-sample crop volume info (src/data/core.py:185-232)."""
        from vtaco_tpu.ops.geometry import update_reso

        cfg = self.cfg
        query_vol_size = cfg["data"]["query_vol_size"]
        unit_size = cfg["data"]["unit_size"]
        field_name = cfg["data"]["pointcloud_file"]
        plane_type = cfg["model"]["encoder_kwargs"]["plane_type"]
        recep_field = 2 ** (
            cfg["model"]["encoder_kwargs"]["unet3d_kwargs"]["num_levels"] + 2
        )
        if cfg["data"].get("multi_files") is None:
            file_path = os.path.join(model_path, field_name)
        else:
            num = np.random.randint(cfg["data"]["multi_files"])
            file_path = os.path.join(
                model_path, field_name, "%s_%02d.npz" % (field_name, num)
            )
        p = np.load(file_path)["points"]
        if self.split == "train":
            p_c = np.array(
                [np.random.uniform(p[:, i].min(), p[:, i].max()) for i in range(3)],
                np.float32,
            )
            reso = update_reso(query_vol_size + recep_field - 1, self.depth)
            input_vol_metric = reso * unit_size
            query_vol_metric = query_vol_size * unit_size
            input_vol = [p_c - input_vol_metric / 2, p_c + input_vol_metric / 2]
            query_vol = [p_c - query_vol_metric / 2, p_c + query_vol_metric / 2]
        else:
            reso = self.total_reso
            input_vol = self.total_input_vol
            query_vol = self.total_query_vol
        return {
            "plane_type": plane_type,
            "reso": reso,
            "input_vol": input_vol,
            "query_vol": query_vol,
        }

    def __len__(self):
        return len(self.models)

    def __getitem__(self, idx):
        category = self.models[idx]["category"]
        model = self.models[idx]["model"]
        c_idx = self.metadata[category]["idx"]
        model_path = os.path.join(self.dataset_folder, category, model)
        data = {}
        if (
            self.cfg is not None
            and self.cfg["data"].get("input_type") == "pointcloud_crop"
        ):
            c_idx = self.get_vol_info(model_path)
            data["pointcloud_crop"] = True
        for field_name, field in self.fields.items():
            try:
                field_data = field.load(model_path, idx, c_idx)
            except Exception:
                if self.no_except:
                    logger.warning(
                        "Error occurred when loading field %s of model %s",
                        field_name, model,
                    )
                    return None
                raise
            if isinstance(field_data, dict):
                for k, v in field_data.items():
                    if k is None:
                        data[field_name] = np.asarray(v, np.float32)
                    elif k == "name":
                        data[f"{field_name}.{k}"] = v
                    elif isinstance(v, dict):
                        # nested dicts (crop 'ind' / 'normalized' per plane)
                        for sub, sv in v.items():
                            data[f"{field_name}.{k}.{sub}"] = np.asarray(sv)
                    else:
                        data[f"{field_name}.{k}"] = np.asarray(v, np.float32)
            else:
                data[field_name] = field_data
        if self.transform is not None:
            data = self.transform(data)
        return data

    def get_model_dict(self, idx):
        return self.models[idx]

    def test_model_complete(self, category, model):
        model_path = os.path.join(self.dataset_folder, category, model)
        files = os.listdir(model_path)
        for field_name, field in self.fields.items():
            if not field.check_complete(files):
                logger.warning("Field '%s' is incomplete: %s", field_name, model_path)
                return False
        return True


def collate_batch(samples):
    """Stack a list of sample dicts into one numpy batch dict; None samples
    (field load failures) are dropped first (collate_remove_none,
    src/data/core.py:254-263)."""
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = list(vals)
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class BatchLoader:
    """Shuffling, thread-prefetching batch iterator.

    drop_last=True for training (fixed batch shapes keep the jitted step
    from re-compiling); the val loader uses batch_size=1 like the
    reference (train.py:68-71).
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=4,
                 drop_last=None, seed=None, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = shuffle if drop_last is None else drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        error = []
        closed = threading.Event()  # consumer abandoned the iterator

        def put(item):
            """q.put that gives up if the consumer is gone — an abandoned
            iterator (e.g. next(iter(loader))) must not leave the producer
            thread blocked forever holding prefetched batches + the pool."""
            while not closed.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in batches:
                        samples = list(pool.map(self.dataset.__getitem__, idxs))
                        if not put(collate_batch(samples)):
                            return
            except BaseException as e:  # surface in the consumer, never hang
                error.append(e)
            finally:
                put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if error:
                        raise error[0]
                    break
                if item is not None:
                    yield item
        finally:
            closed.set()  # GeneratorExit / break / exception → stop producer


def get_dataset(mode, cfg, return_idx=False, shard=None):
    """Top-level dataset factory (src/config.py:121-166).

    ``shard=(index, num)`` slices the model list for multi-host input
    (see parallel/multihost.py). ``shard=None`` + ``data.shard_by_process:
    true`` derives it from ``jax.process_index()/count()`` — the TRAIN
    split only, so validation metrics stay comparable to single-host runs
    (each process evaluating the full val split is redundant but exact;
    pass an explicit ``shard`` to shard eval too and aggregate yourself).
    """
    from vtaco_tpu.core.factory import get_data_fields
    from vtaco_tpu.data import fields as F
    from vtaco_tpu.data.transforms import (
        Compose,
        PointcloudNoise,
        SubsamplePointcloud,
    )

    dataset_type = cfg["data"]["dataset"]
    dataset_folder = cfg["data"]["path"]
    categories = cfg["data"]["classes"]
    splits = {
        "train": cfg["data"]["train_split"],
        "val": cfg["data"]["val_split"],
        "test": cfg["data"]["test_split"],
    }
    split = splits[mode]
    if dataset_type != "Shapes3D":
        raise ValueError(f'Invalid dataset "{dataset_type}"')

    flds = get_data_fields(mode, cfg)
    input_type = cfg["data"]["input_type"]
    if input_type == "pointcloud":
        transform = Compose([
            SubsamplePointcloud(cfg["data"]["pointcloud_n"]),
            PointcloudNoise(cfg["data"]["pointcloud_noise"]),
        ])
        flds["inputs"] = F.PointCloudField(
            cfg["data"]["pointcloud_file"], transform,
            multi_files=cfg["data"].get("multi_files"),
        )
    elif input_type == "partial_pointcloud":
        transform = Compose([
            SubsamplePointcloud(cfg["data"]["pointcloud_n"]),
            PointcloudNoise(cfg["data"]["pointcloud_noise"]),
        ])
        flds["inputs"] = F.PartialPointCloudField(
            cfg["data"]["pointcloud_file"], transform,
            multi_files=cfg["data"].get("multi_files"),
        )
    elif input_type == "pointcloud_crop":
        transform = Compose([
            SubsamplePointcloud(cfg["data"]["pointcloud_n"]),
            PointcloudNoise(cfg["data"]["pointcloud_noise"]),
        ])
        flds["inputs"] = F.PatchPointCloudField(
            cfg["data"]["pointcloud_file"], transform,
            multi_files=cfg["data"].get("multi_files"),
        )
    elif input_type == "voxels":
        flds["inputs"] = F.VoxelsField(cfg["data"]["voxels_file"])
    elif input_type == "idx":
        flds["inputs"] = F.IndexField()
    elif input_type is not None:
        raise ValueError(f"Invalid input type ({input_type})")

    if return_idx:
        flds["idx"] = F.IndexField()

    if shard is None and mode == "train" and cfg["data"].get(
            "shard_by_process"):
        import jax

        from vtaco_tpu.parallel.multihost import process_shard

        if jax.process_count() > 1:
            shard = process_shard()

    return Shapes3dDataset(
        dataset_folder, flds, split=split, categories=categories, cfg=cfg,
        shard=shard,
    )

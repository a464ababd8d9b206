"""Batch inference: reconstruct meshes for a list of staged samples.

Counterpart of src/conv_onet/inferencing.py:22-325 (Inferencer): iterates
pre-staged samples and emits (object mesh, hand mesh) pairs through the
same dense-decode path as the generator, for every model family
(fingertip-gated VTacOH and t2d-contact VTacO).

Note: the reference's inference_img/inference_img_t2d reuse the first
sample's feature volume and tactile features for every subsequent sample
(inferencing.py:155-160, 274-279 — an apparent caching bug); here every
sample is encoded. The data-parallel batched variant shards samples across
the device mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from vtaco_tpu.generate.generator import Generator3D
from vtaco_tpu.ops import metrics


class Inferencer:
    def __init__(self, model, generator: Generator3D, *, threshold=0.5,
                 num_sample=2048, with_img=False, with_contact=False,
                 train_tactile=False, encode_t2d=False, input_type="pointcloud",
                 vis_dir=None):
        self.model = model
        self.generator = generator
        self.threshold = threshold
        self.num_sample = num_sample
        self.with_img = with_img
        self.with_contact = with_contact
        self.train_tactile = train_tactile
        self.encode_t2d = encode_t2d
        self.input_type = input_type
        self.vis_dir = vis_dir
        self.resolution0 = generator.resolution0
        self.padding = generator.padding
        if vis_dir is not None and not os.path.exists(vis_dir):
            os.makedirs(vis_dir)

    @classmethod
    def from_config(cls, model, generator, cfg, **kw):
        """Mirror of conv_onet.config.get_inferencer
        (src/conv_onet/config.py:183-213)."""
        out_dir = cfg["training"]["out_dir"]
        return cls(
            model, generator,
            threshold=cfg["test"]["threshold"],
            num_sample=cfg["data"]["num_sample"],
            with_img=cfg["model"]["with_img"],
            with_contact=cfg["model"]["with_contact"],
            train_tactile=cfg["model"]["train_tactile"],
            encode_t2d=bool(cfg["model"]["encoder_t2d"]),
            input_type=cfg["data"]["input_type"],
            vis_dir=os.path.join(out_dir, "vis"),
            **kw,
        )

    def inference_step(self, state, data_vis_list):
        """Reconstruct every staged sample → (mesh_list_obj, mesh_list_hand).

        Each entry of data_vis_list is {'data': <B=1 batch dict>,
        'name': str} (the train loop's staging format, train.py:100).
        Returns lists of ((verts, faces), name) plus a metrics dict.
        """
        mesh_list_obj, mesh_list_hand = [], []
        emds, cds = [], []
        for entry in data_vis_list:
            data = entry["data"] if "data" in entry else entry
            name = entry.get("name", data.get("points.name", ["sample"])[0])
            (verts, faces), emd, cd = self.generator.generate_obj_mesh_wnf(
                state, data
            )
            hand_verts, hand_faces = self.generator.generate_hand_mesh(state, data)
            mesh_list_obj.append(((verts, faces), name))
            mesh_list_hand.append(((hand_verts, hand_faces), name))
            emds.append(emd)
            cds.append(cd)
        f_emd = [x for x in emds if np.isfinite(x)]
        f_cd = [x for x in cds if np.isfinite(x)]
        stats = {
            # means over successful extractions; per-sample inf entries mark
            # empty meshes (generate_obj_mesh_wnf's degenerate-field contract)
            "emd_mean": float(np.mean(f_emd)) if f_emd else float("nan"),
            "cd_mean": float(np.mean(f_cd)) if f_cd else float("nan"),
            "n": len(emds),
            "n_empty": len(cds) - len(f_cd),
        }
        return mesh_list_obj, mesh_list_hand, stats

    def run_batched(self, state, loader, batch_size=8, device_mesh=None,
                    out_dir=None, max_samples: Optional[int] = None,
                    dtype=None):
        """Data-parallel multi-object reconstruction (plain occupancy path).

        Encodes and dense-decodes ``batch_size`` objects at once (vmapped,
        optionally sharded over the mesh's data axis). PIPELINED: the next
        batch's encode+decode is dispatched (XLA dispatch is asynchronous)
        before the previous batch's host work runs, so marching cubes and
        mesh IO overlap device compute. Chamfer metrics run as one batched
        device call per flight, not one dispatch per object. The batched
        counterpart of the reference's strictly sequential Inferencer.
        """
        import jax
        import jax.numpy as jnp

        from vtaco_tpu.generate.marching_cubes import marching_cubes
        from vtaco_tpu.generate.mise import host_map
        from vtaco_tpu.ops import metrics as M
        from vtaco_tpu.utils import meshio

        out_dir = out_dir or self.vis_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        gen = self.generator
        nx = gen.resolution0 * 4
        box = 1 + gen.padding
        model = gen.model
        if dtype is None:
            dtype = (jnp.float32 if jax.default_backend() == "cpu"
                     else jnp.bfloat16)

        names, cds = [], []
        chamfer = jax.jit(M.chamfer_distance)
        rng = np.random.default_rng(0)

        use_band = gen._band_enabled()

        def dispatch(inputs_list, names_b, objs):
            inputs = jnp.asarray(np.stack(inputs_list))
            c = gen._apply(state, model.encode_inputs, inputs, train=False)
            if use_band:
                # iso-band transfer: ~1/5 the bf16 payload per object,
                # meshes bit-match the full f32 path (generate/band.py)
                flight = gen.decode_dense_batched_band(
                    state, nx, c, device_mesh=device_mesh,
                    return_device=True,  # keep the dispatch asynchronous
                )
            else:
                flight = gen.decode_dense_batched(
                    state, nx, c, device_mesh=device_mesh, dtype=dtype,
                    return_device=True,
                )
            return flight, names_b, objs

        def _mc_one(v, level=None):
            verts, faces = marching_cubes(
                np.asarray(v).reshape(nx, nx, nx), level=level,
                gradient="ascent",
            )
            return (verts - nx / 2) * box / nx, faces

        def consume(flight):
            values, names_b, objs = flight
            # per-object marching cubes threads across host cores (the
            # native extractor holds no cross-handle state; ctypes
            # releases the GIL) — mise.host_map is serial on 1-core hosts
            if use_band:
                raw, fin_args = values
                # fused native scanner: meshes straight from the band
                # payloads, no per-object grid reconstruction
                raw_meshes, _ = gen.finish_batched_band(state, raw,
                                                        fin_args, mesh=True)
                meshes = [((v - nx / 2) * box / nx, f)
                          for v, f in raw_meshes]
            else:
                vals = np.asarray(values, np.float32)  # blocks: dev→host
                meshes = host_map(_mc_one, list(vals))
            samples, empty = [], []
            for b, name in enumerate(names_b):
                verts, faces = meshes[b]
                if out_dir:
                    meshio.write_off(
                        os.path.join(out_dir, f"{name}_obj.off"), verts, faces
                    )
                n = len(verts)
                empty.append(n == 0)
                if n == 0:  # no isosurface crossing: chamfer undefined
                    samples.append(np.zeros((2048, 3), np.float32))  # filler
                else:
                    idx = (rng.permutation(n)[:2048] if n >= 2048
                           else rng.integers(0, n, 2048))
                    samples.append(np.ascontiguousarray(verts[idx], np.float32))
                names.append(name)
            cd = np.asarray(chamfer(
                jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(samples))
            ))
            # empty meshes report inf (same contract as generate_obj_mesh_wnf)
            # rather than a plausible-looking chamfer against the filler
            cds.extend(float("inf") if e else float(x)
                       for x, e in zip(cd, empty))

        in_flight = None
        pending_inputs, pending_names, pending_obj = [], [], []
        for i, batch in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            pending_inputs.append(np.asarray(batch["inputs"])[0])
            pending_names.append(batch["points.name"][0])
            pending_obj.append(np.asarray(batch["points.points_obj"])[0])
            if len(pending_inputs) == batch_size:
                flight = dispatch(pending_inputs, pending_names, pending_obj)
                pending_inputs, pending_names, pending_obj = [], [], []
                if in_flight is not None:
                    consume(in_flight)  # host MC overlaps the new decode
                in_flight = flight
        if pending_inputs:
            flight = dispatch(pending_inputs, pending_names, pending_obj)
            if in_flight is not None:
                consume(in_flight)
            in_flight = flight
        if in_flight is not None:
            consume(in_flight)
        finite = [x for x in cds if np.isfinite(x)]
        return {
            "names": names,
            "cd": cds,
            # mean over successful extractions; per-object inf entries in
            # "cd" mark the failures (n_empty counts them)
            "cd_mean": float(np.mean(finite)) if finite else None,
            "n_empty": len(cds) - len(finite),
        }

    def run(self, state, loader, out_dir=None, max_samples: Optional[int] = None):
        """Reconstruct a whole split, optionally writing meshes to disk."""
        from vtaco_tpu.utils import meshio

        out_dir = out_dir or self.vis_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        emds, cds, names = [], [], []
        for i, batch in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            name = batch["points.name"][0]
            if self.train_tactile:
                # tactile estimator: emit predicted sensor point clouds
                pcs = self.generator.generate_tactile_pc(state, batch)
                if out_dir:
                    meshio.write_ply(
                        os.path.join(out_dir, f"{name}_tactile.ply"),
                        pcs[0].reshape(-1, 3),
                    )
                names.append(name)
                continue
            (verts, faces), emd, cd = self.generator.generate_obj_mesh_wnf(
                state, batch
            )
            hand_verts, hand_faces = self.generator.generate_hand_mesh(state, batch)
            if out_dir:
                meshio.write_off(
                    os.path.join(out_dir, f"{name}_obj.off"), verts, faces
                )
                meshio.write_off(
                    os.path.join(out_dir, f"{name}_hand.off"),
                    hand_verts, hand_faces,
                )
            emds.append(emd)
            cds.append(cd)
            names.append(name)
        f_emd = [x for x in emds if np.isfinite(x)]
        f_cd = [x for x in cds if np.isfinite(x)]
        return {
            "names": names,
            "emd": emds,
            "cd": cds,
            "emd_mean": float(np.mean(f_emd)) if f_emd else None,
            "cd_mean": float(np.mean(f_cd)) if f_cd else None,
            "n_empty": len(cds) - len(f_cd),
        }

"""Mesh generation / inference.

Counterpart of src/conv_onet/generation.py:21-383 (Generator3D):
  * ``generate_obj_mesh_wnf`` — dense nx³ occupancy decode → marching
    cubes → chamfer + EMD vs the GT surface points;
  * ``generate_hand_mesh`` — MANO prediction un-canonicalized into the
    object frame;
  * ``generate_tactile_pc`` — predicted depth maps back-projected to world
    point clouds;
  * ``eval_points`` — the chunked occupancy decode (the BASELINE hot loop).

TPU-first design: the whole per-chunk pipeline — per-point tactile-feature
gating (fingertip proximity or contact-point proximity) fused with the
interpolate+MLP decode — is one jitted function; chunks stream through it
with no host work in between. The reference instead materializes a
(2.1M, 32) ``c_img_all`` on host with chunked scipy cdist calls
(generation.py:202-255) before decoding.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vtaco_tpu.generate.marching_cubes import marching_cubes
from vtaco_tpu.ops import metrics
from vtaco_tpu.ops.geometry import (
    R_from_PYR,
    axisang_to_euler_xyz,
    norm_pc_1,
    pc_cam_to_world,
)
from vtaco_tpu.train import contact as C
from vtaco_tpu.train.trainer import CAM_FOV, DEPTH_REST


def _legacy_transfer_dtype(transfer_dtype):
    """Transfer dtype for the legacy decode paths. The fast paths implement
    int8 as SCALED quantization (max|logit|/127 computed in-program); the
    legacy paths apply a raw astype, which for int8 would truncate logits
    to garbage — coerce to bfloat16 there instead (same payload class,
    value-correct)."""
    td = jnp.dtype(transfer_dtype)
    if td == jnp.dtype(jnp.int8):
        return jnp.dtype(jnp.bfloat16)
    return td


class Generator3D:
    def __init__(
        self,
        model,
        points_batch_size=100000,
        threshold=0.5,
        resolution0=16,
        upsampling_steps=3,
        padding=0.1,
        sample=False,
        refinement_step=0,
        simplify_nfaces=None,
        input_type=None,
        vol_info=None,
        vol_bound=None,
        alpha=0.2,
        with_img=False,
        encode_t2d=False,
        contact_per_finger=128,
        depth_origin=None,
        legacy_gt_depth=True,
        matmul_precision="highest",
        mc_level="midpoint",
        use_pallas="auto",
        transfer_dtype="auto",
        coord_quant="auto",
        band_transfer="auto",
    ):
        """``matmul_precision``: precision context for the encoder/decoder
        applies ('highest' preserves the package default for metric parity;
        'default' runs the MXU's native bf16 passes — ~2-3x faster encodes
        on TPU, visually identical meshes).

        ``mc_level``: iso level for the dense-grid marching cubes.
        'midpoint' = (min+max)/2 of the value grid — the skimage default
        the reference inherits (generation.py:270). 'mean' = grid mean,
        or any float in logit space. Useful when a checkpoint's held-out
        logit scale is compressed (weakly generalized models emit border
        noise that crosses the midpoint and produces a box-shell — a
        mean+2σ-class level measured 2.5× better chamfer on such a
        checkpoint; well-trained models are insensitive to the choice).

        ``use_pallas``: route dense decodes through the fused Mosaic
        trunk (ops/pallas/decode.py). 'auto' (default) enables it on the
        TPU backend only — measured +22%/+24% device decode throughput at
        128³/256³ on v5e vs the XLA trunk (docs/DESIGN.md § Pallas
        verdict); CPU/GPU and leaky-ReLU decoders use the XLA trunk.

        ``transfer_dtype``: device→host dtype for occupancy-logit
        transfers in the generate_* pipelines. 'auto' (default) serves
        compact on TPU — 'int8' (scale-quantized max|logit|/127, quarter
        payload; ample for marching cubes' iso-crossing interpolation
        and measured ~20% faster single-object decode through a thin
        host link — docs/DESIGN.md § transfer budget) — and 'bfloat16'
        on CPU/GPU where the parity suites run. Explicit 'bfloat16' /
        'float32' / 'int8' pin it (metric paths should pin float32).

        ``coord_quant``: host→device encoding for NON-lattice scattered
        query uploads (eval_points / decode_points_batched). 'auto'
        (default) quantizes world coords to uint16 on TPU — half the
        f32 upload, error ≤ box/2¹⁶/2 ≈ 8.4e-6 world units — after the
        lossless compact encodings (lattice/dense-cube detection) have
        been tried; False pins exact f32 uploads, True forces uint16
        even off-TPU. Lattice-structured inputs are unaffected (they
        take the smaller exact uint8/int16 encoding either way).

        ``band_transfer``: dense-decode → marching-cubes transfers ship
        only the iso-band (1 bit/vertex occupancy mask + exact f32
        logits at corners of iso-crossing cells — the only values
        marching cubes ever interpolates) instead of the full nx³
        volume: ~10× smaller payload through a thin host link, meshes
        bit-identical to the full f32 transfer (tests/test_band.py).
        'auto' (default) enables it on TPU; True/False pin it.
        Overflowing the fixed-size band buffer (degenerate fields:
        noise crossing the level everywhere) falls back to the full
        transfer."""
        self.model = model
        self.matmul_precision = matmul_precision
        self._apply_cache = {}
        # decode_dense_batched: vmap below this many total points, lax.map
        # above (the giant vmapped program crashes the remote TPU compiler
        # at 8×256³; the mapped body is the proven single-object program)
        self.batched_vmap_limit = 1 << 25
        # eval_points fast path: slice inputs above this many points — the
        # corner-packed row-take materializes (N, 8C) f32 on device
        # (~17 GB at 256³ in one piece, past the v5e's 16 GB HBM)
        self.scatter_slice_points = 1 << 22
        self._buckets_used = {}
        self.points_batch_size = points_batch_size
        self.threshold = threshold
        # validate eagerly: a typo'd string (or a bool, which passes
        # isinstance(int)) must not silently fall back to the midpoint level
        if isinstance(mc_level, bool) or not (
            mc_level in ("midpoint", "mean")
            or isinstance(mc_level, (int, float))
        ):
            raise ValueError(
                "generation.mc_level must be 'midpoint', 'mean', or a "
                f"number (logit-space iso level); got {mc_level!r}"
            )
        self.mc_level = mc_level
        if use_pallas not in ("auto", True, False):
            raise ValueError(
                "generation.use_pallas must be 'auto', true, or false; "
                f"got {use_pallas!r}"
            )
        self.use_pallas = use_pallas
        _td = {"auto": "auto", "bfloat16": jnp.bfloat16,
               "float32": jnp.float32, "int8": jnp.int8}
        if transfer_dtype not in _td:
            raise ValueError(
                "generation.transfer_dtype must be one of "
                f"{sorted(_td)}; got {transfer_dtype!r}"
            )
        self._transfer_dtype = _td[transfer_dtype]
        if coord_quant not in ("auto", True, False):
            raise ValueError(
                "generation.coord_quant must be 'auto', true, or false; "
                f"got {coord_quant!r}"
            )
        self.coord_quant = coord_quant
        if band_transfer not in ("auto", True, False):
            raise ValueError(
                "generation.band_transfer must be 'auto', true, or false; "
                f"got {band_transfer!r}"
            )
        self.band_transfer = band_transfer
        self.band_overflows = 0  # full-transfer fallbacks (observability)
        self.resolution0 = resolution0
        self.upsampling_steps = upsampling_steps
        self.padding = padding
        self.input_type = input_type
        self.alpha = alpha
        self.with_img = with_img
        self.encode_t2d = encode_t2d
        self.contact_per_finger = contact_per_finger
        self.depth_origin = depth_origin
        self.legacy_gt_depth = legacy_gt_depth
        self.vol_bound = vol_bound
        if vol_info is not None:
            self.input_vol, _, _ = vol_info

        self._decode_chunk = jax.jit(
            self._decode_chunk_impl, static_argnames=("gating",)
        )
        self._decode_chunks_scan = jax.jit(
            self._decode_chunks_scan_impl, static_argnames=("gating",)
        )
        self._decode_dense = jax.jit(
            self._decode_dense_impl, static_argnames=("nx", "gating")
        )
        self._decode_dense_fast = jax.jit(
            self._decode_dense_fast_impl,
            static_argnames=("nx", "gating", "dtype", "use_pallas", "leaky",
                             "pallas_tile", "out_dtype", "out_xmajor"),
        )
        self._decode_dense_band = jax.jit(
            self._decode_dense_band_impl,
            static_argnames=("nx", "gating", "dtype", "use_pallas", "leaky",
                             "cap", "level_mode"),
        )
        self._encode_band = jax.jit(
            self._encode_band_impl,
            static_argnames=("nx", "gating", "dtype", "use_pallas", "leaky",
                             "cap", "level_mode"),
        )
        self._mesh_band = jax.jit(
            self._mesh_band_impl,
            static_argnames=("nx", "mode", "dtype", "use_pallas", "leaky",
                             "cap", "level_mode", "legacy_gt"),
        )
        # lattice_reso is a TRACED operand (None vs scalar picks the
        # program; the value doesn't) so every MISE level shares one
        # compiled program instead of recompiling per resolution
        self._decode_scatter_fast = jax.jit(
            self._decode_scatter_fast_impl,
            static_argnames=("gating", "dtype", "use_pallas", "leaky",
                             "pallas_tile", "out_dtype", "coord_quant"),
        )
        self._decode_scatter_window = jax.jit(
            self._decode_scatter_window_impl,
            static_argnames=("gating", "S", "tile", "L", "out_dtype",
                             "coord_quant", "interpret"),
        )
        # sorted windowed scatter decode (ops/pallas/decode.py
        # fused_trunk_window_cn): tile of consecutive sorted points per
        # kernel instance; window = 2S supers. S=128 is the Mosaic
        # minimum (block lane dim must divide 128); the host wrapper
        # adapts super size L and tile to keep every tile's span inside
        # the window (cheapest selection first: L=1 = plain cells)
        self.window_tile = 1024
        self.window_S = 128
        self.window_interpret = False  # tests: interpret-mode kernel

    @classmethod
    def from_config(cls, model, cfg, **kw):
        """Mirror of conv_onet.config.get_generator
        (src/conv_onet/config.py:215-269)."""
        gen = cfg["generation"]
        depth_origin = None
        dpath = cfg["data"].get("depth_origin")
        if dpath and os.path.exists(dpath):
            depth_origin = np.loadtxt(dpath).astype(np.float32)

        # crop-volume bookkeeping (src/conv_onet/config.py:224-247)
        vol_info = vol_bound = None
        if cfg["data"].get("input_type") == "pointcloud_crop":
            from vtaco_tpu.ops.geometry import (
                decide_total_volume_range,
                update_reso,
            )

            enc_kw = cfg["model"]["encoder_kwargs"]
            query_vol_metric = cfg["data"]["padding"] + 1
            unit_size = cfg["data"]["unit_size"]
            recep_field = 2 ** (enc_kw["unet3d_kwargs"]["num_levels"] + 2)
            if enc_kw.get("unet"):
                depth = enc_kw["unet_kwargs"]["depth"]
            else:
                depth = enc_kw["unet3d_kwargs"]["num_levels"]
            vol_info = decide_total_volume_range(
                query_vol_metric, recep_field, unit_size, depth
            )
            if gen.get("sliding_window"):
                grid_reso = update_reso(
                    cfg["data"]["query_vol_size"] + recep_field - 1, depth
                )
                vol_bound = {
                    "query_crop_size": cfg["data"]["query_vol_size"] * unit_size,
                    "input_crop_size": grid_reso * unit_size,
                    "fea_type": enc_kw["plane_type"],
                    "reso": grid_reso,
                }
        return cls(
            model,
            points_batch_size=gen.get("batch_size", 100000),
            threshold=cfg["test"]["threshold"],
            resolution0=gen["resolution_0"],
            upsampling_steps=gen["upsampling_steps"],
            sample=gen["use_sampling"],
            refinement_step=gen["refinement_step"],
            simplify_nfaces=gen["simplify_nfaces"],
            input_type=cfg["data"]["input_type"],
            padding=cfg["data"]["padding"],
            alpha=gen.get("alpha", 0.2),
            with_img=cfg["model"]["with_img"],
            encode_t2d=bool(cfg["model"]["encoder_t2d"]),
            depth_origin=depth_origin,
            vol_info=vol_info,
            vol_bound=vol_bound,
            **{"matmul_precision": gen.get("matmul_precision", "highest"),
               "mc_level": gen.get("mc_level", "midpoint"),
               "use_pallas": gen.get("use_pallas", "auto"),
               "transfer_dtype": gen.get("transfer_dtype", "auto"),
               "coord_quant": gen.get("coord_quant", "auto"),
               "band_transfer": gen.get("band_transfer", "auto"),
               # same source of truth as the trainer's contact sampling
               "legacy_gt_depth":
                   cfg["training"].get("legacy_gt_depth", True),
               **kw},
        )

    # ------------------------------------------------------------------
    def _fast_capable(self):
        """The channels-first fast trunk / band / batched paths reproduce
        LocalDecoder (fc_p/fc_c/ResnetBlockFC/fc_out) semantics exactly —
        and ONLY those. AttentionDecoder shares the trunk parameter names
        but fuses tactile features through TransformerFusion first
        (decoder.py:258): extracting its trunk would silently drop the
        fusion. Gate every fast path on the decoder type."""
        from vtaco_tpu.models.decoder import LocalDecoder

        return isinstance(self.model.decoder, LocalDecoder)

    def _pallas_enabled(self):
        """Resolve the ``use_pallas`` setting: 'auto' means TPU backend
        only (the Mosaic kernel has no CPU/GPU lowering here; tests run
        the interpreter explicitly). Per-call ``use_pallas=None`` in the
        decode entry points defers to this."""
        if self.use_pallas == "auto":
            return jax.default_backend() == "tpu"
        return bool(self.use_pallas)

    @property
    def transfer_dtype(self):
        """Resolved logit transfer dtype: 'auto' serves int8 on the TPU
        backend (compact serving default) and bfloat16 elsewhere (the
        CPU/GPU parity suites)."""
        if self._transfer_dtype == "auto":
            return (jnp.int8 if jax.default_backend() == "tpu"
                    else jnp.bfloat16)
        return self._transfer_dtype

    def _coord_quant_enabled(self):
        """Resolve the ``coord_quant`` setting for non-lattice scattered
        uploads: 'auto' means TPU backend only (where the host↔device
        link is the binding cost); the parity suites stay exact f32."""
        if self.coord_quant == "auto":
            return jax.default_backend() == "tpu"
        return bool(self.coord_quant)

    # ------------------------------------------------------------------
    def _vars(self, state):
        return {"params": state.params, "batch_stats": state.batch_stats}

    def _apply(self, state, method, *args, **kw):
        """Jit-cached module apply (one XLA dispatch per call).

        An eager ``model.apply`` executes op-by-op — hundreds of dispatches
        per encode, which dominates wall-clock on a remote/tunneled device.
        Programs are cached per (method, static kwargs)."""
        key = (getattr(method, "__name__", id(method)),
               tuple(sorted(kw.items())))
        fn = self._apply_cache.get(key)
        if fn is None:
            precision = self.matmul_precision

            def run(variables, *a):
                with jax.default_matmul_precision(precision):
                    return self.model.apply(variables, *a, method=method, **kw)

            fn = jax.jit(run)
            self._apply_cache[key] = fn
        return fn(self._vars(state), *args)

    # ------------------------------------------------------------------
    def _decode_chunk_impl(self, variables, pts, c, gate_pts, gate_feat,
                           gate_valid, gating):
        """One fused decode chunk.

        gating == 'none'   : plain decode
        gating == 'tips'   : per-point feature by nearest-fingertip (<0.05)
                             [generation.py:195-200]
        gating == 'contact': per-point feature if any back-projected contact
                             point of a finger is within 0.015; later
                             fingers overwrite earlier [generation.py:248-255]
        """
        model = self.model
        p = pts[None]
        if gating == "none":
            logits = model.apply(variables, p, c, method=model.decode)
            return logits[0]
        c_img = self._gate_chunk(pts, gating, gate_pts, gate_feat, gate_valid)
        logits = model.apply(
            variables, p, c, c_img[None], method=model.decode_img
        )
        return logits[0]

    def _decode_chunks_scan_impl(self, variables, pts_chunks, c, gate_pts,
                                 gate_feat, gate_valid, gating):
        """All chunks in ONE dispatch: lax.map of the chunk decode over a
        (k, chunk, 3) stack. The reference (and the chunked path above)
        dispatches per chunk; through a high-RTT link those round trips
        dominate the scattered decode (~21 × RTT for the 128³ grid), so
        the whole loop becomes one XLA program with one result transfer."""
        return jax.lax.map(
            lambda ch: self._decode_chunk_impl(
                variables, ch, c, gate_pts, gate_feat, gate_valid, gating
            ),
            pts_chunks,
        )

    def _gate_chunk(self, pts, gating, gate_pts, gate_feat, gate_valid):
        """Per-point tactile feature for a chunk of points (shared by the
        scattered and dense decode paths)."""
        if gating == "tips":
            d = jnp.linalg.norm(pts[:, None, :] - gate_pts[None, :, :], axis=-1)
            near = jnp.min(d, axis=1) < 0.05
            assign = jnp.argmin(d, axis=1)
            valid = gate_valid[assign] & near
            feat = gate_feat[assign]
            return jnp.where(valid[:, None], feat, 0.0)
        # contact gating: gate_pts (5, K, 3), gate_valid (5, K), gate_feat (5, C)
        d = jnp.linalg.norm(
            pts[:, None, None, :] - gate_pts[None, :, :, :], axis=-1
        )
        within = jnp.any((d < 0.015) & gate_valid[None], axis=-1)
        any_f = jnp.any(within, axis=1)
        last_f = 4 - jnp.argmax(within[:, ::-1], axis=1)
        feat = gate_feat[last_f]
        return jnp.where(any_f[:, None], feat, 0.0)

    def _decode_dense_impl(self, variables, c, gate_pts, gate_feat,
                           gate_valid, nx, gating):
        """Whole-grid decode as ONE XLA program: separable gather-free
        interpolation (ops.dense_decode) + slab-scanned conditioned MLP."""
        from vtaco_tpu.ops.dense_decode import (
            dense_feature_volume,
            dense_query_grid,
        )

        box_size = 1 + self.padding
        feats = dense_feature_volume(c, nx, box_size, self.padding)  # (N, C)
        pts = jnp.asarray(dense_query_grid(nx, box_size))            # (N, 3)

        # slab = nx² z-slices; 4 per scan step when nx allows (fewer, larger
        # slabs amortize the scan), else 2/1 so any nx (odd MISE grids like
        # 65) divides evenly
        g = 4 if nx % 4 == 0 else (2 if nx % 2 == 0 else 1)
        slab = nx * nx * g
        n_slabs = (nx * nx * nx) // slab
        feats = feats.reshape(n_slabs, slab, -1)
        pts_s = pts.reshape(n_slabs, slab, 3)
        model = self.model

        def one_slab(args):
            f, p = args
            if gating == "none":
                return model.apply(
                    variables, p, f,
                    method=lambda m, p, f: m.decoder.forward_feats(p, f),
                )
            c_img = self._gate_chunk(p, gating, gate_pts, gate_feat, gate_valid)
            return model.apply(
                variables, p, f, c_img,
                method=lambda m, p, f, ci: m.decoder.forward_img_feats(p, f, ci),
            )

        logits = jax.lax.map(one_slab, (feats, pts_s))
        return logits.reshape(-1)

    @staticmethod
    def _finalize_logits(logits, out_dtype):
        """In-program output conversion. Every eager post-jit op on the
        result costs a separate dispatch (~30 ms fixed through this
        harness's device tunnel), so the transfer cast lives INSIDE the
        decode program. ``out_dtype``: None (f32), a jnp dtype, or 'int8'
        → (int8 quantized logits, f32 scale) with scale = max|logit|/127
        (quarter the transfer payload; ample for iso-crossing
        interpolation — see docs/DESIGN.md § transfer budget)."""
        if out_dtype is None:
            return logits
        if out_dtype == "int8":
            scale = jnp.maximum(jnp.max(jnp.abs(logits)), 1e-6) / 127.0
            q = jnp.round(logits / scale).astype(jnp.int8)
            return q, scale.astype(jnp.float32)
        return logits.astype(out_dtype)

    def _decode_dense_fast_impl(self, trunk_params, c, gate_pts, gate_feat,
                                gate_valid, nx, gating, dtype,
                                use_pallas=False, leaky=False,
                                pallas_tile=None, out_dtype=None,
                                out_xmajor=False):
        """Channels-first whole-grid decode (ops.fast_trunk): feature
        upsampling, gating and the MLP all keep points on the lane
        dimension. Returns logits flattened z-slowest by default;
        ``out_xmajor=True`` transposes to the reference's x-slowest
        flattening ON DEVICE (a host-side 8 MB strided transpose costs
        tens of ms on this harness's single core), and ``out_dtype``
        applies the transfer cast in-program (see _finalize_logits)."""
        from vtaco_tpu.ops.dense_decode import (
            dense_feature_volume_cn,
            dense_query_grid_cn,
        )

        box_size = 1 + self.padding
        feats = dense_feature_volume_cn(c, nx, box_size, self.padding, dtype)
        p_cn = jnp.asarray(dense_query_grid_cn(nx, box_size))
        logits = self._trunk_fast(trunk_params, p_cn, feats, gate_pts,
                                  gate_feat, gate_valid, gating, dtype,
                                  use_pallas, leaky, pallas_tile)
        if out_xmajor:
            logits = logits.reshape(nx, nx, nx).transpose(2, 1, 0).reshape(-1)
        return self._finalize_logits(logits, out_dtype)

    def _decode_dense_band_impl(self, trunk_params, c, gate_pts, gate_feat,
                                gate_valid, level_const, nx, gating, dtype,
                                use_pallas=False, leaky=False,
                                cap=0, level_mode="midpoint"):
        """Dense decode + in-program iso-band extraction (generate/band.py):
        one XLA program emitting (count, level, packed occupancy bits,
        active-vertex logits) — the complete marching-cubes input at ~1/10
        of the full-volume transfer payload."""
        from vtaco_tpu.generate.band import band_extract

        logits = self._decode_dense_fast_impl(
            trunk_params, c, gate_pts, gate_feat, gate_valid, nx, gating,
            dtype, use_pallas, leaky, out_dtype=None, out_xmajor=True,
        )
        return band_extract(logits, nx, cap, level_mode, level_const)

    def _encode_band_impl(self, variables, trunk_params, inputs, gate_pts,
                          gate_feat, gate_valid, level_const, nx, gating,
                          dtype, use_pallas=False, leaky=False, cap=0,
                          level_mode="midpoint"):
        """encode_inputs + dense decode + band extraction as ONE program:
        the per-object serving path pays a single dispatch RTT instead of
        encode + decode (the tunnel RTT is ~the device compute here)."""
        with jax.default_matmul_precision(self.matmul_precision):
            c = self.model.apply(variables, inputs, train=False,
                                 method=self.model.encode_inputs)
        return self._decode_dense_band_impl(
            trunk_params, c, gate_pts, gate_feat, gate_valid, level_const,
            nx, gating, dtype, use_pallas, leaky, cap, level_mode,
        )

    def _mesh_band_impl(self, variables, trunk_params, inputs, imgs,
                        depths, touch, cam_rot, cam_pos, pc_ply, wrist_t,
                        wrist_rot, d_origin, seed, level_const, nx, mode,
                        dtype, use_pallas=False, leaky=False, cap=0,
                        level_mode="midpoint", legacy_gt=True):
        """The COMPLETE per-object mesh-extraction device program: object
        encode, tactile-feature encode, contact/tips gate construction
        (generation.py:159-255 — host numpy in the reference, and
        previously dozens of eager dispatches here) and the gated dense
        decode + iso-band extraction, in ONE dispatch. The host's only
        remaining work is band reconstruction + marching cubes."""
        model = self.model
        with jax.default_matmul_precision(self.matmul_precision):
            c = model.apply(variables, inputs, train=False,
                            method=model.encode_inputs)
            if mode == "none":
                gp = jnp.zeros((1, 3))
                gf = jnp.zeros((1, 1))
                gv = jnp.zeros((1,), bool)
            else:
                c_img = model.apply(variables, imgs, train=False,
                                    method=model.encode_img_inputs)
                gf = c_img[0]
                if mode == "contact":
                    H, W = imgs.shape[2], imgs.shape[3]
                    if legacy_gt:
                        # GT-depth gating (the reference overwrite quirk,
                        # training.py:691-693): the t2d forward is dead —
                        # skip it entirely
                        pred = jnp.zeros_like(depths[0])
                    else:
                        pred, _ = model.apply(variables, inputs, imgs,
                                              train=False,
                                              method=model.encode_t2d)
                        pred = pred[0]
                    gp, gv = self._prep_contact_gates(
                        depths[0], pred, d_origin, touch[0], cam_rot[0],
                        cam_pos[0], pc_ply[0], H, W, seed=seed,
                    )
                else:  # tips
                    c_hand = model.apply(variables, inputs, train=False,
                                         method=model.encode_hand_inputs)
                    gp = C.tips_in_object_frame(
                        c_hand["mano_joints"], wrist_t, wrist_rot, pc_ply
                    )[0]
                    gv = touch[0]
        return self._decode_dense_band_impl(
            trunk_params, c, gp, gf, gv, level_const, nx, mode, dtype,
            use_pallas, leaky, cap, level_mode,
        )

    def _decode_scatter_fast_impl(self, trunk_params, p_cn, c, gate_pts,
                                  gate_feat, gate_valid, gating, dtype,
                                  use_pallas=False, leaky=False,
                                  pallas_tile=None, out_dtype=None,
                                  lattice_reso=None, coord_quant=False):
        """Channels-first decode at arbitrary (3, N) query coords:
        corner-packed gather interpolation
        (ops.dense_decode.scattered_feature_volume_cn) feeding the same
        fused trunk as the dense path — the reference's public decode API
        (generation.py:338-383) at dense-path speed instead of the
        chunked (N, C)-layout legacy loop.

        Coordinate upload dominates this path's latency through a slow
        host↔device link (24 MB f32 at 2.1M points), so two compact
        input encodings convert to world coords IN-PROGRAM:
        ``lattice_reso=R``: p_cn is an int (3, N) lattice-point array and
        world coords are ``box·(p/R − 0.5)`` — matches the host computing
        the same f32 expression to float-roundoff (XLA FMA-contracts the
        affine map; ≤3e-6 observed on logits). MISE refinement queries
        are lattice points; 6 B/pt instead of 12. ``coord_quant``: p_cn is
        uint16-quantized normalized coords, error ≤ box/2¹⁶/2 ≈ 8.4e-6
        world units (lossy; opt-in for serving)."""
        from vtaco_tpu.ops.dense_decode import scattered_feature_volume_cn

        box = 1 + self.padding
        if lattice_reso is not None:
            p_cn = box * (p_cn.astype(jnp.float32)
                          / jnp.float32(lattice_reso) - 0.5)
        elif coord_quant:
            p_cn = box * (p_cn.astype(jnp.float32) / 65535.0 - 0.5)
        feats = scattered_feature_volume_cn(c, p_cn, self.padding, dtype)
        logits = self._trunk_fast(trunk_params, p_cn, feats, gate_pts,
                                  gate_feat, gate_valid, gating, dtype,
                                  use_pallas, leaky, pallas_tile)
        return self._finalize_logits(logits, out_dtype)

    def _decode_scatter_window_impl(self, trunk_params, p_cn, c_grid,
                                    gate_pts, gate_feat, gate_valid,
                                    gating, S, tile, L=1, out_dtype=None,
                                    coord_quant=False, interpret=False):
        """Sorted windowed scatter decode: NO gather anywhere on device.

        The corner-packed row-take floor of `_decode_scatter_fast_impl`
        (~49 ms at 2.1M points — TPU gathers are row-issue-bound) is
        replaced by sort-locality: ``p_cn`` (3, N) arrives SORTED by
        super-cell id (ops.dense_decode.supercell_keys; the host wrapper
        `_try_window_scatter` sorts and un-sorts) and the Pallas kernel
        (ops.pallas.decode.fused_trunk_window_cn) selects each tile's
        features from a VMEM-resident 2S-super window of the
        super-cell-packed volume with one MXU one-hot dot — interpolation
        AND trunk in one kernel. Grid-only feature fields (the flagship's
        ``plane_type: 'grid'``); the host wrapper guarantees every
        point's super-cell lies inside its tile's window (margin-checked
        against the exact same f32 math) and falls back to the gather
        path otherwise.

        PRECONDITION: ``p_cn``'s padded length must EXCEED the number of
        real points — the overflow sentinel overwrites slot [-1] of the
        result, so a caller without a padding slot loses the last real
        logit. `_window_plan` guarantees this for the shipped caller
        (`_try_window_scatter` asserts it where the true n is known)."""
        from vtaco_tpu.ops import fast_trunk as FT
        from vtaco_tpu.ops.dense_decode import supercell_packed_volume
        from vtaco_tpu.ops.pallas.decode import (
            fused_trunk_window_cn,
            pack_trunk_params,
        )

        box = 1 + self.padding
        if coord_quant:
            p_cn = box * (p_cn.astype(jnp.float32) / 65535.0 - 0.5)
        reso = c_grid.shape[0]
        vol, n1 = supercell_packed_volume(c_grid, S, L)
        packed = pack_trunk_params(trunk_params, with_img=gating != "none",
                                   dtype=jnp.float32)
        kw = dict(reso=reso, n1=n1, padding=self.padding, S=S, tile=tile,
                  L=L, interpret=interpret)
        if gating == "contact":
            logits, nov = fused_trunk_window_cn(
                packed, vol, p_cn, gate_pts=gate_pts, gate_feat=gate_feat,
                gate_valid=gate_valid, **kw)
        elif gating == "tips":
            c_img = FT.gate_tips_cn(p_cn, gate_pts, gate_feat, gate_valid,
                                    dtype=jnp.float32)
            logits, nov = fused_trunk_window_cn(packed, vol, p_cn,
                                                c_img_cn=c_img, **kw)
        else:
            logits, nov = fused_trunk_window_cn(packed, vol, p_cn, **kw)
        # the kernel's overflow sentinel (nonzero → some point's window
        # clamped, its logit garbage) rides the last PADDING slot of the
        # result transfer — a separate scalar fetch would cost a tunnel
        # RTT. `_window_plan` guarantees npad > n; `_try_window_scatter`
        # reads [-1] and falls back to the gather path on nonzero.
        flag = (nov > 0)
        out = self._finalize_logits(logits, out_dtype)
        if out_dtype == "int8":
            q, scale = out
            return q.at[-1].set(flag.astype(jnp.int8)), scale
        return out.at[-1].set(flag.astype(out.dtype))

    def _trunk_fast(self, trunk_params, p_cn, feats, gate_pts, gate_feat,
                    gate_valid, gating, dtype, use_pallas, leaky,
                    pallas_tile):
        """Shared trunk dispatch for the channels-first decode paths:
        (3, N) coords + (C, N) features → (N,) logits via the Pallas fused
        trunk (TPU default, gating fused in) or the XLA trunk."""
        from vtaco_tpu.ops import fast_trunk as FT

        # the Pallas kernel hardcodes ReLU; leaky decoders use the XLA trunk
        if use_pallas and not leaky:
            from vtaco_tpu.ops.pallas.decode import (
                fused_trunk_cn,
                fused_trunk_gated_cn,
                pack_trunk_params,
            )

            # this Mosaic toolchain rejects bf16 MXU dots: the kernel
            # always computes f32; a narrower requested dtype becomes the
            # HBM storage dtype of the streamed operands instead (the
            # measured bf16-streaming mode, DESIGN.md § Pallas verdict)
            narrow = jnp.dtype(dtype).itemsize < 4
            packed = pack_trunk_params(trunk_params, with_img=gating != "none",
                                       dtype=jnp.float32)
            if gating == "contact":
                # gating fused into the kernel: the (5K, nx³) distance
                # field and the (C, nx³) gated features never touch HBM
                # (DESIGN.md § Pallas verdict — fused gating)
                return fused_trunk_gated_cn(
                    packed, p_cn, feats, gate_pts, gate_feat, gate_valid,
                    dtype=jnp.float32,
                    store_dtype=dtype if narrow else None,
                    tile=pallas_tile)
            c_img = None
            if gating == "tips":
                c_img = FT.gate_tips_cn(p_cn, gate_pts, gate_feat,
                                        gate_valid, dtype=dtype)
            return fused_trunk_cn(packed, p_cn, feats, c_img,
                                  dtype=jnp.float32,
                                  store_dtype=dtype if narrow else None,
                                  tile=pallas_tile)
        c_img = None
        if gating == "tips":
            c_img = FT.gate_tips_cn(p_cn, gate_pts, gate_feat, gate_valid,
                                    dtype=dtype)
        elif gating == "contact":
            c_img = FT.gate_contact_cn(p_cn, gate_pts, gate_feat, gate_valid,
                                       dtype=dtype)
        return FT.trunk_cn(trunk_params, p_cn, feats, c_img, dtype=dtype,
                           leaky=leaky)

    def eval_points_dense(self, state, nx, c, gating="none", gate_pts=None,
                          gate_feat=None, gate_valid=None, fast=True,
                          dtype=jnp.float32, return_device=False,
                          transfer_dtype=jnp.bfloat16, use_pallas=None):
        """Dense nx³ decode (single dispatch). Returns host (nx³,) logits
        flattened x-slowest (the make_3d_grid / reference ordering).

        return_device=True skips the host transfer and returns the device
        array (z-slowest flattening for the fast path). The host transfer
        defaults to bf16 — value precision is ample for iso-crossing
        interpolation and it halves the device→host payload.
        """
        if gate_pts is None:
            gate_pts = jnp.zeros((1, 3))
            gate_feat = jnp.zeros((1, 1))
            gate_valid = jnp.zeros((1,), bool)
        if not self._fast_capable():
            # AttentionDecoder-family: both dense impls assume the
            # LocalDecoder trunk (forward_feats) — decode the grid through
            # the chunked module path (decoder.forward/forward_img keep
            # their full semantics, incl. the fusion transformer)
            from vtaco_tpu.ops.geometry import make_3d_grid

            box = 1 + self.padding
            pf = box * np.asarray(
                make_3d_grid((-0.5,) * 3, (0.5,) * 3, (nx,) * 3),
                np.float32,
            )
            vals = self.eval_points(
                state, pf, c, gating, gate_pts, gate_feat, gate_valid,
                transfer_dtype=transfer_dtype, fast=False,
            )
            if return_device:
                return jnp.asarray(vals)
            return np.asarray(vals, np.float32)
        if fast:
            args_t = self._dense_fast_args(state, nx, c, gating, gate_pts,
                                           gate_feat, gate_valid, dtype,
                                           use_pallas)
            if return_device:
                return self._decode_dense_fast(*args_t)
            # transfer cast AND x-major transpose happen in-program: each
            # eager post-jit op is a separate ~30 ms dispatch through the
            # device tunnel, and the host-side 8 MB strided transpose cost
            # tens of ms on one core (docs/DESIGN.md § transfer budget)
            td = jnp.dtype(transfer_dtype)
            td = "int8" if td == jnp.dtype(jnp.int8) else td  # scaled mode
            out = self._decode_dense_fast(*args_t, out_dtype=td,
                                          out_xmajor=True)
            if td == "int8":
                q, scale = out
                return np.asarray(q).astype(np.float32) * float(scale)
            return np.asarray(out).astype(np.float32)
        logits = self._decode_dense(
            self._vars(state), c, gate_pts, gate_feat, gate_valid, nx, gating
        )
        if return_device:
            return logits
        td = _legacy_transfer_dtype(transfer_dtype)
        return np.asarray(logits.astype(td)).astype(np.float32)

    def _band_enabled(self):
        """Resolve ``band_transfer``: 'auto' means TPU backend only (the
        parity/CPU suites default to exact full transfers; the band's
        value is the thin host link). Requires a fast-capable decoder."""
        if not self._fast_capable():
            return False
        if self.band_transfer == "auto":
            return jax.default_backend() == "tpu"
        return bool(self.band_transfer)

    def _band_level_args(self):
        if self.mc_level == "midpoint":
            return "midpoint", 0.0
        if self.mc_level == "mean":
            return "mean", 0.0
        return "const", float(self.mc_level)

    def eval_points_dense_band(self, state, nx, c=None, gating="none",
                               gate_pts=None, gate_feat=None,
                               gate_valid=None, dtype=jnp.float32,
                               cap=None, use_pallas=None, inputs=None,
                               mesh=False):
        """Dense nx³ decode shipping only the iso-band (generate/band.py).

        Returns ``(value_grid, level)``: a host (nx, nx, nx) f32 grid
        whose marching-cubes output at ``level`` is bit-identical to the
        full f32 transfer's, and the in-program iso level (resolved from
        ``self.mc_level``: grid midpoint / mean / fixed logit). Non-band
        vertices hold sign-correct filler (level ± 1) — do NOT use this
        grid for value metrics; it exists for isosurface extraction.
        Band-buffer overflow (count > cap) falls back to the full f32
        transfer (counted in ``self.band_overflows``).

        ``inputs`` (B=1 object cloud) instead of ``c``: the object encode
        runs INSIDE the same program — one dispatch for encode + decode +
        band (the per-object serving path; each extra dispatch costs a
        host-link RTT).

        ``mesh=True`` returns ``(verts, faces, level)`` instead,
        extracting the isosurface straight from the band payload (the
        fused native scanner skips the grid reconstruction entirely).
        """
        from vtaco_tpu.generate.band import band_reconstruct, default_cap

        if not self._fast_capable():
            raise NotImplementedError(
                "the channels-first fast trunk reproduces LocalDecoder "
                f"semantics only; got {type(self.model.decoder).__name__} "
                "(use eval_points(fast=False) / the module decode paths)"
            )
        if gate_pts is None:
            gate_pts = jnp.zeros((1, 3))
            gate_feat = jnp.zeros((1, 1))
            gate_valid = jnp.zeros((1,), bool)
        if cap is None:
            cap = default_cap(nx)
        level_mode, level_const = self._band_level_args()
        if inputs is not None:
            from vtaco_tpu.ops import fast_trunk as FT

            if use_pallas is None:
                use_pallas = self._pallas_enabled()
            decoder = self.model.decoder
            tp = FT.extract_trunk_params(
                state.params["decoder"], decoder.n_blocks,
                with_img=gating != "none",
            )
            raw = self._encode_band(
                self._vars(state), tp, inputs, gate_pts, gate_feat,
                gate_valid, jnp.float32(level_const), nx, gating,
                jnp.dtype(dtype), use_pallas,
                getattr(decoder, "leaky", False), cap=cap,
                level_mode=level_mode,
            )
        else:
            tp_args = self._dense_fast_args(state, nx, c, gating, gate_pts,
                                            gate_feat, gate_valid, dtype,
                                            use_pallas)
            (tp, c_, gp, gf, gv, nx_, gating_, dtype_, up, leaky) = tp_args
            raw = self._decode_dense_band(
                tp, c_, gp, gf, gv, jnp.float32(level_const), nx_, gating_,
                dtype_, up, leaky, cap=cap, level_mode=level_mode,
            )
        count, level, packed, vals = jax.device_get(raw)
        count = int(count)
        level = float(level)
        if count > cap:
            # degenerate field: band larger than the buffer — ship the
            # volume instead (exact same result, fat payload)
            self.band_overflows += 1
            if c is None:
                c = self._apply(state, self.model.encode_inputs, inputs,
                                train=False)
            values = self.eval_points_dense(
                state, nx, c, gating, gate_pts, gate_feat, gate_valid,
                dtype=dtype, transfer_dtype=jnp.float32,
                use_pallas=use_pallas,
            )
            grid = values.reshape(nx, nx, nx)
            if mesh:
                verts, faces = marching_cubes(grid, level=level,
                                              gradient="ascent")
                return verts, faces, level
            return grid, level
        if mesh:
            from vtaco_tpu.generate.band import band_marching_cubes

            verts, faces = band_marching_cubes(nx, level, count, packed,
                                               vals, gradient="ascent")
            return verts, faces, level
        return band_reconstruct(nx, level, count, packed, vals), level

    def _dense_fast_args(self, state, nx, c, gating, gate_pts, gate_feat,
                         gate_valid, dtype, use_pallas):
        """The _decode_dense_fast argument tuple — single source of truth
        shared by the execute (eval_points_dense) and stage
        (lower_dense_fast) paths so cost analysis always describes the
        program that actually runs."""
        from vtaco_tpu.ops import fast_trunk as FT

        if use_pallas is None:
            use_pallas = self._pallas_enabled()
        if gate_pts is None:
            gate_pts = jnp.zeros((1, 3))
            gate_feat = jnp.zeros((1, 1))
            gate_valid = jnp.zeros((1,), bool)
        decoder = self.model.decoder
        tp = FT.extract_trunk_params(
            state.params["decoder"], decoder.n_blocks,
            with_img=gating != "none",
        )
        return (tp, c, gate_pts, gate_feat, gate_valid, nx, gating, dtype,
                use_pallas, getattr(decoder, "leaky", False))

    def lower_dense_fast(self, state, nx, c, gating="none", gate_pts=None,
                         gate_feat=None, gate_valid=None, dtype=jnp.float32,
                         use_pallas=None):
        """jax.stage the fast dense-decode program (no execution) — for
        cost analysis / AOT inspection."""
        return self._decode_dense_fast.lower(
            *self._dense_fast_args(state, nx, c, gating, gate_pts, gate_feat,
                                   gate_valid, dtype, use_pallas)
        )

    @staticmethod
    def _scatter_bucket(n: int, align: int = 2048) -> int:
        """Pad count for the scattered fast decode: the next {1, 1.5}·2^k
        multiple of ``align`` ≥ n. Each distinct padded size is a separate
        trace/compile (static shapes), so arbitrary N snaps to a geometric
        bucket grid — ≤33% padded compute, O(log N) programs ever built."""
        n = max(int(n), align)
        p = 1 << (n - 1).bit_length()                  # next pow2 ≥ n
        cand = p if p // 4 * 3 < n else p // 4 * 3     # 1.5·2^(k-2) step
        return max(align, -(-cand // align) * align)

    def _pooled(self, key, shape, dtype):
        """Reusable host upload/packing buffer.

        Fresh large numpy allocations on this host class pay a
        pathological cold-page-fault cost (measured 80 MB/s cold vs
        6 GB/s warm, session-dependent) — the serving paths' per-call
        (3, npad) packing buffers alone cost hundreds of ms per flight.
        Shapes are sticky-bucketed, so one buffer per key amortizes to
        zero. SAFETY: callers must fully overwrite the buffer and must
        not hold the previous call's view across a reuse (every shipped
        caller consumes the upload synchronously before returning).
        """
        pool = getattr(self, "_upload_pool", None)
        if pool is None:
            pool = self._upload_pool = {}
        buf = pool.get(key)
        if buf is None or buf.shape != tuple(shape) or buf.dtype != dtype:
            buf = pool[key] = np.empty(shape, dtype)
        return buf

    def _sticky_bucket(self, sig, n: int) -> int:
        """Bucket with compile-reuse hysteresis: if a bucket already
        compiled for ``sig`` (a hashable program signature) is within 2×
        of the fresh bucket for ``n``, pad up to it instead of compiling
        a new program. MISE refinement query counts drift a few percent
        between objects/levels/requests; without this every drift across
        a bucket edge pays a multi-second (remote: multi-minute) XLA
        compile to save ≤2× of a sub-second padded decode."""
        b = self._scatter_bucket(n)
        used = self._buckets_used.setdefault(sig, set())
        cands = [u for u in used if b <= u <= 2 * b]
        if cands:
            return min(cands)
        used.add(b)
        return b

    @staticmethod
    def _estimate_lattice_reso(p, box, max_reso=4096):
        """Sampled denominator estimate for grid-structured query sets: if
        every sampled coordinate looks like ``box·(i/R − 0.5)`` for one
        R ≤ max_reso, return R, else None. A sample can only
        under-estimate R (by missing finer points); the fused
        convert+verify pass rejects those encodings, so a wrong estimate
        costs one wasted host pass, never wrong results."""
        from fractions import Fraction
        from math import gcd

        s = np.asarray(p, np.float64).reshape(-1, 3)
        if s.size == 0:
            return None
        # sample whole ROWS so every axis is represented: a flat-array
        # stride that lands on a multiple of 3 (e.g. N=196608) would
        # sample the x column only and miss finer structure on y/z
        vals = (s[:: max(1, len(s) // 64)][:64] / box + 0.5).reshape(-1)
        # negated in-range form: NaN/inf fail the comparison (a plain
        # min()<lo check is False for NaN and would slip through into
        # Fraction(), which raises on non-finite input)
        if not (vals.min() >= -1e-6 and vals.max() <= 1 + 1e-6):
            return None
        reso = 1
        for v in vals:
            f = Fraction(float(v)).limit_denominator(max_reso)
            if abs(float(f) - v) > 1e-5:
                return None
            reso = reso * f.denominator // gcd(reso, f.denominator)
            if reso > max_reso:
                return None
        return reso

    def _lattice_encode_host(self, p, box, reso, npad):
        """(N, 3) f32 world coords → ((3, npad) uint8/int16 lattice
        array, max residual in lattice units). One fused native pass
        (convert+verify+transpose ≈15 ms at 2.1M points on this host's
        single core) into a POOLED buffer (the tail beyond n is
        uninitialized — callers pad it); numpy fallback if the
        extension can't build. Out-of-range coords poison the residual
        → caller falls back."""
        n = len(p)
        try:
            from vtaco_tpu.native import geom

            dt = np.uint8 if reso <= 255 else np.int16
            buf = self._pooled(("lat_enc", dt.__name__, npad),
                               (3, npad), dt)
            return geom.lattice_encode(p, box, reso, npad, out=buf)
        except Exception:
            w = np.asarray(p, np.float32).T * (reso / box) + 0.5 * reso
            r = np.rint(w)
            ok = n == 0 or bool(np.isfinite(w).all())
            resid = float(np.abs(w - r).max()) if (n and ok) else 0.0
            if n and not (ok and r.min() >= 0 and r.max() <= reso):
                resid = 1e9  # NaN/inf/out-of-range: force rejection
            out = np.zeros((3, npad), np.uint8 if reso <= 255 else np.int16)
            out[:, :n] = np.where(np.isfinite(r), r, 0)
            return out, resid

    @staticmethod
    def _full_grid_order(pts_cn, n, R1):
        """Is the (3, ≥n) integer lattice array exactly the complete R1³
        cube in a canonical flattening? Returns ``True`` for x-slowest /
        z-fastest (``np.meshgrid(..., indexing='ij')`` / the reference's
        make_3d_grid order, src/common.py), ``False`` for the dense
        path's internal x-fastest order, ``None`` for anything else
        (subset, permutation, other axis order). Cheap spot checks on the
        fastest axis reject non-matches before the full O(N) verify."""
        if n != R1 ** 3:  # a truncated cube still matches arange(n)
            return None
        x = pts_cn[0, :n]
        y = pts_cn[1, :n]
        z = pts_cn[2, :n]
        m = min(R1, n)
        head = np.arange(m, dtype=pts_cn.dtype)
        for fast_axis, xmajor in ((z, True), (x, False)):
            if not np.array_equal(fast_axis[:m], head):
                continue
            a, b = (x, z) if xmajor else (z, x)
            f = (a.astype(np.int64) * R1 + y) * R1 + b
            if np.array_equal(f, np.arange(n, dtype=np.int64)):
                return xmajor
        return None

    def _eval_points_dense_ordered(self, state, nx, xmajor, c, gating,
                                   gate_pts, gate_feat, gate_valid,
                                   transfer_dtype, dtype=jnp.float32,
                                   use_pallas=None):
        """Dense nx³ decode finalized to host f32 logits in the caller's
        flattening (``xmajor``, see _full_grid_order) — the zero-upload
        backend for complete-cube query sets arriving through the
        scattered API (eval_points / eval_points_fast)."""
        args_t = self._dense_fast_args(state, nx, c, gating, gate_pts,
                                       gate_feat, gate_valid, dtype,
                                       use_pallas)
        td = jnp.dtype(transfer_dtype)
        td = "int8" if td == jnp.dtype(jnp.int8) else td  # scaled mode
        out = self._decode_dense_fast(*args_t, out_dtype=td,
                                      out_xmajor=xmajor)
        if td == "int8":
            q, scale = out
            return np.asarray(q).astype(np.float32) * float(scale)
        return np.asarray(out).astype(np.float32)

    def _try_full_grid(self, state, pf, c, gating, gate_pts, gate_feat,
                       gate_valid, transfer_dtype, dtype, use_pallas):
        """Detect complete-cube f32 query sets — the reference's own
        eval_points callers pass exactly these (make_3d_grid dense
        requests, generation.py:338-383) — and decode them through the
        separable dense path: coords are synthesized IN-PROGRAM, so the
        (3, N) coordinate upload (the scattered path's dominant cost
        through a thin host↔device link) disappears entirely. Returns
        host (N,) f32 logits in the caller's point order, or None if the
        set isn't a canonical complete cube (caller falls back to the
        compact-coord scattered path)."""
        n = len(pf)
        if n < 8 or not np.issubdtype(pf.dtype, np.floating):
            return None
        R1 = int(round(n ** (1 / 3)))
        if R1 ** 3 != n or not 2 <= R1 <= 4097:
            return None
        box = 1 + self.padding
        # encode directly at the implied reso — verify-or-reject, so a
        # wrong guess costs one ~15 ms/2.1M-pt host pass, never wrong
        # results (same contract as the sampled estimate)
        cand, resid = self._lattice_encode_host(pf, box, R1 - 1, n)
        if resid > 1e-3:
            return None
        xmajor = self._full_grid_order(cand, n, R1)
        if xmajor is None:
            return None
        return self._eval_points_dense_ordered(
            state, R1, xmajor, c, gating, gate_pts, gate_feat, gate_valid,
            transfer_dtype, dtype=dtype, use_pallas=use_pallas)

    def eval_points_fast(self, state, pointsf, c, gating="none",
                         gate_pts=None, gate_feat=None, gate_valid=None,
                         transfer_dtype=jnp.bfloat16, dtype=jnp.float32,
                         use_pallas=None, lattice_reso=None,
                         coord_quant=None, detect_lattice=True,
                         detect_dense=True):
        """Scattered decode over (N, 3) host points through the
        channels-first fast trunk (Pallas on TPU): ONE dispatch — gather
        interpolation + (fused) gating + MLP — and one ``transfer_dtype``
        result transfer. Points are zero-padded to a size bucket
        (:meth:`_scatter_bucket`); padded logits are sliced off.

        ``lattice_reso=R``: ``pointsf`` is an integer (N, 3) lattice-point
        array (world coords ``box·(p/R − 0.5)`` computed in-program —
        exact to f32 roundoff; uint8 upload at R ≤ 255, 3 B/pt, else
        int16). ``coord_quant``: quantize world coords to uint16 on
        the host (error ≤ 8.4e-6 world units, half the upload; for
        tunnel-bound serving). ``True`` forces it (skips detection);
        ``None`` (default) defers to the generator's setting — 'auto'
        quantizes on TPU only, AFTER the lossless compact encodings
        below have been tried. ``detect_lattice`` (default): f32 inputs
        that ARE a lattice — dense grids, MISE refinement levels — are
        detected (sampled denominator estimate + fused native
        convert/verify pass) and take the compact upload automatically;
        points within 1e-3·(box/R) of a node snap to it, anything else
        keeps the exact f32 path. ``detect_dense`` (default): query sets
        that are a COMPLETE cube in a canonical order — exactly what the
        reference's make_3d_grid callers pass through this API
        (generation.py:338-383) — skip the coordinate upload entirely and
        decode through the separable dense path (_try_full_grid)."""
        if not self._fast_capable():
            raise NotImplementedError(
                "the channels-first fast trunk reproduces LocalDecoder "
                f"semantics only; got {type(self.model.decoder).__name__} "
                "(use eval_points(fast=False) / the module decode paths)"
            )
        if use_pallas is None:
            use_pallas = self._pallas_enabled()
        if gate_pts is None:
            gate_pts = jnp.zeros((1, 3))
            gate_feat = jnp.zeros((1, 1))
            gate_valid = jnp.zeros((1,), bool)
        from vtaco_tpu.ops import fast_trunk as FT

        decoder = self.model.decoder
        tp = FT.extract_trunk_params(
            state.params["decoder"], decoder.n_blocks,
            with_img=gating != "none",
        )
        n = pointsf.shape[0]
        if n == 0:  # lattice/window planners index keys[-1]; skip them
            return np.zeros(0, np.float32)
        box = 1 + self.padding
        pf = np.asarray(pointsf)
        dt_name = jnp.dtype(dtype).name
        pts = None
        if coord_quant is None:
            # generator-level 'auto': lossy uint16 only as the FALLBACK
            # for non-lattice f32 uploads — the lossless compact
            # encodings (lattice / dense-cube) still get first refusal
            coord_quant = False
            quant_fallback = self._coord_quant_enabled()
        else:
            quant_fallback = False
        if (lattice_reso is None and not coord_quant and detect_lattice
                and np.issubdtype(pf.dtype, np.floating)):
            if detect_dense:
                out = self._try_full_grid(
                    state, pf, c, gating, gate_pts, gate_feat, gate_valid,
                    transfer_dtype, dtype, use_pallas)
                if out is not None:
                    return out
            reso = self._estimate_lattice_reso(pf, box)
            if reso is not None:
                sdt = "u8" if reso <= 255 else "i16"
                npad = self._sticky_bucket(
                    ("scatter", gating, "lattice", sdt, dt_name), n)
                cand, resid = self._lattice_encode_host(pf, box, reso, npad)
                if resid <= 1e-3:
                    pts, lattice_reso = cand, reso
        if pts is None and lattice_reso is None:
            out = self._try_window_scatter(
                state, tp, pf, n, c, gating, gate_pts, gate_feat,
                gate_valid, transfer_dtype, use_pallas,
                leaky=getattr(decoder, "leaky", False),
                quantize=coord_quant or quant_fallback,
            )
            if out is not None:
                return out
        if pts is not None:
            pass
        elif lattice_reso is not None:
            li = pf
            if (detect_dense and np.issubdtype(li.dtype, np.integer)
                    and n == (lattice_reso + 1) ** 3):
                xm = self._full_grid_order(
                    np.ascontiguousarray(li.T), n, lattice_reso + 1)
                if xm is not None:
                    return self._eval_points_dense_ordered(
                        state, lattice_reso + 1, xm, c, gating, gate_pts,
                        gate_feat, gate_valid, transfer_dtype, dtype=dtype,
                        use_pallas=use_pallas)
            u8 = (lattice_reso <= 255 and li.size
                  and li.min() >= 0 and li.max() <= 255)
            npad = self._sticky_bucket(
                ("scatter", gating, "lattice", "u8" if u8 else "i16",
                 dt_name), n)
            pdt = np.uint8 if u8 else np.int16
            pts = self._pooled(("sc_lat", pdt.__name__, npad),
                               (3, npad), pdt)
            pts[:, :n] = li.astype(pdt).T
        elif coord_quant or quant_fallback:
            coord_quant = True  # static arg for the in-program dequant
            npad = self._sticky_bucket(
                ("scatter", gating, "quant", dt_name), n)
            u = pf.astype(np.float32).T / box + 0.5
            pts = self._pooled(("sc_quant", npad), (3, npad), np.uint16)
            pts[:, :n] = np.round(np.clip(u, 0.0, 1.0) * 65535.0)
        else:
            npad = self._sticky_bucket(
                ("scatter", gating, "f32", dt_name), n)
            pts = self._pooled(("sc_f32", npad), (3, npad), np.float32)
            pts[:, :n] = pf.astype(np.float32, copy=False).T
        if 0 < n < pts.shape[1]:
            # pad with copies of the last real point, not zeros: the int8
            # transfer's quantization scale is max|logit| over the PADDED
            # program output, and a box-center zero point can carry a
            # larger logit than any real query — inflating the scale and
            # coarsening every returned value
            pts[:, n:] = pts[:, n - 1 : n]
        td = jnp.dtype(transfer_dtype)
        td = "int8" if td == jnp.dtype(jnp.int8) else td  # scaled mode
        # host numpy goes straight into the dispatch: a separate
        # device_put is one more tunnel round trip (measured +0.2 s on
        # the 24 MB f32 upload)
        out = self._decode_scatter_fast(
            tp, pts, c, gate_pts, gate_feat, gate_valid,
            gating=gating, dtype=dtype, use_pallas=use_pallas,
            leaky=getattr(decoder, "leaky", False),
            out_dtype=td, lattice_reso=lattice_reso,
            coord_quant=coord_quant,
        )
        if td == "int8":
            q, scale = out
            # transfer the padded tail too — a device-side slice would be
            # one more dispatch, costlier than the extra bytes here
            return np.asarray(q).astype(np.float32)[:n] * float(scale)
        return np.asarray(out).astype(np.float32)[:n]

    def _window_keys_host(self, pf32, reso, L=1):
        """Exact numpy replica of ops.dense_decode.supercell_keys over
        (N, 3) f32 points — elementwise IEEE f32 ops only (div, add,
        mult, floor, min/max, where), which XLA lowers exactly (no FMA
        pattern exists in these expressions), so host keys == device
        keys bit-for-bit and the host can guarantee window membership
        before dispatching (validated on hardware; the kernel clamps to
        the window edge as a final backstop)."""
        n1 = -(-(reso - 1) // L)
        box_eps = np.float32(1 + self.padding + 10e-4)
        u = pf32 / box_eps + np.float32(0.5)
        u = np.where(u >= 1.0, np.float32(1 - 10e-4),
                     np.maximum(u, np.float32(0.0)))
        x = np.clip(u * np.float32(reso - 1), np.float32(0.0),
                    np.float32(reso - 1))
        x0 = np.minimum(np.floor(x), reso - 2).astype(np.int32)
        s = x0 // L                                   # (N, 3) supers
        return s[:, 0] + n1 * (s[:, 1] + n1 * s[:, 2]), n1

    def _window_sort(self, pf32, reso, L, quantize):
        """Counting-sort (n, 3) f32 points by super-cell key: native
        one-pass C++ (vtaco_window_keys_sort, ~40 ms at 2.1M points)
        with a numpy argsort fallback (~330 ms on this 1-core host).
        Returns (keys_sorted, order, n1), or (None, None, n1) for
        non-finite coords (caller falls back to the gather path)."""
        n = pf32.shape[0]
        try:
            from vtaco_tpu.native import geom as _geom

            lib = _geom._ensure() if hasattr(_geom, "_ensure") else None
        except Exception:
            lib = None
        if lib is not None and pf32.flags["C_CONTIGUOUS"]:
            import ctypes

            keys_s = np.empty(n, np.int32)
            order = np.empty(n, np.int32)
            c_f = ctypes.POINTER(ctypes.c_float)
            c_i = ctypes.POINTER(ctypes.c_int32)
            n1 = lib.vtaco_window_keys_sort(
                pf32.ctypes.data_as(c_f), n, int(reso), int(L),
                ctypes.c_float(np.float32(1 + self.padding)),
                ctypes.c_float(np.float32(1 + self.padding + 10e-4)),
                int(bool(quantize)),
                keys_s.ctypes.data_as(c_i), order.ctypes.data_as(c_i),
            )
            if n1 > 0:
                return keys_s, order, n1
            return None, None, 0
        if quantize:
            box = np.float32(1 + self.padding)
            u = pf32 / box + np.float32(0.5)
            q = np.round(np.clip(u, np.float32(0.0), np.float32(1.0))
                         * np.float32(65535.0))
            key_src = box * (q.astype(np.float32) / np.float32(65535.0)
                             - np.float32(0.5))
        else:
            key_src = pf32
        keys, n1 = self._window_keys_host(key_src, reso, L)
        if keys.min() < 0 or keys.max() >= n1 ** 3:
            return None, None, n1
        order = np.argsort(keys, kind="stable").astype(np.int32)
        return keys[order], order, n1

    def _window_payload(self, pf32, order, npad, quantize):
        """Sorted (3, npad) channels-first dispatch payload (f32, or
        uint16 when quantize), pad columns = last real point."""
        n = pf32.shape[0]
        dt = np.uint16 if quantize else np.float32
        try:
            from vtaco_tpu.native import geom as _geom

            lib = _geom._ensure()
        except Exception:
            lib = None
        if lib is not None and pf32.flags["C_CONTIGUOUS"]:
            import ctypes

            out = self._pooled(("win_pay", dt.__name__, npad),
                               (3, npad), dt)
            c_f = ctypes.POINTER(ctypes.c_float)
            c_i = ctypes.POINTER(ctypes.c_int32)
            lib.vtaco_window_permute(
                pf32.ctypes.data_as(c_f), n, order.ctypes.data_as(c_i),
                npad, int(bool(quantize)),
                ctypes.c_float(np.float32(1 + self.padding)),
                out.ctypes.data_as(ctypes.c_void_p),
            )
            return out
        if quantize:
            box = np.float32(1 + self.padding)
            u = pf32 / box + np.float32(0.5)
            payload = np.round(
                np.clip(u, np.float32(0.0), np.float32(1.0))
                * np.float32(65535.0)).astype(np.uint16)
        else:
            payload = pf32
        out = self._pooled(("win_pay", dt.__name__, npad), (3, npad), dt)
        out[:, :n] = payload[order].T
        if n < npad:
            out[:, n:] = out[:, n - 1:n]
        return out

    def _window_plan(self, pf32, reso, n, bucket_sig, quantize=False):
        """Pick the cheapest (L, tile) whose 2S window provably contains
        every tile's sorted span — selection flops scale with the
        (L+1)³C payload, so L=1 (plain cells) first; smaller tiles
        shrink spans. Returns (L, tile, npad, sort_order) or None when
        no candidate fits (sparse/small query sets → gather path)."""
        S = self.window_S
        for L in (1, 2):
            keys_s, order, n1 = self._window_sort(pf32, reso, L, quantize)
            if keys_s is None:
                return None
            n_cols = max(2 * S, -(-(n1 ** 3) // S) * S)
            n_blk = n_cols // S
            for tile in (self.window_tile, self.window_tile // 2,
                         self.window_tile // 4):
                npad = self._sticky_bucket((*bucket_sig, L, tile), n)
                npad = -(-npad // tile) * tile
                if npad == n:  # overflow sentinel needs a padding slot
                    npad += tile
                keys_pad = np.empty(npad, np.int32)
                keys_pad[:n] = keys_s
                keys_pad[n:] = keys_s[-1]
                kblk = np.clip(keys_pad[::tile] // S, 0, n_blk - 2)
                local = keys_pad.reshape(-1, tile) - (kblk * S)[:, None]
                if local.min() >= 0 and local.max() < 2 * S:
                    return L, tile, npad, order
        return None

    def _try_window_scatter(self, state, tp, pf, n, c, gating, gate_pts,
                            gate_feat, gate_valid, transfer_dtype,
                            use_pallas, leaky, quantize):
        """Host side of the sorted windowed scatter decode (VERDICT r3
        #2): sort non-lattice queries by super-cell id so the Pallas
        window kernel replaces the row-issue-bound corner gather
        (~49 ms → one MXU one-hot dot at 2.1M points). Returns the (n,)
        f32 logits in the CALLER's order, or None when the path doesn't
        apply — plane features present, Pallas off / leaky decoder, or
        some tile's points span more supers than the 2S window (exact
        host check on the very keys the kernel recomputes; sparse or
        small query sets fall back to the gather path untouched)."""
        if not use_pallas or leaky or gating not in ("none", "tips",
                                                     "contact"):
            return None
        keys_c = {k for k in c if k in ("grid", "xz", "xy", "yz")}
        if keys_c != {"grid"}:
            return None
        g = c["grid"]
        if g.ndim == 5:
            g = g[0]
        reso = g.shape[0]
        if not (g.shape[0] == g.shape[1] == g.shape[2]) or reso < 4:
            return None
        pf32 = np.ascontiguousarray(pf, np.float32)
        chosen = self._window_plan(pf32, reso, n,
                                   ("scatter", gating, "window",
                                    "quant" if quantize else "f32"),
                                   quantize)
        if chosen is None:
            return None                    # window overrun → gather path
        L, tile, npad, order = chosen
        # the kernel impl overwrites slot [-1] with its overflow sentinel
        # (see _decode_scatter_window_impl): a padding slot MUST exist or
        # the last real point's logit is silently lost
        assert npad > n, (npad, n)
        pts_cn = self._window_payload(pf32, order, npad, quantize)

        td = jnp.dtype(transfer_dtype)
        td = "int8" if td == jnp.dtype(jnp.int8) else td
        out = self._decode_scatter_window(
            tp, pts_cn, g, gate_pts, gate_feat, gate_valid,
            gating=gating, S=self.window_S, tile=tile, L=L, out_dtype=td,
            coord_quant=quantize, interpret=self.window_interpret,
        )
        if td == "int8":
            qv, scale = out
            arr = np.asarray(qv)
            sorted_logits = arr.astype(np.float32)[:n] * float(scale)
        else:
            arr = np.asarray(out)
            sorted_logits = arr.astype(np.float32)[:n]
        if arr[-1] != 0:
            # kernel-side window overflow (host/device key divergence —
            # e.g. a toolchain FMA-contraction change): logits unsafe,
            # fall back to the gather path
            return None
        res = np.empty(n, np.float32)
        res[order] = sorted_logits
        return res

    def eval_points(self, state, pointsf, c, gating="none", gate_pts=None,
                    gate_feat=None, gate_valid=None,
                    transfer_dtype=jnp.bfloat16, fast=None):
        """Chunked occupancy decode over (N, 3) host points → (N,) logits.

        The reference's hot loop (generation.py:338-383) with the
        per-point feature gating fused in. By default (``fast=None``)
        non-crop inputs route through :meth:`eval_points_fast` — the
        channels-first corner-packed-gather + fused-trunk path, one
        dispatch and one bf16 transfer (2.1M points: 59 ms device vs the
        legacy chunked loop's ~190 ms; inclusive latency is bound by the
        24 MB f32 coord upload — see the lattice/quant modes there).
        ``fast=False`` forces the legacy (N, C)-layout chunked path
        (lax.map over chunk stacks — still one dispatch, but gather
        interp + gating materialize full-width intermediates). Crop-mode
        inputs always use the legacy path (per-crop coordinate
        normalization).
        """
        variables = self._vars(state)
        n = pointsf.shape[0]
        bs = self.points_batch_size
        crop_mode = self.input_type == "pointcloud_crop"
        if fast is None:
            fast = not crop_mode and self._fast_capable()
        if fast and not crop_mode:
            lim = self.scatter_slice_points
            if n <= lim:
                return self.eval_points_fast(
                    state, pointsf, c, gating, gate_pts, gate_feat,
                    gate_valid, transfer_dtype=transfer_dtype,
                )
            # complete-cube query sets above the slice limit (e.g. a full
            # 256³ grid through this API) go through the separable dense
            # path whole: no coord upload, no (N, 8C) gather intermediate,
            # one dispatch (the dense path's memory scales with nx³·C)
            pf = np.asarray(pointsf)
            if np.issubdtype(pf.dtype, np.floating):
                out = self._try_full_grid(
                    state, pf, c, gating, gate_pts, gate_feat, gate_valid,
                    transfer_dtype, jnp.float32, None)
                if out is not None:
                    return out
            # bound the device intermediates: the fast path's corner-packed
            # row-take materializes (N, 8C) f32 (~17 GB in one piece at
            # 256³) — slice into lim-point fast decodes, one dispatch each
            # (slices of a lattice stay lattice, so the compact-coord
            # detection still applies per slice)
            return np.concatenate([
                self.eval_points_fast(
                    state, pointsf[i : i + lim], c, gating, gate_pts,
                    gate_feat, gate_valid, transfer_dtype=transfer_dtype,
                )
                for i in range(0, n, lim)
            ])
        if gate_pts is None:
            gate_pts = jnp.zeros((1, 3))
            gate_feat = jnp.zeros((1, 1))
            gate_valid = jnp.zeros((1,), bool)
        if not crop_mode and n > bs:
            # single-dispatch path: stack padded chunks, lax.map on device.
            # Each distinct chunk count k is a separate trace/compile; for
            # large inputs round k to a multiple of 8 so resolution sweeps
            # reuse programs (≤21% padded-chunk overhead at k=33, shrinking
            # with k). Small/typical k (e.g. 21 for the 128³ grid) stays
            # exact — no wasted compute on the common path.
            k = -(-n // bs)
            if k > 32:
                k = -(-k // 8) * 8
            pts = np.zeros((k * bs, 3), np.float32)
            pts[:n] = np.asarray(pointsf, np.float32)
            logits = self._decode_chunks_scan(
                variables, jnp.asarray(pts.reshape(k, bs, 3)), c,
                gate_pts, gate_feat, gate_valid, gating,
            )
            host = np.asarray(logits.astype(_legacy_transfer_dtype(transfer_dtype)))
            return host.astype(np.float32).reshape(-1)[:n]
        outs = []
        for i in range(0, n, bs):
            chunk = jnp.asarray(pointsf[i : i + bs])
            pad = 0
            if chunk.shape[0] < bs and i > 0:
                pad = bs - chunk.shape[0]
                chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
            if crop_mode:
                # whole-scene crop decode (generation.py:356-366); the
                # reference's sliding-window branch calls an undefined
                # predict_crop_occ — only this sub-path ever worked.
                from vtaco_tpu.ops.geometry import normalize_coord

                p_n = {
                    key: jnp.asarray(
                        normalize_coord(np.asarray(chunk), self.input_vol,
                                        plane=key)
                    )[None]
                    for key in c.keys()
                }
                pi_in = {"p": chunk[None], "p_n": p_n}
                logits = self.model.apply(
                    variables, pi_in, c, method=self.model.decode
                )[0]
            else:
                logits = self._decode_chunk(
                    variables, chunk, c, gate_pts, gate_feat, gate_valid,
                    gating,
                )
            # same transfer_dtype contract as the single-dispatch path:
            # result precision depends on the argument, not the input size
            out_i = logits[: chunk.shape[0] - pad if pad else None]
            outs.append(
                np.asarray(
                    out_i.astype(_legacy_transfer_dtype(transfer_dtype))
                ).astype(np.float32)
            )
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "H", "W"))
    def _prep_contact_gates(self, gt_depths, pred_depths, d_origin, touch,
                            cam_rot, cam_pos, pc_ply, H, W, seed=0):
        """Per-finger contact clouds for gating (generation.py:225-246).

        gt/pred depths (5, H*W); touch (5,); cam_rot/pos (5, 3); returns
        ((5, K, 3) normalized contact points, (5, K) validity).

        ``seed`` drives the >contact_per_finger pixel subsampling. The
        reference draws fresh np.random subsets per call; the default here
        is deterministic (reproducible serving) — pass a per-sample seed to
        recover the reference's averaged-over-subsets behavior."""
        import math

        dmaps = gt_depths if self.legacy_gt_depth else (
            pred_depths * 0.005 + 0.019
        )
        f = H / (2 * math.tan(math.radians(CAM_FOV / 2)))
        rng = jax.random.PRNGKey(seed)
        rot_off = jnp.array([-jnp.pi / 2, 0.0, jnp.pi / 2])
        pts_f, val_f = [], []
        for f_idx in range(5):
            diff = jnp.abs(dmaps[f_idx] - d_origin) > 0.0001
            mask = diff & touch[f_idx]
            idx, valid = C.random_topk_select(
                mask, self.contact_per_finger, jax.random.fold_in(rng, f_idx)
            )
            cloud = C.backproject_depth(dmaps[f_idx].reshape(H, W), f, W, H)
            world = pc_cam_to_world(
                cloud[idx], cam_rot[f_idx] + rot_off, cam_pos[f_idx]
            )
            pts_f.append(norm_pc_1(world, pc_ply))
            val_f.append(valid)
        return jnp.stack(pts_f), jnp.stack(val_f)

    # ------------------------------------------------------------------
    def eval_points_dense_sharded(self, state, nx, c, device_mesh,
                                  dtype=jnp.float32):
        """Single-object dense decode with the *query-point axis* sharded
        across the mesh's 'data' chips — the occupancy network's natural
        sequence parallelism (SURVEY.md §2.8/§5): each chip upsamples and
        decodes a z-slab of the grid; the host gathers logits for marching
        cubes. Feature fields are replicated (33 MB); no collectives are
        needed until the final gather.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vtaco_tpu.ops import fast_trunk as FT
        from vtaco_tpu.ops.dense_decode import (
            _axis_interp_matrix,
            dense_query_grid_cn,
        )

        n_dev = device_mesh.shape["data"]
        assert nx % n_dev == 0, (nx, n_dev)
        tp = FT.extract_trunk_params(
            state.params["decoder"], self.model.decoder.n_blocks,
            with_img=False,
        )
        leaky = getattr(self.model.decoder, "leaky", False)
        box_size = 1 + self.padding

        key = ("sharded", nx, n_dev, jnp.dtype(dtype).name)
        cache = getattr(self, "_sharded_cache", None)
        if cache is None:
            cache = self._sharded_cache = {}
        if key not in cache:
            def fn(tp, c, Wz_shard, p_shard):
                # per-shard z-interp rows → (C, dz, ny, nxq) → trunk
                g = c["grid"]
                if g.ndim == 5:
                    g = g[0]
                g = jnp.transpose(g.astype(dtype), (3, 0, 1, 2))  # (C,Z,Y,X)
                R = g.shape[1]
                Wfull = jnp.asarray(
                    _axis_interp_matrix(nx, R, box_size, self.padding, True),
                    dtype,
                )
                g1 = jnp.einsum("iz,czyx->ciyx", Wz_shard, g)
                g2 = jnp.einsum("jy,ciyx->cijx", Wfull, g1)
                g3 = jnp.einsum("kx,cijx->cijk", Wfull, g2)
                feats = g3.reshape(g3.shape[0], -1)
                return FT.trunk_cn(tp, p_shard, feats, dtype=dtype,
                                   leaky=leaky)

            cache[key] = jax.jit(
                fn,
                in_shardings=(
                    NamedSharding(device_mesh, P()),
                    NamedSharding(device_mesh, P()),
                    NamedSharding(device_mesh, P("data", None)),
                    NamedSharding(device_mesh, P(None, "data")),
                ),
                out_shardings=NamedSharding(device_mesh, P("data")),
            )
        p_cn = dense_query_grid_cn(nx, box_size)
        # z-interp rows shard on the query-z axis; points shard to match
        R = c["grid"].shape[0] if c["grid"].ndim == 4 else c["grid"].shape[1]
        Wz = jnp.asarray(
            _axis_interp_matrix(nx, R, box_size, self.padding, True), dtype
        )
        logits = cache[key](tp, c, Wz, jnp.asarray(p_cn))
        host = np.asarray(logits.astype(jnp.bfloat16)).astype(np.float32)
        return np.ascontiguousarray(
            host.reshape(nx, nx, nx).transpose(2, 1, 0)
        ).reshape(-1)

    # ------------------------------------------------------------------
    def decode_dense_batched(self, state, nx, c_batched, device_mesh=None,
                             dtype=jnp.float32, return_device=False,
                             use_pallas=None, transfer_dtype=jnp.bfloat16):
        """Data-parallel batched dense decode: (B, ...) feature fields →
        (B, nx³) logits, vmapped per sample and (optionally) sharded over
        the mesh's 'data' axis — the batched multi-object inference mode
        the single-GPU reference lacks.

        ``return_device=True`` returns the device array WITHOUT blocking —
        the dispatch stays asynchronous, so callers can overlap host work
        (marching cubes) with the device computation. ``transfer_dtype``
        is applied in-program: bf16 (default) halves the (B, nx³) payload;
        ``jnp.int8`` quantizes per object (scale = max|logit|/127, quarter
        payload — ample for iso-crossing interpolation).

        On TPU the vmapped Pallas trunk is the default (use_pallas=None →
        the generator's 'auto' setting): measured at B=8×128³ on v5e it
        serves 136.9 M pts/s in exact f32 vs 129.5 M for the XLA trunk in
        bf16, while the vmapped XLA *f32* program crashes the remote
        compiler at that size. Because this Mosaic toolchain rejects bf16
        MXU dots, the kernel always computes in f32 — a requested bf16
        ``dtype`` only shapes the XLA fallback and the host transfer
        (which stays bf16 either way).

        Gating-free path (plain occupancy decode); per-sample tactile
        gating uses generate_obj_mesh_wnf per item.
        """
        from vtaco_tpu.ops import fast_trunk as FT

        if not self._fast_capable():
            raise NotImplementedError(
                "decode_dense_batched requires a LocalDecoder-family "
                "decoder (the fast trunk cannot reproduce "
                f"{type(self.model.decoder).__name__}); decode per object "
                "via generate_obj_mesh_wnf / eval_points instead"
            )
        tp = FT.extract_trunk_params(
            state.params["decoder"], self.model.decoder.n_blocks,
            with_img=False,
        )
        leaky = getattr(self.model.decoder, "leaky", False)
        if use_pallas is None:
            use_pallas = self._pallas_enabled()
        use_pallas = bool(use_pallas) and not leaky
        if use_pallas:
            dtype = jnp.float32  # Mosaic rejects bf16 MXU dots (DESIGN.md)
        td = jnp.dtype(transfer_dtype)
        quant = td == jnp.dtype(jnp.int8)  # per-object scaled int8 mode
        cache = getattr(self, "_decode_dense_vmapped", None)
        if cache is None:
            cache = self._decode_dense_vmapped = {}
        key = (nx, jnp.dtype(dtype).name, use_pallas, td.name)
        if key not in cache:
            def one(tp, c):
                # x-major reorder and the transfer cast (bf16 default,
                # per-object-scaled int8 quarter payload) happen per object
                # IN-PROGRAM via out_xmajor/out_dtype (_finalize_logits):
                # a post-jit cast costs another dispatch, and batch-wide
                # f32 intermediates at 256³×B never materialize
                return self._decode_dense_fast_impl(
                    tp, c, jnp.zeros((1, 3)), jnp.zeros((1, 1)),
                    jnp.zeros((1,), bool), nx=nx, gating="none", dtype=dtype,
                    use_pallas=use_pallas, leaky=leaky,
                    # under vmap, Mosaic compiles crash below tile 4096
                    # (ops/pallas/decode.py docstring) — pin it
                    pallas_tile=4096 if use_pallas else None,
                    out_dtype="int8" if quant else td, out_xmajor=True,
                )

            def batched(tp, cB):
                B = jax.tree_util.tree_leaves(cB)[0].shape[0]
                if B * nx ** 3 >= self.batched_vmap_limit:
                    # the giant vmapped program (e.g. 8×256³ = 134M points)
                    # crashes the remote TPU compiler; lax.map compiles the
                    # proven single-object body once and still runs the
                    # whole batch in ONE dispatch
                    return jax.lax.map(lambda c: one(tp, c), cB)
                return jax.vmap(one, in_axes=(None, 0))(tp, cB)

            cache[key] = jax.jit(batched)
        if device_mesh is not None:
            from vtaco_tpu.parallel.mesh import shard_batch

            c_batched = shard_batch(device_mesh, c_batched)
        logits = cache[key](tp, c_batched)
        if return_device:
            return logits  # device (B, nx³) in transfer_dtype; async
        if quant:
            q, scale = logits
            return np.asarray(q).astype(np.float32) * np.asarray(scale)[:, None]
        return np.asarray(logits).astype(np.float32)

    # ------------------------------------------------------------------
    def decode_dense_batched_band(self, state, nx, c_batched,
                                  device_mesh=None, dtype=jnp.float32,
                                  use_pallas=None, cap=None,
                                  return_device=False):
        """Batched dense decode with per-object iso-band transfer:
        one dispatch for B objects, shipping each object's occupancy bit
        mask + iso-crossing-corner logits instead of its (nx³,) volume
        (~5× less than the bf16 transfer; meshes bit-match the full f32
        path — generate/band.py). Returns ``(grids, levels)``: a list of
        B (nx, nx, nx) f32 grids (band-reconstructed; per-object
        overflow falls back to a full-volume fetch for that object) and
        the per-object iso levels to pass to marching cubes.
        """
        from vtaco_tpu.generate.band import band_extract, default_cap
        from vtaco_tpu.ops import fast_trunk as FT

        if cap is None:
            cap = default_cap(nx)
        if not self._fast_capable():
            raise NotImplementedError(
                "the channels-first fast trunk reproduces LocalDecoder "
                f"semantics only; got {type(self.model.decoder).__name__} "
                "(use eval_points(fast=False) / the module decode paths)"
            )
        level_mode, level_const = self._band_level_args()
        tp = FT.extract_trunk_params(
            state.params["decoder"], self.model.decoder.n_blocks,
            with_img=False,
        )
        leaky = getattr(self.model.decoder, "leaky", False)
        if use_pallas is None:
            use_pallas = self._pallas_enabled()
        use_pallas = bool(use_pallas) and not leaky
        if use_pallas:
            dtype = jnp.float32  # Mosaic rejects bf16 MXU dots (DESIGN.md)
        cache = getattr(self, "_decode_dense_band_vmapped", None)
        if cache is None:
            cache = self._decode_dense_band_vmapped = {}
        key = (nx, jnp.dtype(dtype).name, use_pallas, cap, level_mode)
        if key not in cache:
            def one(tp, c):
                logits = self._decode_dense_fast_impl(
                    tp, c, jnp.zeros((1, 3)), jnp.zeros((1, 1)),
                    jnp.zeros((1,), bool), nx=nx, gating="none",
                    dtype=dtype, use_pallas=use_pallas, leaky=leaky,
                    pallas_tile=4096 if use_pallas else None,
                    out_dtype=None, out_xmajor=True,
                )
                return band_extract(logits, nx, cap, level_mode,
                                    level_const)

            def batched(tp, cB):
                B = jax.tree_util.tree_leaves(cB)[0].shape[0]
                if B * nx ** 3 >= self.batched_vmap_limit:
                    return jax.lax.map(lambda c: one(tp, c), cB)
                return jax.vmap(one, in_axes=(None, 0))(tp, cB)

            cache[key] = jax.jit(batched)
        if device_mesh is not None:
            from vtaco_tpu.parallel.mesh import shard_batch

            c_batched = shard_batch(device_mesh, c_batched)
        raw = cache[key](tp, c_batched)
        if return_device:
            # async: device tuple + the finalize args. Callers overlap
            # host work with the in-flight decode, then call
            # finish_batched_band (generate/inferencer.py run_batched).
            return raw, (nx, cap, c_batched, dtype, use_pallas)
        return self.finish_batched_band(
            state, raw, (nx, cap, c_batched, dtype, use_pallas)
        )

    def finish_batched_band(self, state, raw, fin_args, mesh=False):
        """Blocking second half of decode_dense_batched_band(return_device
        =True): fetch, then per object either reconstruct the grid
        (default: returns ``(grids, levels)``) or extract the mesh
        straight from the band payload (``mesh=True``: returns
        ``(meshes, levels)`` — the fused native scanner, no grid).
        Per-object overflow falls back to a full-volume fetch."""
        from vtaco_tpu.generate.band import (
            band_marching_cubes,
            band_reconstruct,
        )
        from vtaco_tpu.generate.mise import host_map

        nx, cap, c_batched, dtype, use_pallas = fin_args
        counts, levels, packed, vals = jax.device_get(raw)
        B = len(counts)

        def full_grid(b):
            self.band_overflows += 1
            c_b = jax.tree.map(lambda x, b=b: x[b : b + 1], c_batched)
            full = self.eval_points_dense(
                state, nx, c_b, dtype=dtype,
                transfer_dtype=jnp.float32, use_pallas=use_pallas,
            )
            return full.reshape(nx, nx, nx)

        def recon(b):
            if int(counts[b]) > cap:
                return full_grid(b)
            return band_reconstruct(nx, float(levels[b]), int(counts[b]),
                                    packed[b], vals[b])

        def extract(b):
            if int(counts[b]) > cap:
                from vtaco_tpu.generate.marching_cubes import marching_cubes

                return marching_cubes(full_grid(b), level=float(levels[b]),
                                      gradient="ascent")
            return band_marching_cubes(nx, float(levels[b]),
                                       int(counts[b]), packed[b], vals[b],
                                       gradient="ascent")

        out = host_map(extract if mesh else recon, range(B))
        return out, [float(lv) for lv in levels]

    # ------------------------------------------------------------------
    def decode_points_batched(self, state, pts_b, c_batched, device_mesh=None,
                              transfer_dtype=jnp.bfloat16, fast=None,
                              use_pallas=None, lattice_reso=None,
                              coord_quant=None, pts_cn=None, n_real=None):
        """Batched scattered decode: (B, M, 3) host points against (B, ...)
        feature fields → (B, M) logits, all in ONE dispatch.

        The per-object companion to :meth:`decode_dense_batched` — it powers
        batched MISE refinement (mise.multires_decode_batched), where each
        object needs a different, irregular set of boundary queries per
        level. With ``device_mesh`` the object axis shards over the mesh's
        'data' chips (DP serving).

        By default the query axis runs through the channels-first scattered
        fast path (gather interp + fused trunk, vmapped over the object
        axis; Pallas on TPU with the vmap-safe tile pinned at 4096, as in
        :meth:`decode_dense_batched`). ``fast=False`` keeps the legacy
        (N, C)-layout chunked decode (lax.map of a vmap of the module
        decoder) for comparison/crops.

        ``coord_quant``: uint16-quantize non-lattice uploads (same
        contract as :meth:`eval_points_fast` — error ≤ 8.4e-6 world
        units, half the f32 payload). ``None`` defers to the
        generator's 'auto' setting (TPU only); lattice inputs are
        unaffected (already compact and exact).

        ``pts_cn`` (+``n_real``): a PRE-PACKED (B, 3, mpad) int16 lattice
        upload buffer (pad slots already filled, e.g. by
        MultiGridExtractorNative.query_cn into a pooled buffer) — skips
        this method's zero-alloc + transpose-copy of the (B, M, 3) input,
        which cost ~0.5-1 s/flight in cold-page faults + strided copies
        at batched-MISE sizes on a 1-core host.
        """
        if pts_cn is not None:
            assert lattice_reso is not None and n_real is not None
            B, M = pts_cn.shape[0], int(n_real)
        else:
            pts_b = np.asarray(pts_b,
                               np.int16 if lattice_reso else np.float32)
            B, M = pts_b.shape[:2]
        if fast is None:
            fast = self.input_type != "pointcloud_crop"
        if lattice_reso is not None and not fast:
            raise ValueError("lattice_reso requires the fast path")
        if coord_quant is None:
            coord_quant = (lattice_reso is None and fast
                           and self._coord_quant_enabled())
        elif coord_quant and (lattice_reso is not None or not fast):
            raise ValueError("coord_quant needs the fast non-lattice path")
        if fast and not self._fast_capable():
            raise NotImplementedError(
                "decode_points_batched's fast path reproduces LocalDecoder "
                f"semantics only; got {type(self.model.decoder).__name__} "
                "(pass fast=False for the module decode path)"
            )
        if fast:
            from vtaco_tpu.ops import fast_trunk as FT

            leaky = getattr(self.model.decoder, "leaky", False)
            if use_pallas is None:
                use_pallas = self._pallas_enabled()
            use_pallas = bool(use_pallas) and not leaky
            tp = FT.extract_trunk_params(
                state.params["decoder"], self.model.decoder.n_blocks,
                with_img=False,
            )
            if pts_cn is None:
                mpad = self._sticky_bucket(
                    ("scatter_batched", B, lattice_reso is not None,
                     bool(coord_quant), jnp.dtype(transfer_dtype).name), M,
                )
                if lattice_reso is not None:
                    pdt = np.int16
                elif coord_quant:
                    pdt = np.uint16
                else:
                    pdt = np.float32
                pts_cn = np.zeros((B, 3, mpad), pdt)
                if coord_quant and lattice_reso is None:
                    box = 1 + self.padding
                    u = (pts_b.transpose(0, 2, 1).astype(np.float32) / box
                         + 0.5)
                    pts_cn[:, :, :M] = np.round(
                        np.clip(u, 0.0, 1.0) * 65535.0
                    )
                else:
                    pts_cn[:, :, :M] = pts_b.transpose(0, 2, 1)
                if 0 < M < mpad:
                    # pad with the last real point (not zeros) so the int8
                    # quantization scale reflects only real queries
                    pts_cn[:, :, M:] = pts_cn[:, :, M - 1 : M]
            cache = getattr(self, "_decode_pts_batched_fast", None)
            if cache is None:
                cache = self._decode_pts_batched_fast = {}
            # reso rides as a traced scalar so every MISE level (and any
            # future resolution) reuses ONE compiled program per shape
            key = (use_pallas, jnp.dtype(transfer_dtype).name,
                   lattice_reso is not None, bool(coord_quant))
            if key not in cache:
                td_b = jnp.dtype(transfer_dtype)
                quant_b = td_b == jnp.dtype(jnp.int8)
                cq_b = bool(coord_quant)

                def one(tp, p_cn, c_s, reso):
                    out = self._decode_scatter_fast_impl(
                        tp, p_cn, c_s, jnp.zeros((1, 3)), jnp.zeros((1, 1)),
                        jnp.zeros((1,), bool), gating="none",
                        dtype=jnp.float32, use_pallas=use_pallas, leaky=leaky,
                        # under vmap, Mosaic compiles crash below tile 4096
                        # (ops/pallas/decode.py docstring) — pin it
                        pallas_tile=4096 if use_pallas else None,
                        lattice_reso=reso, coord_quant=cq_b,
                    )
                    if quant_b:
                        # per-object scaled int8 (same contract as
                        # decode_dense_batched / eval_points_fast) — a raw
                        # astype would truncate logits to garbage
                        scale = jnp.maximum(jnp.max(jnp.abs(out)),
                                            1e-6) / 127.0
                        q = jnp.round(out / scale).astype(jnp.int8)
                        return q, scale.astype(jnp.float32)
                    return out.astype(td_b)

                cache[key] = jax.jit(
                    lambda tp, pB, cB, reso: jax.vmap(
                        one, in_axes=(None, 0, 0, None)
                    )(tp, pB, cB, reso)
                )
            pts_dev = jnp.asarray(pts_cn)
            if device_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from vtaco_tpu.parallel.mesh import shard_batch

                c_batched = shard_batch(device_mesh, c_batched)
                pts_dev = jax.device_put(
                    pts_dev, NamedSharding(device_mesh, P("data"))
                )
            out = cache[key](tp, pts_dev, c_batched, lattice_reso)
            if pts_cn is not None:
                # internal prepacked path (batched MISE): convert into a
                # POOLED f32 buffer — the dequant/astype pair otherwise
                # allocates 2×(B, mpad) f32 fresh per level, pure
                # cold-page-fault cost in bad host weather. The returned
                # slice ALIASES the pool: the caller must consume it
                # before the next decode_points_batched call (the MISE
                # loop applies it to the engines immediately).
                mpad_out = (out[0] if isinstance(out, tuple)
                            else out).shape[1]
                buf = self._pooled(("pb_vals", pts_cn.shape[0], mpad_out),
                                   (pts_cn.shape[0], mpad_out), np.float32)
                if jnp.dtype(transfer_dtype) == jnp.dtype(jnp.int8):
                    q, scale = out
                    np.multiply(np.asarray(q),
                                np.asarray(scale)[:, None].astype(np.float32),
                                out=buf, casting="unsafe")
                else:
                    np.copyto(buf, np.asarray(out), casting="unsafe")
                return buf[:, :M]
            if jnp.dtype(transfer_dtype) == jnp.dtype(jnp.int8):
                q, scale = out
                return (np.asarray(q).astype(np.float32)
                        * np.asarray(scale)[:, None])[:, :M]
            return np.asarray(out).astype(np.float32)[:, :M]
        variables = self._vars(state)
        bs = self.points_batch_size
        k = max(1, -(-M // bs))
        pts_pad = np.zeros((B, k * bs, 3), np.float32)
        pts_pad[:, :M] = pts_b
        stacked = jnp.asarray(pts_pad.reshape(B, k, bs, 3).transpose(1, 0, 2, 3))
        # one jitted fn serves every mesh: placement happens via
        # device_put on the operands below, not inside the program
        fn_jit = getattr(self, "_decode_pts_batched_fn", None)
        if fn_jit is None:
            def per_sample(variables, pts_s, c_s):
                c1 = jax.tree.map(lambda x: x[None], c_s)
                return self._decode_chunk_impl(
                    variables, pts_s, c1, jnp.zeros((1, 3)),
                    jnp.zeros((1, 1)), jnp.zeros((1,), bool), "none",
                )

            def fn(variables, pts_k, cB):
                return jax.lax.map(
                    lambda ch: jax.vmap(
                        per_sample, in_axes=(None, 0, 0)
                    )(variables, ch, cB),
                    pts_k,
                )  # (k, B, bs)

            fn_jit = self._decode_pts_batched_fn = jax.jit(fn)
        if device_mesh is not None:
            # explicit placement (device_put reshards committed arrays;
            # jit in_shardings would reject them): objects over 'data'
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vtaco_tpu.parallel.mesh import shard_batch

            c_batched = shard_batch(device_mesh, c_batched)
            stacked = jax.device_put(
                stacked, NamedSharding(device_mesh, P(None, "data"))
            )
        out = fn_jit(variables, stacked, c_batched)
        host = np.asarray(
            out.astype(_legacy_transfer_dtype(transfer_dtype))
        ).astype(np.float32)
        return host.transpose(1, 0, 2).reshape(B, k * bs)[:, :M]

    # ------------------------------------------------------------------
    def _obj_mesh_band(self, state, nx, mode, inputs, imgs, depths, touch,
                       pc_ply, mano_gt, wrist, cam_pos, cam_rot, seed,
                       cap=None, dtype=jnp.float32, use_pallas=None):
        """One-dispatch mesh extraction: the fused
        encode+gate+decode+band program (``_mesh_band_impl``), then the
        fused native band scanner emits the mesh with no intermediate
        grid. Returns ``(verts, faces)`` in voxel coordinates, or None on
        band-buffer overflow (caller falls back to the multi-dispatch
        full-transfer path)."""
        from vtaco_tpu.generate.band import default_cap
        from vtaco_tpu.ops import fast_trunk as FT

        if cap is None:
            cap = default_cap(nx)
        if use_pallas is None:
            use_pallas = self._pallas_enabled()
        level_mode, level_const = self._band_level_args()
        decoder = self.model.decoder
        tp = FT.extract_trunk_params(
            state.params["decoder"], decoder.n_blocks,
            with_img=mode != "none",
        )
        if imgs is None:  # traced placeholders for the ungated program
            imgs = jnp.zeros((1, 5, 4, 4, 3))
            depths = jnp.zeros((1, 5, 16))
            touch = jnp.zeros((1, 5), bool)
        hw = imgs.shape[2] * imgs.shape[3]
        d_origin = (
            jnp.asarray(self.depth_origin, jnp.float32)
            if self.depth_origin is not None
            and len(self.depth_origin) == hw
            else jnp.full((hw,), DEPTH_REST, jnp.float32)
        )
        raw = self._mesh_band(
            self._vars(state), tp, inputs, imgs, depths, touch, cam_rot,
            cam_pos, pc_ply, mano_gt[:, :3], wrist, d_origin,
            jnp.int32(seed), jnp.float32(level_const), nx, mode,
            jnp.dtype(dtype), use_pallas,
            getattr(decoder, "leaky", False), cap=cap,
            level_mode=level_mode, legacy_gt=bool(self.legacy_gt_depth),
        )
        count, level, packed, vals = jax.device_get(raw)
        count = int(count)
        if count > cap:
            self.band_overflows += 1
            return None
        from vtaco_tpu.generate.band import band_marching_cubes

        verts, faces = band_marching_cubes(nx, float(level), count, packed,
                                           vals, gradient="ascent")
        return verts, faces

    def _build_gates(self, state, inputs, imgs, depths, touch, pc_ply,
                     mano_gt, wrist, cam_pos, cam_rot, seed=0):
        """Tactile-feature gating inputs for a B=1 sample: contact-point
        gates (t2d path, generation.py:202-255) or fingertip-proximity
        gates (generation.py:159-200), or none. Shared by the dense
        full-transfer mesh path and the MISE multi-resolution path."""
        if not self.with_img:
            return "none", None, None, None
        c_img = self._apply(
            state, self.model.encode_img_inputs, imgs, train=False
        )  # (1, 5, C)
        if self.encode_t2d:
            H, W = imgs.shape[2], imgs.shape[3]
            hw = H * W
            pred_depth, _ = self._apply(
                state, self.model.encode_t2d, inputs, imgs, train=False
            )
            d_origin = (
                jnp.asarray(self.depth_origin)
                if self.depth_origin is not None
                and len(self.depth_origin) == hw
                else jnp.full((hw,), DEPTH_REST)
            )
            gate_pts, gate_valid = self._prep_contact_gates(
                depths[0], pred_depth[0], d_origin, touch[0],
                cam_rot[0], cam_pos[0], pc_ply[0], H, W, seed=seed,
            )
            return "contact", gate_pts, c_img[0], gate_valid
        # fingertip proximity
        c_hand = self._apply(
            state, self.model.encode_hand_inputs, inputs, train=False
        )
        tips = C.tips_in_object_frame(
            c_hand["mano_joints"], mano_gt[:, :3], wrist, pc_ply
        )[0]
        return "tips", tips, c_img[0], touch[0]

    def generate_obj_mesh_wnf(self, state, data, seed=0):
        """Dense-grid decode + marching cubes + metrics.

        Mirrors generation.py:115-284. ``data`` is a B=1 loader batch.
        Returns ((verts, faces), emd, chamfer). ``seed`` varies the
        contact-pixel subsampling of the tactile gating (deterministic by
        default; the reference redraws per call).
        """
        box_size = 1 + self.padding
        nx = self.resolution0 * 4

        inputs = jnp.asarray(data["inputs"])
        imgs = jnp.asarray(data["inputs.img"]) if "inputs.img" in data else None
        depths = jnp.asarray(data["inputs.depth"]) if "inputs.depth" in data else None
        touch = (
            jnp.asarray(np.asarray(data["inputs.touch_success"]) > 0.5)
            if "inputs.touch_success" in data else None
        )
        pc_ply = jnp.asarray(data["inputs.pc_ply"])
        mano_gt = jnp.asarray(data["points.mano"])
        points_obj = np.asarray(data["points.points_obj"])
        wrist = jnp.asarray(data["points.wrist"])
        cam_pos = jnp.asarray(data["points.cam_pos"])
        cam_rot = jnp.asarray(data["points.cam_rot"])

        verts = faces = None
        if self._band_enabled():
            # the one-dispatch serving path: encode + gate construction +
            # gated decode + iso-band extraction in a single program, then
            # the fused native band scanner emits the mesh with no grid
            # reconstruction (~1/10 the transfer payload; mesh
            # bit-identical to the full f32 transfer — generate/band.py)
            mode = "none"
            if self.with_img:
                mode = "contact" if self.encode_t2d else "tips"
            out = self._obj_mesh_band(
                state, nx, mode, inputs, imgs, depths, touch, pc_ply,
                mano_gt, wrist, cam_pos, cam_rot, seed,
            )
            if out is not None:
                verts, faces = out
        if verts is None:
            c = self._apply(state, self.model.encode_inputs, inputs,
                            train=False)
            gating, gate_pts, gate_feat, gate_valid = self._build_gates(
                state, inputs, imgs, depths, touch, pc_ply, mano_gt, wrist,
                cam_pos, cam_rot, seed,
            )
            values = self.eval_points_dense(
                state, nx, c, gating, gate_pts, gate_feat, gate_valid,
                transfer_dtype=self.transfer_dtype,
            )
            value_grid = values.reshape(nx, nx, nx)

            level = None  # midpoint: marching_cubes' skimage default
            if self.mc_level == "mean":
                level = float(value_grid.mean())
            elif isinstance(self.mc_level, (int, float)):
                level = float(self.mc_level)
            verts, faces = marching_cubes(value_grid, level=level,
                                          gradient="ascent")
        verts = verts - np.array([nx / 2, nx / 2, nx / 2], np.float32)
        verts = verts * box_size / nx

        vert_sample = verts.copy()
        np.random.shuffle(vert_sample)
        vert_sample = np.ascontiguousarray(vert_sample[:2048], np.float32)

        if len(vert_sample) == 0:
            # degenerate field (e.g. untrained weights): no iso-crossing →
            # empty mesh; chamfer/EMD are undefined
            return (verts, faces), float("inf"), float("inf")

        cd = float(
            np.asarray(
                metrics.chamfer_distance(
                    jnp.asarray(points_obj), jnp.asarray(vert_sample[None])
                )
            )[0]
        )
        emd = metrics.earth_mover_distance(points_obj[0], vert_sample)
        return (verts, faces), emd, cd

    # ------------------------------------------------------------------
    def generate_obj_mesh_mise(self, state, data, resolution0=None,
                               upsampling_steps=None, seed=0):
        """High-resolution extraction via MISE coarse-to-fine refinement.

        Final resolution = resolution0 * 2**upsampling_steps (e.g. 64 * 2²
        = 256³ while evaluating only a few percent of the dense grid). The
        multi-resolution counterpart of generate_obj_mesh_wnf — for
        with_img models the tactile-feature gating (contact/tips) runs
        through the refinement exactly as in the dense path, so the
        TRAINED decode head (forward_img) drives the extraction. (The
        reference's MISE machinery is dead code, src/utils/mesh.py; its
        shipped mesh path always decodes with decode_img — a gating-free
        MISE on a VTacO model would query the never-trained plain head.)
        """
        from vtaco_tpu.generate.mise import multires_decode

        res0 = resolution0 or self.resolution0 * 4
        steps = upsampling_steps if upsampling_steps is not None else (
            self.upsampling_steps
        )
        inputs = jnp.asarray(data["inputs"])
        imgs = (jnp.asarray(data["inputs.img"])
                if "inputs.img" in data else None)
        depths = (jnp.asarray(data["inputs.depth"])
                  if "inputs.depth" in data else None)
        touch = (
            jnp.asarray(np.asarray(data["inputs.touch_success"]) > 0.5)
            if "inputs.touch_success" in data else None
        )
        pc_ply = (jnp.asarray(data["inputs.pc_ply"])
                  if "inputs.pc_ply" in data else None)
        mano_gt = (jnp.asarray(data["points.mano"])
                   if "points.mano" in data else None)
        wrist = (jnp.asarray(data["points.wrist"])
                 if "points.wrist" in data else None)
        cam_pos = (jnp.asarray(data["points.cam_pos"])
                   if "points.cam_pos" in data else None)
        cam_rot = (jnp.asarray(data["points.cam_rot"])
                   if "points.cam_rot" in data else None)
        gating = "none"
        gate_pts = gate_feat = gate_valid = None
        if self.with_img and imgs is not None:
            gating, gate_pts, gate_feat, gate_valid = self._build_gates(
                state, inputs, imgs, depths, touch, pc_ply, mano_gt,
                wrist, cam_pos, cam_rot, seed,
            )
        c = self._apply(state, self.model.encode_inputs, inputs, train=False)
        # Refinement + iso level selection mirrors the dense path's
        # ``mc_level`` semantics. An explicit numeric mc_level pins the
        # level in VALUE space (the decoder regresses occupancy values —
        # see the iou_fixed note in train/trainer.py; the old
        # log(t/(1-t)) conversion put an intended 0.5 at 0, inside the
        # noise floor). The 'midpoint'/'mean' defaults SELF-CALIBRATE
        # from the coarse field (threshold=None → coarse mean): the
        # reference initializes generation-time c_img_all to zeros while
        # t2d training used ones (generation.py:173,223 vs
        # training.py:814 — a mirrored quirk), which shifts the field's
        # absolute calibration at inference; its skimage midpoint default
        # absorbs that, and so does this.
        if isinstance(self.mc_level, (int, float)) and not isinstance(
                self.mc_level, bool):
            thr = float(self.mc_level)
        elif self.mc_level == "mean":
            thr = None  # coarse-field mean
        else:
            thr = "midpoint"  # coarse-field (min+max)/2 — the default
        values, thr = multires_decode(self, state, c, res0, steps, thr,
                                      gating=gating, gate_pts=gate_pts,
                                      gate_feat=gate_feat,
                                      gate_valid=gate_valid)
        reso = res0 * 2**steps
        box = 1 + self.padding
        verts, faces = marching_cubes(values, level=thr,
                                      gradient="ascent")
        verts = (verts / reso - 0.5) * box
        return verts, faces

    # ------------------------------------------------------------------
    def generate_hand_mesh(self, state, data):
        """MANO prediction → world/object frame mesh (generation.py:74-113)."""
        inputs = jnp.asarray(data["inputs"])
        pc_ply = jnp.asarray(data["inputs.pc_ply"])[0]

        c_hand = self._apply(
            state, self.model.encode_hand_inputs, inputs, train=False
        )
        mano_param = np.asarray(c_hand["mano_param"])[0]
        verts = np.asarray(c_hand["mano_verts"])[0]
        joints = np.asarray(c_hand["mano_joints"])[0]
        faces = np.asarray(c_hand["mano_faces"])

        wrist_pos, wrist_rotvec = mano_param[:3], mano_param[3:6]
        wrist_rot_euler = np.asarray(axisang_to_euler_xyz(jnp.asarray(wrist_rotvec)))

        offset = np.array([0.11, 0.005, 0], np.float32)
        R_canon_inv = np.linalg.inv(
            np.asarray(R_from_PYR(jnp.array([-np.pi / 2, np.pi / 2, 0.0])))
        )
        R_wrist_inv = np.linalg.inv(
            np.asarray(R_from_PYR(jnp.asarray(wrist_rot_euler)))
        )

        def uncanon(x):
            x = x - offset
            x = R_canon_inv @ x.T
            x = R_wrist_inv @ x
            return x.T + wrist_pos

        verts = np.asarray(norm_pc_1(jnp.asarray(uncanon(verts)), pc_ply))
        return verts, faces

    # ------------------------------------------------------------------
    def generate_tactile_pc(self, state, data):
        """Predicted depth maps → world-frame clouds (generation.py:286-333).

        Returns (B, 5, H*W, 3) numpy.
        """
        inputs = jnp.asarray(data["inputs"])
        imgs = jnp.asarray(data["inputs.img"])
        pc_ply = jnp.asarray(data["inputs.pc_ply"])
        cam_pos = np.asarray(data["points.cam_pos"])
        cam_rot = np.asarray(data["points.cam_rot"])
        B, F5, H, W, _ = imgs.shape

        pred_depth = np.asarray(
            self._apply(state, self.model.encode_img_inputs, imgs, train=False)
        )  # (B, 5, H*W)
        if pred_depth.shape[-1] != H * W:
            raise ValueError(
                "generate_tactile_pc needs a depth-map image encoder (the "
                "tactile U-Net); this model's encoder_img emits "
                f"{pred_depth.shape[-1]}-d features, not {H}x{W} depth maps"
            )
        import math

        f = H / (2 * math.tan(math.radians(CAM_FOV / 2)))
        out = np.zeros((B, F5, H * W, 3), np.float32)
        rot_off = np.array([-np.pi / 2, 0, np.pi / 2])
        for b in range(B):
            for t_idx in range(F5):
                depth = pred_depth[b, t_idx].reshape(H, W) * 0.005 + 0.019
                cloud = np.asarray(
                    C.backproject_depth(jnp.asarray(depth), f, W, H)
                )
                world = np.asarray(
                    pc_cam_to_world(
                        jnp.asarray(cloud),
                        jnp.asarray(cam_rot[b, t_idx] + rot_off),
                        jnp.asarray(cam_pos[b, t_idx]),
                    )
                )
                out[b, t_idx] = np.asarray(
                    norm_pc_1(jnp.asarray(world), pc_ply[b])
                )
        return out


class LoopGenerator:
    """Periodic visualization hook for the training loop (mirrors
    train.py:239-256 / train_depth.py:251-266).

    ``vis_all``/``vis_split`` reproduce the reference's staging
    (train.py:89-118): all val samples when vis_all (the shipped configs'
    setting), else every vis_split-th — a full-split dense decode + EMD per
    visualize cadence is minutes-per-trigger on a big split."""

    def __init__(self, generator, train_tactile=False, vis_all=True,
                 vis_split=1):
        self.generator = generator
        self.train_tactile = train_tactile
        self.vis_all = vis_all
        self.vis_split = max(1, int(vis_split))

    def visualize(self, state, val_loader, out_dir, it):
        from vtaco_tpu.utils import meshio

        vis_dir = os.path.join(out_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        emd_total, cd_total = [], []
        for i, batch in enumerate(val_loader):
            if not self.vis_all and i % self.vis_split != 0:
                continue
            name = batch["points.name"][0]
            if self.train_tactile:
                pcs = self.generator.generate_tactile_pc(state, batch)
                meshio.write_ply(
                    os.path.join(vis_dir, f"{it}_{name}_tactile.ply"),
                    pcs[0].reshape(-1, 3),
                )
            else:
                hand_verts, hand_faces = self.generator.generate_hand_mesh(
                    state, batch
                )
                (verts, faces), emd, cd = self.generator.generate_obj_mesh_wnf(
                    state, batch
                )
                emd_total.append(emd)
                cd_total.append(cd)
                meshio.write_off(
                    os.path.join(vis_dir, f"{it}_{name}_hand.off"),
                    hand_verts, hand_faces,
                )
                meshio.write_off(
                    os.path.join(vis_dir, f"{it}_{name}_obj.off"), verts, faces
                )
        if emd_total:
            print("Metrics EMD: {}".format(np.mean(emd_total)))
            print("Metrics CD: {}".format(np.mean(cd_total)))


def make_loop_generator(model, cfg, bank=None):
    gen = Generator3D.from_config(model, cfg)
    g = cfg.get("generation", {})
    return LoopGenerator(
        gen, train_tactile=cfg["model"]["train_tactile"],
        vis_all=g.get("vis_all", True), vis_split=g.get("vis_split", 1),
    )

"""Trainer: jitted train/eval steps for every loss path.

Counterpart of src/conv_onet/training.py:21-1001. Each of the reference's
loss paths becomes a pure function jit-compiled once:

  path                         reference            flags
  ----------------------------------------------------------------------
  loss_plain                   compute_loss:454     no tactile
  loss_contact                 compute_loss_contact:896  with_contact
  loss_img                     compute_loss_img:502 with_img, no t2d
  loss_t2d                     compute_loss_t2d:628 encoder_t2d, no img
  loss_t2d_img                 compute_loss_t2d_img:757  encoder_t2d+img
  loss_tactile                 compute_loss_tactile:950  train_tactile

TPU-first changes relative to the reference:
  * no host round-trips inside the step: depth back-projection, contact
    sampling, and winding-number occupancy labels all run on device with
    fixed shapes (see vtaco_tpu.train.contact / vtaco_tpu.ops.winding);
  * ground-truth meshes enter as padded (B, V, 3)/(B, F, 3) arrays gathered
    from a MeshBank by sample id;
  * the whole step (loss + grads + optimizer update + BatchNorm stats) is
    one XLA program;
  * optional jax.sharding.Mesh: the batch is sharded over the 'data' axis,
    parameters are replicated, and XLA inserts the gradient psum.

Known divergence (documented): compute_loss_t2d in the reference min-max
normalizes depth maps *before* back-projecting them (training.py:644,693),
which makes its contact-pixel test compare [0,1] values against metric
rest-gel depths — contact everywhere. This implementation back-projects raw
depths in that path (as the shipped t2d_img path does).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from vtaco_tpu.ops import metrics
from vtaco_tpu.ops.winding import MeshBank, winding_number_batch
from vtaco_tpu.train import contact as C

DEPTH_NEAR = 0.019
DEPTH_FAR = 0.022
DEPTH_REST = 0.0215
# predicted-depth denormalization slope (training.py:692, generation.py:229
# use 0.005 — intentionally wider than DEPTH_FAR - DEPTH_NEAR)
DEPTH_SCALE = 0.005
CAM_FOV = 60.0


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


def _minmax_norm(x):
    return (x - jnp.min(x)) / (jnp.max(x) - jnp.min(x))


class Trainer:
    """Builds and runs the jitted steps. Host-side: batch conversion, mesh
    lookup, metric averaging (BaseTrainer.evaluate parity,
    src/training.py:6-39)."""

    def __init__(
        self,
        model,
        optimizer=None,
        *,
        lr=1e-4,
        opt="Adam",
        num_sample=2048,
        threshold=0.5,
        with_img=False,
        with_contact=False,
        train_tactile=False,
        encode_t2d=False,
        pretrained_t2d=True,
        input_type="pointcloud",
        vis_dir=None,
        mesh_bank: Optional[MeshBank] = None,
        depth_origin: Optional[np.ndarray] = None,
        legacy_gt_depth=True,
        contact_per_finger=128,
        tips_per_finger=512,
        device_mesh=None,
        seed=0,
        matmul_precision="default",
        remat=False,
        skip_unused_t2d=False,
        compute_dtype=None,
        keep_f32_modules=("decoder",),
    ):
        """``matmul_precision``: 'default' runs matmuls in the MXU's native
        bf16 passes (the idiomatic TPU training mode — f32 storage, bf16
        multiplies), 'float32'/'highest' add re-passes for tighter numerics
        (use for strict parity runs).

        ``remat``: rematerialize each encoder/decoder forward in the
        backward pass (jax.checkpoint) — trades ~30% step FLOPs for
        activation memory, raising the batch ceiling. The full VTacO model
        at 320x240 tactile resolution OOMs a 16GB v5e at batch 12 without
        it and is borderline with it (measured both fitting at 3.77 s/step
        and OOMing across sessions); combine with skip_unused_t2d — the
        t2d U-Net's in-flight activations dominate — for real headroom.

        ``skip_unused_t2d``: in the shipped VTacO_YCB training path
        (pretrained t2d + legacy_gt_depth) the t2d depth/pose forward — the
        largest conv stack in the step — contributes NOTHING to the loss:
        the reference computes the predicted depth and then overwrites it
        with ground truth (training.py:691-693), and the pose/depth losses
        are off when the t2d is pretrained. Only its BatchNorm
        running-stats mutation keeps it alive in the compiled program.
        True drops that forward from the train step entirely (the frozen
        t2d keeps its pretrained stats). Default False = reference
        behavior (stats drift like the reference's train-mode t2d).

        ``compute_dtype``: 'bfloat16' runs the forward/backward with
        parameters and float inputs cast to bf16 (mixed precision: master
        parameters, optimizer state and BatchNorm running stats stay
        f32; the loss is reduced in f32). The step is HBM-bandwidth bound
        (see bench.py train_model_gbytes_per_sec), so halving activation
        bytes is the main single-chip training speed lever. None (default)
        keeps full f32 storage with bf16 MXU passes (matmul_precision).

        ``keep_f32_modules``: top-level param subtrees excluded from the
        compute_dtype cast. Default ('decoder',): the occupancy decoder is
        a few 32-wide layers (negligible cost) whose logits set the
        reconstruction surface — training it in bf16 measurably hurts
        held-out IoU (0.49 vs 0.79 after 2400 synthetic steps) while the
        encoders tolerate bf16. The encoder-side features are cast back
        to f32 where they enter excluded modules by dtype promotion."""
        self.model = model
        if optimizer is None:
            optimizer = (
                optax.adam(lr) if opt == "Adam" else optax.sgd(lr, momentum=0.9)
            )
        self.optimizer = optimizer
        self.num_sample = num_sample
        self.threshold = threshold
        self.with_img = with_img
        self.with_contact = with_contact
        self.train_tactile = train_tactile
        self.encode_t2d = encode_t2d
        self.pretrained_t2d = pretrained_t2d
        self.input_type = input_type
        self.vis_dir = vis_dir
        self.mesh_bank = mesh_bank
        self.depth_origin = depth_origin
        self.legacy_gt_depth = legacy_gt_depth
        self.contact_per_finger = contact_per_finger
        self.tips_per_finger = tips_per_finger
        self.device_mesh = device_mesh
        self.seed = seed
        self.matmul_precision = matmul_precision
        self.remat = remat
        self.skip_unused_t2d = skip_unused_t2d
        if compute_dtype is not None and not isinstance(compute_dtype, str):
            compute_dtype = jnp.dtype(compute_dtype).name
        self.compute_dtype = compute_dtype
        if isinstance(keep_f32_modules, str):
            # a bare string would tuple() into characters and silently
            # disable the f32-decoder protection
            keep_f32_modules = (keep_f32_modules,)
        self.keep_f32_modules = tuple(keep_f32_modules or ())
        if vis_dir is not None and not os.path.exists(vis_dir):
            os.makedirs(vis_dir)

        self._train_step_fn = jax.jit(self._train_step)
        self._eval_step_fn = jax.jit(self._eval_step)

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, model, cfg, mesh_bank=None, device_mesh=None, **kw):
        """Mirror of conv_onet.config.get_trainer (src/conv_onet/config.py:146-181)."""
        mcfg = cfg["model"]
        try:
            pretrained_t2d = mcfg["encoder_t2d_kwargs"]["pretrained"]
        except (KeyError, TypeError):
            pretrained_t2d = False
        depth_origin = None
        dpath = cfg["data"].get("depth_origin")
        if dpath and os.path.exists(dpath):
            depth_origin = np.loadtxt(dpath).astype(np.float32)
        out_dir = cfg["training"]["out_dir"]
        return cls(
            model,
            lr=cfg["training"]["lr"],
            opt=cfg["training"].get("opt", "Adam"),
            num_sample=cfg["data"]["num_sample"],
            threshold=cfg["test"]["threshold"],
            with_img=mcfg["with_img"],
            with_contact=mcfg["with_contact"],
            train_tactile=mcfg["train_tactile"],
            encode_t2d=bool(mcfg["encoder_t2d"]),
            pretrained_t2d=pretrained_t2d,
            # training.eval_sample is accepted in YAML for schema parity but
            # has no plumbing: the reference's flag is itself dead — the
            # `sample` kwarg it sets is swallowed unused by the composite
            # forward (src/conv_onet/models/__init__.py:54-71), so there are
            # no sampling-eval semantics to implement (docs/PARITY.md).
            input_type=cfg["data"]["input_type"],
            vis_dir=os.path.join(out_dir, "vis"),
            mesh_bank=mesh_bank,
            depth_origin=depth_origin,
            device_mesh=device_mesh,
            matmul_precision=cfg["training"].get("matmul_precision", "default"),
            **{"remat": cfg["training"].get("remat", False),
               "legacy_gt_depth":
                   cfg["training"].get("legacy_gt_depth", True),
               "skip_unused_t2d": cfg["training"].get("skip_unused_t2d", False),
               "compute_dtype": cfg["training"].get("compute_dtype"),
               "keep_f32_modules":
                   cfg["training"].get("keep_f32_modules", ("decoder",)),
               **kw},
        )

    # ------------------------------------------------------------------
    # initialization
    def _make_init_fn(self, arrays):
        """Init function touching every method path this config uses
        (flax creates params on first use)."""
        model = self.model

        def init_fn(model):
            inputs = arrays["inputs"]
            if "inputs_index" in arrays:
                inputs = {"points": inputs, "index": arrays["inputs_index"]}
            if model.encoder is not None:
                c = model.encode_inputs(inputs, train=False)
            else:
                c = None
            if model.encoder_hand is not None:
                model.encode_hand_inputs(arrays["inputs"], train=False)
            if model.encoder_img is not None:
                model.encode_img_inputs(arrays["imgs"], train=False)
            if model.encoder_t2d is not None:
                model.encode_t2d(arrays["inputs"], arrays["imgs"], train=False)
            if model.decoder is not None:
                p = arrays["points"][:, : self.num_sample]
                if "points_normalized" in arrays:
                    p = {
                        "p": arrays["points"],
                        "p_n": arrays["points_normalized"],
                    }
                    model.decode(p, c)
                    return
                model.decode(p, c)
                cdim = model.decoder.c_dim
                model.decode_img(p, c, jnp.zeros(p.shape[:2] + (cdim,)))
                if self.with_contact:
                    model.decode_contact(p, c)

        return init_fn

    def init_state(self, batch, rng=None):
        """Initialize parameters by tracing every method this config uses."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        init_fn = self._make_init_fn(self.prepare_batch(batch))
        variables = jax.jit(lambda: self.model.init(rng, method=init_fn))()
        return self._state_from_variables(variables)

    def init_state_abstract(self, batch, rng=None):
        """Structure-only TrainState (zeros): for checkpoint restore, where
        values are immediately overwritten — skips the init compile."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        init_fn = self._make_init_fn(self.prepare_batch(batch))
        shapes = jax.eval_shape(lambda: self.model.init(rng, method=init_fn))
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return self._state_from_variables(variables)

    def _state_from_variables(self, variables):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.optimizer.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(self.seed + 1),
        )

    # ------------------------------------------------------------------
    # batch conversion (host)
    def prepare_batch(self, batch):
        """Loader batch dict → fixed-key device arrays (+ padded meshes)."""
        a = {}
        a["points"] = jnp.asarray(batch["points"])
        a["occ"] = jnp.asarray(batch["points.occ"])
        if "points.mano" in batch:
            a["mano"] = jnp.asarray(batch["points.mano"])
            a["pc_hand"] = jnp.asarray(batch["points.pc_hand"])
            a["wrist"] = jnp.asarray(batch["points.wrist"])
            a["cam_pos"] = jnp.asarray(batch["points.cam_pos"])
            a["cam_rot"] = jnp.asarray(batch["points.cam_rot"])
        if "points.contact" in batch:
            a["contact"] = jnp.asarray(batch["points.contact"])
        a["inputs"] = jnp.asarray(batch["inputs"])
        if "inputs.pc_ply" in batch:
            a["pc_ply"] = jnp.asarray(batch["inputs.pc_ply"])
        if "inputs.img" in batch:
            a["imgs"] = jnp.asarray(batch["inputs.img"])
            a["depths"] = jnp.asarray(batch["inputs.depth"])
            ts = batch["inputs.touch_success"]
            if getattr(ts, "dtype", None) == jnp.bool_:
                a["touch_success"] = jnp.asarray(ts)  # device batch: no host trip
            else:
                a["touch_success"] = jnp.asarray(np.asarray(ts) > 0.5)
        if "points_iou" in batch:
            a["points_iou"] = jnp.asarray(batch["points_iou"])
            a["occ_iou"] = jnp.asarray(batch["points_iou.occ"])
        if "voxels" in batch:
            a["voxels"] = jnp.asarray(batch["voxels"])
        # sliding-window crop mode: precomputed per-plane indices / coords
        ind_keys = [k for k in batch if k.startswith("inputs.ind.")]
        if ind_keys:
            a["inputs_index"] = {
                k.split(".")[-1]: jnp.asarray(batch[k], jnp.int32)[:, 0]
                for k in ind_keys
            }
            if "inputs.mask" in batch:
                a["inputs_mask"] = jnp.asarray(batch["inputs.mask"])
        norm_keys = [k for k in batch if k.startswith("points.normalized.")]
        if norm_keys:
            a["points_normalized"] = {
                k.split(".")[-1]: jnp.asarray(batch[k]) for k in norm_keys
            }
        if self.mesh_bank is not None and "points.name" in batch:
            ids = self.mesh_bank.ids_for(batch["points.name"])
            mv, mf = self.mesh_bank.gather(jnp.asarray(ids))
            a["mesh_verts"], a["mesh_faces"] = mv, mf
        if self.device_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vtaco_tpu.parallel.mesh import put_global

            n_data = self.device_mesh.shape["data"]
            batch_sh = NamedSharding(self.device_mesh, P("data"))
            repl_sh = NamedSharding(self.device_mesh, P())
            nproc = jax.process_count()

            def put(v):
                # multi-host: this process's batch holds only ITS rows;
                # the global batch axis is lead × process_count
                # (parallel/multihost.py step 3). Replicate anything
                # whose global batch axis doesn't divide the mesh (e.g.
                # the B=1 eval batches — single-host only: replicated
                # assembly requires identical rows on every process).
                lead = jax.tree.leaves(v)[0].shape[0]
                sh = batch_sh if (lead * nproc) % n_data == 0 else repl_sh
                return put_global(v, sh)

            a = {k: put(v) for k, v in a.items()}
        return a

    def _depth_origin_for(self, hw):
        if self.depth_origin is not None and self.depth_origin.shape[0] == hw:
            return jnp.asarray(self.depth_origin)
        return jnp.full((hw,), DEPTH_REST, jnp.float32)

    def _cam_f(self, height):
        import math

        return height / (2 * math.tan(math.radians(CAM_FOV / 2)))

    # ------------------------------------------------------------------
    # forward helpers (run under jit)
    def _apply(self, variables, method, *args, train=True, **kw):
        out = self.model.apply(
            variables, *args, method=method, train=train,
            mutable=["batch_stats"] if train else False, **kw,
        )
        if train:
            return out  # (result, mutated_vars)
        return out, {"batch_stats": variables.get("batch_stats", FrozenDict())}

    def _loss_common(self, c_hand, a):
        loss_mano = jnp.mean((c_hand["mano_param"] - a["mano"]) ** 2)
        loss_pc = jnp.mean((c_hand["mano_verts"] - a["pc_hand"]) ** 2)
        return loss_mano, loss_pc

    def _compute_loss(self, params, batch_stats, rng, a, train=True):
        """Dispatch to the configured loss path; returns
        (loss, (scalars, new_batch_stats))."""
        model = self.model
        bs = batch_stats

        def apply(method, *args, **kw):
            nonlocal bs

            def run(params, bs_in, *a):
                return self._apply(
                    {"params": params, "batch_stats": bs_in}, method, *a,
                    train=train, **kw,
                )

            if self.remat and train:
                run = jax.checkpoint(run)
            out, mut = run(params, bs, *args)
            bs = mut.get("batch_stats", bs)
            return out

        scalars = {}

        if self.train_tactile:
            # compute_loss_tactile (training.py:950-986)
            depths = _minmax_norm(a["depths"])
            pred_depth = apply(model.encode_img_inputs, a["imgs"])
            loss_depth = jnp.mean(jnp.abs(pred_depth - depths))
            loss = loss_depth
            scalars["loss_depth"] = loss_depth
            if model.encoder_hand is not None:
                c_hand = apply(model.encode_hand_inputs, a["inputs"])
                cam_info = jnp.concatenate(
                    [a["cam_pos"].reshape(a["cam_pos"].shape[0], -1),
                     a["cam_rot"].reshape(a["cam_rot"].shape[0], -1)], axis=1
                )
                loss_digit = jnp.mean((c_hand["mano_param"] - cam_info) ** 2)
                loss = loss + loss_digit
                scalars["loss_digit"] = loss_digit
            scalars["loss"] = loss
            return loss, (scalars, bs)

        if self.encode_t2d:
            # --- t2d paths (training.py:628-894) ---
            B = a["points"].shape[0]
            H, W = a["imgs"].shape[2], a["imgs"].shape[3]
            hw = H * W
            # With GT-depth contact sampling and a pretrained (frozen) t2d,
            # neither t2d output reaches the loss (see skip_unused_t2d in
            # __init__) — optionally drop the whole forward.
            t2d_needed = (not self.legacy_gt_depth) or (not self.pretrained_t2d)
            if t2d_needed or not self.skip_unused_t2d:
                pred_depth, c_hand_d = apply(
                    model.encode_t2d, a["inputs"], a["imgs"]
                )
                digit_param = c_hand_d["mano_param"]
            else:
                pred_depth = digit_param = None
            if self.legacy_gt_depth:
                depth_for_contact = a["depths"]
            else:
                # f32 before the geometry path: the 1e-4 contact threshold
                # is below bf16 resolution at ~0.02 m depths
                depth_for_contact = (
                    pred_depth.astype(jnp.float32) * DEPTH_SCALE + DEPTH_NEAR
                )
            rng, k = jax.random.split(rng)
            sample = C.t2d_contact_sample(
                depth_for_contact, a["touch_success"], a["cam_pos"], a["cam_rot"],
                a["pc_ply"], a["points"], self._depth_origin_for(hw),
                self._cam_f(H), H, W, self.num_sample, self.contact_per_finger, k,
            )
            occ_new = winding_number_batch(
                a["mesh_verts"], a["mesh_faces"], sample.points
            )
            c = apply(model.encode_inputs, a["inputs"])
            c_hand = apply(model.encode_hand_inputs, a["inputs"])
            if self.with_img:
                c_img = apply(model.encode_img_inputs, a["imgs"])
                c_img_all = C.scatter_finger_features(c_img, sample, init="ones")
                logits = apply(model.decode_img, sample.points, c, c_img_all)
            else:
                logits = apply(model.decode, sample.points, c)
            loss_l1 = jnp.mean(jnp.abs(logits - occ_new))
            loss_mano, loss_pc = self._loss_common(c_hand, a)
            loss = loss_l1 + loss_mano + loss_pc
            scalars.update(loss_l1=loss_l1, loss_mano=loss_mano, loss_pc=loss_pc)
            if not self.pretrained_t2d:
                depths_n = _minmax_norm(a["depths"])
                loss_depth = jnp.mean(jnp.abs(pred_depth - depths_n))
                cam_info = jnp.concatenate(
                    [a["cam_pos"].reshape(B, -1), a["cam_rot"].reshape(B, -1)], 1
                )
                loss_digit = jnp.mean((digit_param - cam_info) ** 2)
                loss = loss + loss_depth + loss_digit
                scalars.update(loss_depth=loss_depth, loss_digit=loss_digit)
            scalars["loss"] = loss
            return loss, (scalars, bs)

        if self.with_img:
            # compute_loss_img (training.py:502-626)
            c = apply(model.encode_inputs, a["inputs"])
            c_hand = apply(model.encode_hand_inputs, a["inputs"])
            c_img = apply(model.encode_img_inputs, a["imgs"])
            tips = C.tips_in_object_frame(
                c_hand["mano_joints"], a["mano"][:, :3], a["wrist"], a["pc_ply"]
            )
            rng, k = jax.random.split(rng)
            sample, occ_sel = C.fingertip_gated_sample(
                a["points"], a["occ"], tips, a["touch_success"],
                self.num_sample, self.tips_per_finger, k,
            )
            c_img_all = C.scatter_finger_features(c_img, sample, init="zeros")
            logits = apply(model.decode_img, sample.points, c, c_img_all)
            loss_l1 = jnp.mean(jnp.abs(logits - occ_sel))
            loss_mano, loss_pc = self._loss_common(c_hand, a)
            loss = loss_l1 + loss_mano + loss_pc
            scalars.update(
                loss=loss, loss_l1=loss_l1, loss_mano=loss_mano, loss_pc=loss_pc
            )
            return loss, (scalars, bs)

        # compute_loss / compute_loss_contact (training.py:454-500, 896-948)
        # crop mode wraps inputs/points into the dict forms the patch
        # encoder/decoder expect (training.py:468-473 add_key)
        enc_in = a["inputs"]
        p_in = a["points"]
        if "inputs_index" in a:
            enc_in = {"points": a["inputs"], "index": a["inputs_index"]}
        if "points_normalized" in a:
            p_in = {"p": a["points"], "p_n": a["points_normalized"]}
        c = apply(model.encode_inputs, enc_in)
        if model.encoder_hand is not None:
            c_hand = apply(model.encode_hand_inputs, a["inputs"])
        else:
            c_hand = None
        if self.with_contact:
            logits, pred_contact = apply(model.decode_contact, p_in, c)
            loss_contact = optax.sigmoid_binary_cross_entropy(
                pred_contact, a["contact"]
            ).mean()
            scalars["loss_contact"] = loss_contact
        else:
            logits = apply(model.decode, p_in, c)
            loss_contact = 0.0
        loss_l1 = jnp.mean(jnp.abs(logits - a["occ"]))
        if c_hand is not None:
            loss_mano, loss_pc = self._loss_common(c_hand, a)
        else:
            loss_mano = loss_pc = jnp.zeros(())
        loss = loss_l1 + loss_mano + loss_pc + loss_contact
        scalars.update(
            loss=loss, loss_l1=loss_l1, loss_mano=loss_mano, loss_pc=loss_pc
        )
        return loss, (scalars, bs)

    # ------------------------------------------------------------------
    def _cast_compute(self, tree):
        """Cast float leaves to the training compute dtype (mixed
        precision); no-op when compute_dtype is None."""
        if self.compute_dtype is None:
            return tree
        dt = jnp.dtype(self.compute_dtype)
        return jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            tree,
        )

    def _cast_params(self, params):
        """Selective mixed precision: cast param subtrees to compute_dtype
        except keep_f32_modules (see __init__ — the decoder's logit head
        is precision-sensitive; the encoders are not)."""
        if self.compute_dtype is None:
            return params
        return {
            k: (v if k in self.keep_f32_modules else self._cast_compute(v))
            for k, v in params.items()
        }

    def _cast_batch(self, a):
        """Mixed precision casts ONLY the network input tensors — the
        encoders (3D U-Net, tactile CNNs) hold the activation bytes. The
        geometry/label paths stay f32: winding-number label accumulation,
        the 1e-4 depth contact threshold, and camera math all lose
        correctness at bf16 resolution."""
        if self.compute_dtype is None:
            return a
        a = dict(a)
        for k in ("inputs", "imgs"):
            if k in a:
                a[k] = self._cast_compute(a[k])
        return a

    def _train_step(self, state: TrainState, a):
        rng, step_rng = jax.random.split(state.rng)
        a_c = self._cast_batch(a)

        def loss_fn(params):
            with jax.default_matmul_precision(self.matmul_precision):
                loss, aux = self._compute_loss(
                    self._cast_params(params), state.batch_stats,
                    step_rng, a_c,
                )
                return loss.astype(jnp.float32), aux

        (_, (scalars, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if self.compute_dtype is not None:
            # master state stays f32: BatchNorm stats computed in bf16 are
            # cast back so the scan carry / checkpoint dtypes are stable
            new_bs = jax.tree.map(
                lambda n, o: n.astype(o.dtype), new_bs, state.batch_stats
            )
            scalars = jax.tree.map(
                lambda s: s.astype(jnp.float32), scalars
            )
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, scalars

    def train_step(self, state: TrainState, batch):
        """Host API: one optimization step. Returns (state, {scalar: float})."""
        a = self.prepare_batch(batch)
        state, scalars = self._train_step_fn(state, a)
        return state, {k: float(v) for k, v in scalars.items()}

    # ------------------------------------------------------------------
    def make_fused_train_fn(self, device_dataset, n_points, n_cloud):
        """K optimization steps in ONE XLA dispatch (device-resident data).

        Returns a jitted ``fn(state, rng, ids (K, B) int32) -> (state,
        {scalar: (K,)})`` that lax.scans over K steps: each iteration
        gathers + augments its batch from the DeviceDataset *on device*
        (including the padded GT meshes for the winding-number labels) and
        runs the full train step. Host↔device traffic per K steps is one
        PRNG key, K·B int32 ids, and the stacked scalars — amortizing
        dispatch latency (the dominant cost through a remote/tunneled
        device, and non-trivial even locally at small step times).

        K is baked per compiled variant (one retrace per distinct K; the
        train loop only uses K and 1).
        """
        dds = device_dataset
        assemble = self._device_batch_assembler(dds, n_points, n_cloud)

        @functools.partial(jax.jit, donate_argnums=0)
        def run(state, rng, ids_block):
            keys = jax.random.split(rng, ids_block.shape[0])

            def body(st, xs):
                key, ids = xs
                return self._train_step(st, assemble(key, ids))

            return jax.lax.scan(body, state, (keys, ids_block))

        return run

    def _device_batch_assembler(self, dds, n_points, n_cloud, for_eval=False):
        """Traceable (key, (B,) ids) → arrays dict: on-device gather +
        augmentation of a batch, mesh-bank lookup, DP sharding constraint."""
        bank_ids = None
        if self.mesh_bank is not None:
            bank_ids = jnp.asarray(self.mesh_bank.ids_for(dds.names), jnp.int32)
        mesh = self.device_mesh
        key_map = {
            "points": "points", "occ": "points.occ",
            "contact": "points.contact", "pc_hand": "points.pc_hand",
            "mano": "points.mano", "wrist": "points.wrist",
            "cam_pos": "points.cam_pos", "cam_rot": "points.cam_rot",
            "inputs": "inputs", "pc_ply": "inputs.pc_ply",
            "imgs": "inputs.img", "depths": "inputs.depth",
            "touch_success": "inputs.touch_success",
        }

        def assemble(key, ids):
            batch = dds._sample(key, ids, n_points, n_cloud)
            a = {k: batch[src] for k, src in key_map.items() if src in batch}
            if for_eval:
                # eval decodes the FULL labeled query set (points_iou field)
                a["points_iou"] = dds.data["points"][ids]
                a["occ_iou"] = dds.data["occ"][ids]
            if bank_ids is not None:
                bids = bank_ids[ids]
                a["mesh_verts"] = self.mesh_bank.verts[bids]
                a["mesh_faces"] = self.mesh_bank.faces[bids]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_data = mesh.shape["data"]
                sh = NamedSharding(mesh, P("data"))

                def constrain(v):
                    if v.shape[0] % n_data == 0:
                        return jax.lax.with_sharding_constraint(v, sh)
                    return v

                a = jax.tree.map(constrain, a)
            return a

        return assemble

    def make_fused_eval_fn(self, device_dataset, n_points, n_cloud):
        """Whole-split validation in ONE XLA dispatch.

        Returns a jitted ``fn(state, ids (M, 1)) -> {metric: (M,)}`` that
        lax.scans eval_step over the split's models (B=1 each, matching
        BaseTrainer.evaluate semantics, src/training.py:10-39) with batches
        assembled from a device-resident copy of the val split. The caller
        means the per-model values. Deterministic: the subsample key is
        folded from each model id."""
        dds = device_dataset
        assemble = self._device_batch_assembler(
            dds, n_points, n_cloud, for_eval=True
        )
        base = jax.random.PRNGKey(12345)

        @jax.jit
        def run(state, ids_block):
            def body(carry, ids):
                key = jax.random.fold_in(base, ids[0])
                return carry, self._eval_step(state, assemble(key, ids))

            _, outs = jax.lax.scan(body, 0, ids_block)
            return outs

        return run

    # ------------------------------------------------------------------
    def _eval_step(self, state: TrainState, a):
        """Mirrors eval_step (training.py:105-452) for the configured path."""
        rng = jax.random.fold_in(state.rng, 12345)
        loss, (scalars, _) = self._compute_loss(
            state.params, state.batch_stats, rng, a, train=False
        )
        out = dict(scalars)

        if not self.train_tactile:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            model = self.model
            if self.encode_t2d:
                # IoU on the winding-labeled contact sample (training.py:421).
                # Same depth source as the train path: GT under
                # legacy_gt_depth, else the t2d prediction — otherwise the
                # val metric would gate on a different query distribution
                # than the one being trained.
                H, W = a["imgs"].shape[2], a["imgs"].shape[3]
                if self.legacy_gt_depth:
                    depth_for_contact = a["depths"]
                else:
                    pred_depth, _ = model.apply(
                        variables, a["inputs"], a["imgs"], train=False,
                        method=model.encode_t2d,
                    )
                    depth_for_contact = (
                        pred_depth.astype(jnp.float32) * DEPTH_SCALE
                        + DEPTH_NEAR
                    )
                sample = C.t2d_contact_sample(
                    depth_for_contact, a["touch_success"], a["cam_pos"],
                    a["cam_rot"], a["pc_ply"], a["points"],
                    self._depth_origin_for(H * W),
                    self._cam_f(H), H, W, self.num_sample,
                    self.contact_per_finger, rng,
                )
                occ_lbl = winding_number_batch(
                    a["mesh_verts"], a["mesh_faces"], sample.points
                )
                c = model.apply(variables, a["inputs"], train=False,
                                method=model.encode_inputs)
                if self.with_img:
                    c_img = model.apply(variables, a["imgs"], train=False,
                                        method=model.encode_img_inputs)
                    c_img_all = C.scatter_finger_features(c_img, sample, "ones")
                    logits = model.apply(variables, sample.points, c, c_img_all,
                                         method=model.decode_img)
                else:
                    logits = model.apply(variables, sample.points, c,
                                         method=model.decode)
            else:
                p = a["points_iou"]
                occ_lbl = a["occ_iou"]
                c = model.apply(variables, a["inputs"], train=False,
                                method=model.encode_inputs)
                if self.with_img:
                    c_hand = model.apply(variables, a["inputs"], train=False,
                                         method=model.encode_hand_inputs)
                    c_img = model.apply(variables, a["imgs"], train=False,
                                        method=model.encode_img_inputs)
                    tips = C.tips_in_object_frame(
                        c_hand["mano_joints"], a["mano"][:, :3], a["wrist"],
                        a["pc_ply"],
                    )
                    c_img_all = C.assign_features_by_proximity(
                        p, tips, a["touch_success"], c_img
                    )
                    logits = model.apply(variables, p, c, c_img_all,
                                         method=model.decode_img)
                else:
                    logits = model.apply(variables, p, c, method=model.decode)
            iou = metrics.compute_iou(occ_lbl, logits, self.threshold)
            out["iou"] = iou[0]
            # companion conventional IoU. The decoder's outputs are
            # occupancy-VALUE regressions (every loss path L1-fits them
            # to {0,1} labels / continuous winding numbers,
            # training.py:492,641,726 — the reference's Bernoulli wrapper
            # is never used for thresholds), so the fixed decision
            # boundary lives in VALUE space at ``self.threshold`` (0.5),
            # NOT at the log-odds 0. The legacy metric above thresholds
            # BOTH sides at mean(prediction) (reference quirk,
            # common.py:33), which wanders with the field's calibration;
            # `iou` stays the model-selection default for reference
            # parity, configs can select on iou_fixed instead.
            out["iou_fixed"] = metrics.compute_iou(
                occ_lbl, (logits >= self.threshold).astype(jnp.float32),
                0.5, legacy_mean_threshold=False,
            )[0]

            # optional voxel-grid IoU (training.py:374-390; the reference's
            # call signature there is broken — fixed-threshold IoU here)
            if "voxels" in a and self.model.encoder is not None:
                from vtaco_tpu.ops.geometry import make_3d_grid

                vox = a["voxels"]
                r = vox.shape[1]
                pts_vox = jnp.asarray(
                    make_3d_grid(
                        (-0.5 + 1 / 64,) * 3, (0.5 - 1 / 64,) * 3, vox.shape[1:]
                    )
                )[None]
                pts_vox = jnp.broadcast_to(pts_vox, (vox.shape[0],) + pts_vox.shape[1:])
                logits_v = self.model.apply(
                    variables, pts_vox, c, method=self.model.decode
                )
                iou_vox = metrics.compute_iou(
                    (vox.reshape(vox.shape[0], -1) >= 0.5).astype(jnp.float32),
                    (jax.nn.sigmoid(logits_v) >= self.threshold).astype(
                        jnp.float32
                    ),
                    0.5,
                    legacy_mean_threshold=False,
                )
                out["iou_voxels"] = jnp.mean(iou_vox)
        return out

    def eval_step(self, state: TrainState, batch):
        a = self.prepare_batch(batch)
        out = self._eval_step_fn(state, a)
        return {k: float(v) for k, v in out.items()}

    def evaluate(self, state: TrainState, val_loader):
        """Mean of eval_step dicts over the loader (src/training.py:10-39)."""
        eval_list = {}
        for batch in val_loader:
            for k, v in self.eval_step(state, batch).items():
                eval_list.setdefault(k, []).append(v)
        return {k: float(np.mean(v)) for k, v in eval_list.items()}

    def evaluate_device(self, state: TrainState, eval_fn, n_models):
        """evaluate() over a device-resident val split: one dispatch via a
        make_fused_eval_fn program, then mean the per-model metrics."""
        ids = np.arange(n_models, dtype=np.int32)[:, None]
        out = eval_fn(state, jnp.asarray(ids))
        return {k: float(np.mean(np.asarray(v))) for k, v in out.items()}

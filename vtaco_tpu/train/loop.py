"""Training loop with the reference's cadences.

Counterpart of train.py:19-263 / train_depth.py: infinite epoch loop,
modulo-iteration triggers for print / validate / checkpoint / backup /
visualize, model_best selection by the configured metric, and the
``--exit-after N`` preemption contract (save + exit code 3,
train.py:258-263). Metrics stream to stdout and a jsonl file (the
reference used tensorboardX; jsonl needs no dependency and is
grep/plot-friendly).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Optional

import jax
import numpy as np

from vtaco_tpu.core.checkpoint import CheckpointIO
from vtaco_tpu.core.config import get_model, load_config
from vtaco_tpu.data import BatchLoader
from vtaco_tpu.data.core import get_dataset
from vtaco_tpu.ops.winding import MeshBank
from vtaco_tpu.train.trainer import Trainer
from vtaco_tpu.utils import meshio


class JsonlLogger:
    """Scalar logger: always jsonl (machine-checkable, greppable), plus
    optional TensorBoard event files for surface parity with the
    reference's ``SummaryWriter(os.path.join(out_dir, 'logs'))``
    (train.py:148) — enable with ``training.tensorboard: true``."""

    def __init__(self, path, tensorboard=False):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.f = open(path, "a")
        self.tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.dirname(path))
            except ImportError:
                print("Warning: training.tensorboard=true but tensorboardX "
                      "is not installed; writing jsonl only")

    def add_scalar(self, tag, value, step):
        self.f.write(json.dumps({"tag": tag, "value": float(value), "it": int(step)}) + "\n")
        self.f.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), int(step))

    def close(self):
        self.f.close()
        if self.tb is not None:
            self.tb.close()


def build_mesh_bank(cfg, dataset=None) -> Optional[MeshBank]:
    """Load every GT object mesh in the configured mesh directory.

    The reference builds its vf_dict from train-split model names only
    (train.py:162-174) and relies on val objects overlapping; loading the
    whole directory covers every split.
    """
    mesh_dir = cfg["data"].get("mesh_dir")
    if not mesh_dir or not os.path.isdir(mesh_dir):
        return None
    meshes = {}
    for path in sorted(glob.glob(os.path.join(mesh_dir, "*"))):
        base, ext = os.path.splitext(os.path.basename(path))
        if ext.lower() in (".off", ".obj") and base not in meshes:
            meshes[base] = meshio.read_triangle_mesh(path)
    return MeshBank(meshes) if meshes else None


def train(cfg, exit_after: int = -1, max_iters: Optional[int] = None,
          device_mesh=None, generator_factory=None):
    """Run training per cfg. Returns (state, it) on normal stop."""
    out_dir = cfg["training"]["out_dir"]
    batch_size = cfg["training"]["batch_size"]
    backup_every = cfg["training"]["backup_every"]
    print_every = cfg["training"]["print_every"]
    checkpoint_every = cfg["training"]["checkpoint_every"]
    validate_every = cfg["training"]["validate_every"]
    visualize_every = cfg["training"]["visualize_every"]

    metric = cfg["training"]["model_selection_metric"]
    mode = cfg["training"]["model_selection_mode"]
    if mode == "maximize":
        sign = 1
    elif mode == "minimize":
        sign = -1
    else:
        raise ValueError("model_selection_mode must be maximize or minimize")

    os.makedirs(out_dir, exist_ok=True)

    train_dataset = get_dataset("train", cfg)
    val_dataset = get_dataset("val", cfg, return_idx=True)
    if len(train_dataset) == 0:
        raise ValueError(
            "train split %r of %s contains no models"
            % (cfg["data"]["train_split"], cfg["data"]["path"])
        )
    if batch_size > len(train_dataset):
        # drop_last would otherwise yield zero batches (e.g. smoke runs on
        # a tiny synthetic split with the configs' full batch size)
        print(
            "Warning: batch_size %d > train split size %d; clamping"
            % (batch_size, len(train_dataset))
        )
        batch_size = len(train_dataset)
    val_dds = None
    if cfg["data"].get("on_device"):
        # whole split resident in HBM; batches assembled + augmented on
        # device (see vtaco_tpu.data.device_data)
        from vtaco_tpu.data.device_data import DeviceBatchLoader, DeviceDataset

        dds = DeviceDataset(
            train_dataset,
            pointcloud_noise=cfg["data"]["pointcloud_noise"],
        )
        print("device-resident dataset: %d models, %.1f MB in HBM"
              % (dds.n_models, dds.nbytes() / 1e6))
        train_loader = DeviceBatchLoader(
            dds, batch_size,
            n_points=cfg["data"]["points_subsample"],
            n_cloud=cfg["data"]["pointcloud_n"],
        )
        val_dds = DeviceDataset(
            val_dataset, pointcloud_noise=cfg["data"]["pointcloud_noise"]
        )
    else:
        train_loader = BatchLoader(
            train_dataset, batch_size,
            num_workers=cfg["training"]["n_workers"], shuffle=True,
        )
    val_loader_fn = lambda: BatchLoader(
        val_dataset, 1, shuffle=False,
        num_workers=cfg["training"]["n_workers_val"],
    )

    if device_mesh is None:
        from vtaco_tpu.parallel.mesh import mesh_from_config

        device_mesh = mesh_from_config(cfg, batch_size=batch_size)
        if device_mesh is not None:
            print(f"device mesh: {dict(device_mesh.shape)}")

    model, aux = get_model(cfg, dataset=train_dataset)
    bank = build_mesh_bank(cfg, train_dataset)
    trainer = Trainer.from_config(
        model, cfg, mesh_bank=bank, device_mesh=device_mesh
    )

    first_batch = next(iter(train_loader))
    resume_file = os.path.join(out_dir, cfg["test"]["model_file"])
    used_abstract_init = (
        os.path.exists(resume_file)
        and not cfg["test"]["model_file"].startswith(("http://", "https://"))
    )
    if used_abstract_init:
        # a resume restore overwrites every value below — skip the
        # multi-minute compiled init and build the structure only
        state = trainer.init_state_abstract(first_batch)
    else:
        state = trainer.init_state(first_batch)

    # pretrained t2d grafting (conv_onet/config.py:131-133). Must precede
    # the resume restore (the reference grafts at model build, before
    # train.py loads model.pt): a resumed checkpoint's fine-tuned
    # encoder_t2d weights win over the pretrained snapshot. A closure so
    # the rare restore-fallback re-init below can re-apply it.
    def graft_t2d(state):
        if not aux.get("t2d_pretrained_file"):
            return state
        t2d_file = aux["t2d_pretrained_file"]
        try:
            # raw (targetless) load: the t2d checkpoint's model structure is
            # the tactile experiment's, not this model's
            payload, _ = CheckpointIO(out_dir).load_raw(t2d_file)
            t2d_params = payload.get("state", {}).get("params", {})
            import flax
            import jax.numpy as jnp

            # preserve the params container type: opt_state was built on it
            was_frozen = isinstance(state.params, flax.core.FrozenDict)
            params = flax.core.unfreeze(state.params)
            grafted = []
            for sub in ("encoder_hand", "encoder_img"):
                src = t2d_params.get(sub)
                if src is None or sub not in params.get("encoder_t2d", {}):
                    continue
                dst = params["encoder_t2d"][sub]
                src_shapes = {tuple(map(str, p)): np.shape(v) for p, v in
                              flax.traverse_util.flatten_dict(src).items()}
                dst_shapes = {tuple(map(str, p)): np.shape(v) for p, v in
                              flax.traverse_util.flatten_dict(
                                  flax.core.unfreeze(dst)).items()}
                if src_shapes != dst_shapes:
                    bad = [k for k in src_shapes.keys() | dst_shapes.keys()
                           if src_shapes.get(k) != dst_shapes.get(k)][:4]
                    raise ValueError(
                        f"t2d checkpoint {sub} does not match the model's "
                        f"encoder_t2d.{sub} (config mismatch?) — first "
                        f"differing leaves: {bad}"
                    )
                params["encoder_t2d"][sub] = jax.tree.map(jnp.asarray, src)
                grafted.append(sub)
            state = state.replace(
                params=flax.core.freeze(params) if was_frozen else params
            )
            print(f"=> loaded pretrained t2d weights from {t2d_file} "
                  f"({', '.join(grafted)})")
        except FileNotFoundError:
            print(f"Warning: pretrained t2d checkpoint {t2d_file} not found")
        return state

    state = graft_t2d(state)
    ckpt = CheckpointIO(out_dir, state=state)
    epoch_it, it = 0, 0
    metric_val_best = -sign * np.inf
    try:
        restored, scalars = ckpt.load(cfg["test"]["model_file"], state=state)
        if "state" in restored:
            state = restored["state"]
        epoch_it = int(scalars.get("epoch_it", 0))
        it = int(scalars.get("it", 0))
        metric_val_best = float(scalars.get("loss_val_best", metric_val_best))
        print(f"=> resumed at it={it} (best {metric}={metric_val_best:.6f})")
    except FileNotFoundError:
        if used_abstract_init:
            # the checkpoint vanished between the exists-check and the
            # load: fall back to the real compiled init — never train
            # from the structure-only zeros
            state = graft_t2d(trainer.init_state(first_batch))
    if not np.isfinite(metric_val_best):
        metric_val_best = -sign * np.inf

    if device_mesh is not None:
        # commit the state to the mesh: TP-sharded over 'model' when that
        # axis is >1 (training.mesh.model), plain replication otherwise
        from vtaco_tpu.parallel.tp import shard_state

        state = shard_state(device_mesh, state)

    nparams = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print("Total number of parameters: %d" % nparams)
    print("output path: ", out_dir)

    logger = JsonlLogger(os.path.join(out_dir, "logs", "metrics.jsonl"),
                         tensorboard=cfg["training"].get("tensorboard", False))
    generator = generator_factory(model, cfg, bank) if generator_factory else None

    from vtaco_tpu.utils.profiling import ProfiledRegion, StepTimer, debug_nans

    if cfg["training"].get("debug_nans"):
        debug_nans(True)
    profiler = ProfiledRegion(cfg["training"].get("profile_dir"))
    timer = StepTimer()

    fused_val = None
    if val_dds is not None and val_dds.n_models:
        # whole-split validation in one dispatch
        fused_val = trainer.make_fused_eval_fn(
            val_dds, cfg["data"]["points_subsample"],
            cfg["data"]["pointcloud_n"],
        )
        if validate_every > 0:
            # pre-compile on a background thread so the first validation
            # doesn't stall training (abstract args — no buffers held; the
            # XLA artifact lands in the persistent compile cache)
            import threading

            def _precompile(abs_state=jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        x.shape, x.dtype,
                        sharding=getattr(x, "sharding", None)), state)):
                try:
                    ids = jax.ShapeDtypeStruct((val_dds.n_models, 1), np.int32)
                    fused_val.lower(abs_state, ids).compile()
                except Exception as e:  # best-effort warmup only
                    print("fused-val precompile skipped:", e)

            threading.Thread(target=_precompile, daemon=True).start()

    t0 = time.time()
    stop = False

    def post_step(it, scalars, state, exit_ok=True):
        """Everything after one optimization step: logging + the cadence
        triggers (print / validate / checkpoint / backup / visualize /
        exit-after / max-iters). Shared by the per-step and fused paths.
        ``exit_ok``: the fused path passes False mid-block — ``state``
        already holds the whole block's steps, so an exit-after save there
        would record an ``it`` behind the state; exits happen only at
        block boundaries."""
        nonlocal metric_val_best, stop
        timer.tick()
        for k, v in scalars.items():
            logger.add_scalar(f"train/{k}", v, it)

        if print_every > 0 and it % print_every == 0:
            msg = ", ".join(f"{k}={v:.4f}" for k, v in scalars.items())
            print(
                "[Epoch %02d] it=%03d, %s, %.2f it/s, time: %.2fs"
                % (epoch_it, it, msg, timer.steps_per_sec, time.time() - t0)
            )

        if validate_every > 0 and it % validate_every == 0:
            if fused_val is not None:
                eval_dict = trainer.evaluate_device(
                    state, fused_val, val_dds.n_models
                )
            else:
                eval_dict = trainer.evaluate(state, val_loader_fn())
            metric_val = eval_dict[metric]
            print("Validation metric (%s): %.4f" % (metric, metric_val))
            for k, v in eval_dict.items():
                logger.add_scalar(f"val/{k}", v, it)
            if sign * (metric_val - metric_val_best) > 0:
                metric_val_best = metric_val
                print("New best model (%s %.4f)" % (metric, metric_val_best))
                ckpt.register_modules(state=state)
                ckpt.save("model_best.ckpt", epoch_it=epoch_it, it=it,
                          loss_val_best=metric_val_best)

        if checkpoint_every > 0 and it % checkpoint_every == 0:
            print("Saving checkpoint at iteration: %d" % it)
            ckpt.register_modules(state=state)
            ckpt.save_async("model.ckpt", epoch_it=epoch_it, it=it,
                            loss_val_best=metric_val_best)

        if backup_every > 0 and it % backup_every == 0:
            print("Backup checkpoint at iteration: %d" % it)
            ckpt.register_modules(state=state)
            ckpt.save_async("model_%d.ckpt" % it, epoch_it=epoch_it,
                            it=it, loss_val_best=metric_val_best)

        if generator is not None and visualize_every > 0 and it % visualize_every == 0:
            try:
                generator.visualize(state, val_loader_fn(), out_dir, it)
            except Exception as e:  # visualization must not kill training
                print("visualize failed:", e)

        if exit_ok and exit_after > 0 and (time.time() - t0) >= exit_after:
            print("Time limit reached. Exiting.")
            ckpt.wait()
            ckpt.register_modules(state=state)
            ckpt.save("model.ckpt", epoch_it=epoch_it, it=it,
                      loss_val_best=metric_val_best)
            logger.close()  # flush buffered TB events before the requeue
            raise SystemExit(3)

        if max_iters is not None and it >= max_iters:
            stop = True

    fused_k = int(cfg["training"].get("steps_per_dispatch", 1) or 1)
    if cfg["data"].get("on_device") and fused_k > 1:
        # Fused mode: K train steps per XLA dispatch (lax.scan over
        # device-assembled batches). Blocks are split so state-dependent
        # cadences still fire at exactly their iteration; the remainder
        # runs through a length-1 variant (only two compiled programs).
        fused = trainer.make_fused_train_fn(
            train_loader.ds, train_loader.n_points, train_loader.n_cloud
        )
        steps_per_epoch = max(1, train_loader.ds.n_models // batch_size)

        def dist_to_cadence(it):
            ds_ = [fused_k]
            for c in (validate_every, checkpoint_every, backup_every,
                      visualize_every):
                if c and c > 0:
                    ds_.append(c - it % c)
            if max_iters is not None:
                ds_.append(max_iters - it)
            return max(1, min(ds_))

        while not stop:
            d = dist_to_cadence(it)
            k = fused_k if d >= fused_k else 1
            ids = train_loader.take_ids(k)
            profiler.maybe_start(it + 1)
            state, scal = fused(state, train_loader.next_key(), ids)
            scal = {k2: np.asarray(v) for k2, v in scal.items()}
            profiler.maybe_stop(it + 1)
            for j in range(k):
                it += 1
                epoch_it = 1 + (it - 1) // steps_per_epoch
                post_step(it, {k2: float(v[j]) for k2, v in scal.items()},
                          state, exit_ok=(j == k - 1))
                if stop:
                    break
    else:
        while not stop:
            epoch_it += 1
            for batch in train_loader:
                it += 1
                profiler.maybe_start(it)
                state, scalars = trainer.train_step(state, batch)
                profiler.maybe_stop(it)
                post_step(it, scalars, state)
                if stop:
                    break
    ckpt.wait()
    ckpt.register_modules(state=state)
    ckpt.save("model.ckpt", epoch_it=epoch_it, it=it,
              loss_val_best=metric_val_best)
    logger.close()
    return state, it

"""Train CLI.

Counterpart of the reference's train.py / train_depth.py entry points:

    python -m vtaco_tpu.cli.train configs/VTacO/VTacO_YCB.yaml [--exit-after N]

``--exit-after N`` saves a checkpoint and exits with code 3 after N seconds
(the reference's preemption/requeue contract, train.py:23-25, 258-263).
Both the occupancy configs and the tactile-estimator configs
(train_tactile: true) run through this one entry.
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a 3D reconstruction model.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument(
        "--exit-after", type=int, default=-1,
        help="Checkpoint and exit (code 3) after this many seconds.",
    )
    parser.add_argument("--max-iters", type=int, default=None,
                        help="Stop after N iterations (smoke runs).")
    parser.add_argument("--cpu", action="store_true",
                        help="Force the CPU backend.")
    parser.add_argument("--data-root", type=str, default=None,
                        help="Override data.path.")
    parser.add_argument("--mesh-root", type=str, default=None,
                        help="Override data.mesh_dir/depth_origin root.")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="Override training.batch_size.")
    parser.add_argument("--out-dir", type=str, default=None,
                        help="Override training.out_dir.")
    parser.add_argument("--on-device", action="store_true",
                        help="Keep the whole train split in HBM and "
                             "assemble/augment batches on device.")
    parser.add_argument("--steps-per-dispatch", type=int, default=None,
                        help="With --on-device: fuse K train steps into one "
                             "XLA dispatch (lax.scan) to amortize dispatch "
                             "latency.")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vtaco_tpu.core.cache import enable_persistent_cache
    from vtaco_tpu.parallel.multihost import initialize_distributed

    # no-op single-host; on pods set VTACO_COORDINATOR/_NUM_PROCESSES/
    # _PROCESS_ID explicitly, or VTACO_DISTRIBUTED=1 for Cloud TPU
    # auto-discovery (parallel/multihost.py)
    initialize_distributed(
        coordinator_address=os.environ.get("VTACO_COORDINATOR"),
        num_processes=(int(os.environ["VTACO_NUM_PROCESSES"])
                       if "VTACO_NUM_PROCESSES" in os.environ else None),
        process_id=(int(os.environ["VTACO_PROCESS_ID"])
                    if "VTACO_PROCESS_ID" in os.environ else None),
    )
    enable_persistent_cache()

    from vtaco_tpu.core.config import load_config
    from vtaco_tpu.train.loop import train

    default_cfg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "configs", "default.yaml",
    )
    cfg = load_config(args.config, default_cfg)
    if args.data_root:
        cfg["data"]["path"] = args.data_root
    if args.mesh_root:
        cfg["data"]["mesh_dir"] = os.path.join(args.mesh_root, "mesh_obj")
        cfg["data"]["depth_origin"] = os.path.join(args.mesh_root, "depth_origin.txt")
    if args.batch_size:
        cfg["training"]["batch_size"] = args.batch_size
    if args.out_dir:
        cfg["training"]["out_dir"] = args.out_dir
    if args.on_device:
        cfg["data"]["on_device"] = True
    if args.steps_per_dispatch:
        cfg["training"]["steps_per_dispatch"] = args.steps_per_dispatch

    out_dir = cfg["training"]["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    shutil.copyfile(args.config, os.path.join(out_dir, "config.yaml"))

    from vtaco_tpu.generate.generator import make_loop_generator

    train(cfg, exit_after=args.exit_after, max_iters=args.max_iters,
          generator_factory=make_loop_generator)


if __name__ == "__main__":
    main()

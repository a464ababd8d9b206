"""Mesh generation / inference CLI.

    python -m vtaco_tpu.cli.generate configs/VTacO/VTacO_YCB.yaml \
        [--split test] [--out-dir DIR] [--max-samples N]

Loads the configured checkpoint (test.model_file) and reconstructs object +
hand meshes for the chosen split, reporting mean EMD / chamfer. The batch
counterpart of the reference's periodic visualization pass
(train.py:239-256) and its Inferencer driver.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Reconstruct meshes from a checkpoint.")
    ap.add_argument("config", type=str)
    ap.add_argument("--split", default="test", choices=("train", "val", "test"))
    ap.add_argument("--out-dir", type=str, default=None)
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-root", type=str, default=None)
    ap.add_argument("--mesh-root", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="Override test.model_file.")
    ap.add_argument("--batched", type=int, default=0, metavar="B",
                    help="Pipelined B-object batched reconstruction "
                         "(plain occupancy decode; no tactile gating).")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vtaco_tpu.core.cache import enable_persistent_cache
    from vtaco_tpu.utils.host import enable_heap_reuse

    enable_persistent_cache()
    enable_heap_reuse()  # recycle grid-sized host buffers (utils/host.py)

    from vtaco_tpu.core.checkpoint import CheckpointIO
    from vtaco_tpu.core.config import get_dataset, get_model, load_config
    from vtaco_tpu.data import BatchLoader
    from vtaco_tpu.generate.generator import Generator3D
    from vtaco_tpu.generate.inferencer import Inferencer
    from vtaco_tpu.train.loop import build_mesh_bank
    from vtaco_tpu.train.trainer import Trainer

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cfg = load_config(args.config, os.path.join(here, "configs", "default.yaml"))
    if args.data_root:
        cfg["data"]["path"] = args.data_root
    if args.mesh_root:
        cfg["data"]["mesh_dir"] = os.path.join(args.mesh_root, "mesh_obj")
        cfg["data"]["depth_origin"] = os.path.join(args.mesh_root, "depth_origin.txt")

    dataset = get_dataset(args.split, cfg, return_idx=True)
    # the dataset drives the crop feature resolution for pointcloud_crop
    # configs (factory.py); without it the model builds at the default reso
    model, aux = get_model(cfg, dataset=dataset)
    loader = BatchLoader(dataset, 1, shuffle=False,
                        num_workers=cfg["training"]["n_workers_val"])

    bank = build_mesh_bank(cfg)
    trainer = Trainer.from_config(model, cfg, mesh_bank=bank)
    first = next(iter(BatchLoader(dataset, 1, shuffle=False, num_workers=1)))
    # structure-only state: values come from the checkpoint (skips the
    # multi-minute init compile)
    state = trainer.init_state_abstract(first)

    out_dir = cfg["training"]["out_dir"]
    ckpt_file = args.checkpoint or cfg["test"]["model_file"]
    ckpt = CheckpointIO(out_dir, state=state)
    try:
        restored, scalars = ckpt.load(ckpt_file, state=state)
        state = restored["state"]
        print(f"=> loaded {ckpt_file} (it={scalars.get('it')})")
    except FileNotFoundError:
        print(f"Warning: checkpoint {ckpt_file} not found — proceeding with "
              f"an untrained zero-init state (occupancy fields will be "
              f"constant and meshes empty)")

    generator = Generator3D.from_config(model, cfg)
    inferencer = Inferencer.from_config(model, generator, cfg)
    gen_dir = args.out_dir or os.path.join(out_dir, "generation")
    if args.batched:
        # pipelined multi-object serving (plain occupancy decode; host
        # marching cubes overlaps the next batch's device compute)
        results = inferencer.run_batched(
            state, loader, batch_size=args.batched,
            out_dir=gen_dir, max_samples=args.max_samples,
        )
        print(json.dumps({
            "split": args.split,
            "n": len(results["names"]),
            "cd_mean": results["cd_mean"],
            "batched": args.batched,
        }))
        return
    results = inferencer.run(
        state, loader,
        out_dir=gen_dir,
        max_samples=args.max_samples,
    )
    print(json.dumps({
        "split": args.split,
        "n": len(results["names"]),
        "emd_mean": results["emd_mean"],
        "cd_mean": results["cd_mean"],
    }))


if __name__ == "__main__":
    main()

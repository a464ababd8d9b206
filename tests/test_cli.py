"""CLI entry points, in-process (the reference's train.py / train_depth.py /
batch-inference surface: a config file in, artifacts out)."""

import json
import os

import numpy as np
import yaml

from tests.test_trainer import _small_cfg, synth  # noqa: F401  (fixture)


def _dump_cfg(cfg, tmp_path, **sections):
    for k, v in sections.items():
        cfg.setdefault(k, {}).update(v)
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_train_cli(synth, tmp_path, capsys):  # noqa: F811
    from vtaco_tpu.cli.train import main

    root, mesh_root = synth
    out_dir = str(tmp_path / "out")
    cfg_path = _dump_cfg(
        _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root),
        tmp_path,
        training={"out_dir": out_dir, "batch_size": 2, "validate_every": 2,
                  "checkpoint_every": 2, "n_workers": 1, "n_workers_val": 1},
    )
    main([cfg_path, "--max-iters", "2", "--cpu"])

    # the reference's provenance copy (train.py:55), checkpoint, metrics log
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))
    assert os.path.exists(os.path.join(out_dir, "model.ckpt"))
    log = os.path.join(out_dir, "logs", "metrics.jsonl")
    tags = [json.loads(l)["tag"] for l in open(log)]
    assert any(t.startswith("train/") for t in tags)
    assert any(t.startswith("val/") for t in tags)


def test_generate_cli(synth, tmp_path, capsys):  # noqa: F811
    """Train-then-generate through the CLIs: the checkpoint written by the
    train entry must reconstruct meshes through the inference entry (the
    reference's train.py → periodic-vis / Inferencer handoff)."""
    from vtaco_tpu.cli.generate import main as gen_main
    from vtaco_tpu.cli.train import main as train_main

    root, mesh_root = synth
    out_dir = str(tmp_path / "out")
    cfg_path = _dump_cfg(
        _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root),
        tmp_path,
        training={"out_dir": out_dir, "batch_size": 2, "validate_every": -1,
                  "visualize_every": -1, "checkpoint_every": 2,
                  "n_workers": 1, "n_workers_val": 1},
        # nx = 16 dense grid; 'mean' iso level — a barely-trained field's
        # narrow logit range can miss the fixed midpoint (empty mesh)
        generation={"resolution_0": 4, "mc_level": "mean"},
    )
    train_main([cfg_path, "--max-iters", "2", "--cpu"])
    gen_main([cfg_path, "--split", "train", "--max-samples", "1", "--cpu",
              "--checkpoint", "model.ckpt"])

    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert res["split"] == "train" and res["n"] == 1
    assert np.isfinite(res["cd_mean"])
    meshes = [f for f in os.listdir(os.path.join(out_dir, "generation"))
              if f.endswith((".off", ".obj"))]
    assert meshes, "no mesh written"

    # --checkpoint with an ABSOLUTE path (the reference resolves relative
    # model_file against out_dir, checkpoints.py:34-35 — absolute must
    # bypass that) into a separate out dir
    alt_out = str(tmp_path / "alt_gen")
    gen_main([cfg_path, "--split", "train", "--max-samples", "1", "--cpu",
              "--checkpoint", os.path.join(out_dir, "model.ckpt"),
              "--out-dir", alt_out])
    assert [f for f in os.listdir(alt_out) if f.endswith(".off")]

    # --batched B: the DP batched-inference surface (Inferencer.run_batched)
    bat_out = str(tmp_path / "batched_gen")
    gen_main([cfg_path, "--split", "train", "--max-samples", "2", "--cpu",
              "--checkpoint", "model.ckpt", "--batched", "2",
              "--out-dir", bat_out])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res_b = json.loads(line)
    assert res_b["n"] == 2
    bmeshes = [f for f in os.listdir(bat_out) if f.endswith(".off")]
    assert len(bmeshes) >= 2, bmeshes


def test_train_cli_crop(synth, tmp_path):  # noqa: F811
    """Sliding-window (pointcloud_crop) config through the train CLI:
    crop fields + patch encoder/decoder end to end, checkpoint out."""
    from vtaco_tpu.cli.train import main

    root, _ = synth
    from vtaco_tpu.core.config import load_config

    cfg = load_config("configs/crop/scene_crop.yaml", "configs/default.yaml")
    np.random.seed(0)  # crop-center draw: avoid zero-query windows
    cfg["data"].update(path=root, points_subsample=128, pointcloud_n=128,
                       query_vol_size=16)
    cfg["model"]["encoder_kwargs"].update(hidden_dim=8)
    cfg["model"]["encoder_kwargs"]["unet_kwargs"].update(depth=2,
                                                         start_filts=8)
    cfg["model"]["encoder_kwargs"]["unet3d_kwargs"]["num_levels"] = 1
    cfg["model"]["decoder_kwargs"].update(hidden_size=16)
    out_dir = str(tmp_path / "out_crop")
    cfg_path = _dump_cfg(
        cfg, tmp_path,
        training={"out_dir": out_dir, "batch_size": 2, "validate_every": -1,
                  "visualize_every": -1, "checkpoint_every": 2,
                  "n_workers": 1, "n_workers_val": 1},
    )
    main([cfg_path, "--max-iters", "2", "--cpu"])
    assert os.path.exists(os.path.join(out_dir, "model.ckpt"))
    log = os.path.join(out_dir, "logs", "metrics.jsonl")
    assert any(json.loads(l)["tag"].startswith("train/") for l in open(log))

"""Resume-equivalence: a killed run restarts from model.ckpt with its
iteration counter, best-metric and parameters intact.

Mirrors the reference's preemption contract (train.py:119-128 restore +
train.py:258-263 save-and-exit-3): run → preempt → restart must continue
the same training trajectory, for both the per-step and the fused
(steps_per_dispatch) loops.
"""

import json
import os

import numpy as np
import pytest

from vtaco_tpu.core.checkpoint import CheckpointIO
from vtaco_tpu.train.loop import train

from tests.test_trainer import _small_cfg, synth  # noqa: F401  (fixture)


def _cfg(root, mesh_root, out_dir, **data_over):
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root,
                     **data_over)
    cfg["training"].update(
        out_dir=out_dir, batch_size=2, print_every=1,
        validate_every=2, checkpoint_every=2, backup_every=0,
        visualize_every=0, n_workers=1, n_workers_val=1,
    )
    return cfg


def _loss_its(out_dir):
    its = []
    with open(os.path.join(out_dir, "logs", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "train/loss":
                its.append(rec["it"])
    return its


def test_resume_continues_iteration_and_params(synth, tmp_path, capsys):
    root, mesh_root = synth
    out = str(tmp_path / "run")
    cfg = _cfg(root, mesh_root, out)

    state1, it1 = train(cfg, max_iters=3)
    assert it1 == 3

    # the on-disk checkpoint holds exactly the returned state + counters
    payload, scalars = CheckpointIO(out).load_raw("model.ckpt")
    assert int(scalars["it"]) == 3
    saved = payload["state"]["params"]
    import jax

    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    best1 = float(scalars["loss_val_best"])
    assert np.isfinite(best1)  # validate_every=2 fired during the run

    capsys.readouterr()
    state2, it2 = train(cfg, max_iters=6)
    outtxt = capsys.readouterr().out
    assert f"resumed at it=3 (best iou={best1:.6f})" in outtxt
    assert it2 == 6

    # iteration continuity: its 1..6 each logged exactly once (a failed
    # resume would restart at 1 and duplicate 1..3)
    its = _loss_its(out)
    assert sorted(its) == [1, 2, 3, 4, 5, 6]

    _, scalars2 = CheckpointIO(out).load_raw("model.ckpt")
    assert int(scalars2["it"]) == 6
    # best metric never regresses across the restart (maximize mode)
    assert float(scalars2["loss_val_best"]) >= best1


def test_preemption_exit_code_then_resume(synth, tmp_path):
    root, mesh_root = synth
    out = str(tmp_path / "run")
    cfg = _cfg(root, mesh_root, out)
    cfg["training"].update(validate_every=0, checkpoint_every=0)

    with pytest.raises(SystemExit) as e:
        train(cfg, exit_after=1e-6, max_iters=10)
    assert e.value.code == 3

    _, scalars = CheckpointIO(out).load_raw("model.ckpt")
    it_saved = int(scalars["it"])
    assert it_saved >= 1

    _, it2 = train(cfg, max_iters=it_saved + 2)
    assert it2 == it_saved + 2
    assert sorted(_loss_its(out)) == list(range(1, it_saved + 3))


def test_fused_dispatch_resumes(synth, tmp_path, capsys):
    root, mesh_root = synth
    out = str(tmp_path / "run")
    cfg = _cfg(root, mesh_root, out, on_device=True)
    cfg["training"].update(steps_per_dispatch=2, validate_every=4,
                          checkpoint_every=4)

    _, it1 = train(cfg, max_iters=4)
    assert it1 == 4
    _, scalars = CheckpointIO(out).load_raw("model.ckpt")
    assert int(scalars["it"]) == 4

    capsys.readouterr()
    _, it2 = train(cfg, max_iters=8)
    outtxt = capsys.readouterr().out
    assert "resumed at it=4" in outtxt
    assert it2 == 8
    assert sorted(_loss_its(out)) == list(range(1, 9))

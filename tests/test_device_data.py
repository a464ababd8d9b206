"""Device-resident dataset + fused multi-step dispatch tests (CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtaco_tpu.core.config import get_dataset, get_model, load_config
from vtaco_tpu.data.device_data import DeviceBatchLoader, DeviceDataset
from vtaco_tpu.data.synthetic import generate
from vtaco_tpu.train.loop import build_mesh_bank
from vtaco_tpu.train.trainer import Trainer

from test_trainer import _small_cfg  # noqa: F401  (tiny-config helper)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_dd")
    root, mesh_root = generate(
        str(out), n_models=6, n_query=500, n_surface=1000,
        img_h=16, img_w=12, seed=3, splits=(("train", 1.0),),
    )
    return root, mesh_root


@pytest.fixture(scope="module")
def dds(synth):
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    ds = get_dataset("train", cfg)
    return cfg, DeviceDataset(ds, pointcloud_noise=cfg["data"]["pointcloud_noise"])


def test_sampler_shapes_and_rng(dds):
    cfg, d = dds
    assert d.n_models == 6 and d.nbytes() > 0
    rng = jax.random.PRNGKey(0)
    b = d.sample_batch(rng, np.array([0, 3]), n_points=64, n_cloud=32)
    assert b["points"].shape == (2, 64, 3)
    assert b["points.occ"].shape == (2, 64)
    assert b["inputs"].shape == (2, 32, 3)
    assert b["inputs.img"].shape[:2] == (2, 5)
    assert b["inputs.touch_success"].dtype == jnp.bool_
    assert b["points.name"] == [d.names[0], d.names[3]]
    # image scaling: legacy double-/255 keeps values in [0, 1/255]
    assert float(jnp.max(b["inputs.img"])) <= 1 / 255 + 1e-6
    # same key → identical batch; different key → different subsample
    b2 = d.sample_batch(rng, np.array([0, 3]), n_points=64, n_cloud=32)
    np.testing.assert_array_equal(b["points"], b2["points"])
    b3 = d.sample_batch(jax.random.PRNGKey(1), np.array([0, 3]), 64, 32)
    assert not np.array_equal(np.asarray(b["points"]), np.asarray(b3["points"]))


def test_loader_epoch_and_id_stream(dds):
    cfg, d = dds
    loader = DeviceBatchLoader(d, batch_size=2, n_points=64, n_cloud=32, seed=0)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    ids = loader.take_ids(5)  # 10 ids: one full epoch (6) + 4 of the next
    assert ids.shape == (5, 2) and ids.dtype == np.int32
    assert sorted(ids.ravel()[:6].tolist()) == list(range(6))


def test_fused_steps_match_sequential(dds):
    """K steps in one scanned dispatch == K sequential jitted steps."""
    cfg, d = dds
    model, _ = get_model(cfg)
    bank = build_mesh_bank(cfg)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank, contact_per_finger=16)
    n_points, n_cloud = 64, 32

    rng = jax.random.PRNGKey(7)
    ids = np.array([[0, 1], [2, 3], [4, 5]], np.int32)
    state0 = tr.init_state(d.sample_batch(rng, ids[0], n_points, n_cloud))

    # sequential replay with the same per-step keys and ids (runs first:
    # the fused call donates state0's buffers)
    state_s = state0
    keys = jax.random.split(rng, 3)
    seq_losses = []
    for i in range(3):
        batch = d.sample_batch(keys[i], ids[i], n_points, n_cloud)
        state_s, sc = tr.train_step(state_s, batch)
        seq_losses.append(sc["loss"])

    fused = tr.make_fused_train_fn(d, n_points, n_cloud)
    state_f, scal_f = fused(state0, rng, jnp.asarray(ids))
    assert all(v.shape == (3,) for v in scal_f.values())

    # scan vs unrolled compile differ in fusion order → small float drift
    np.testing.assert_allclose(
        np.asarray(scal_f["loss"]), np.asarray(seq_losses), rtol=5e-4, atol=5e-5
    )
    assert int(state_f.step) == int(state_s.step) == 3
    for a, b in zip(jax.tree.leaves(state_f.params), jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)


def test_fused_loop_end_to_end(tmp_path):
    """train() in fused mode: cadences fire at the right iterations."""
    from vtaco_tpu.train.loop import train

    root, mesh_root = generate(
        str(tmp_path / "data"), n_models=6, n_query=500, n_surface=1000,
        img_h=16, img_w=12, seed=5,
        splits=(("train", 0.7), ("val", 0.3)),
    )
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    cfg["data"]["on_device"] = True
    cfg["training"].update(
        out_dir=str(tmp_path), batch_size=2, steps_per_dispatch=4,
        validate_every=4, visualize_every=0, checkpoint_every=5,
        backup_every=0, print_every=2,
    )
    state, it = train(cfg, max_iters=7)
    assert it == 7 and int(state.step) == 7
    assert os.path.exists(os.path.join(str(tmp_path), "model.ckpt"))
    # fused (device-resident) validation ran and selected a best model
    assert os.path.exists(os.path.join(str(tmp_path), "model_best.ckpt"))
    import json

    vals = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "logs", "metrics.jsonl"))]
    assert any(v["tag"] == "val/iou" and v["it"] == 4 for v in vals)


def test_fused_eval_fn(dds):
    cfg, d = dds
    model, _ = get_model(cfg)
    bank = build_mesh_bank(cfg)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank, contact_per_finger=16)
    state = tr.init_state(
        d.sample_batch(jax.random.PRNGKey(0), np.array([0, 1]), 64, 32)
    )
    eval_fn = tr.make_fused_eval_fn(d, n_points=64, n_cloud=32)
    out = tr.evaluate_device(state, eval_fn, d.n_models)
    assert {"loss", "iou"} <= set(out)
    assert 0.0 <= out["iou"] <= 1.0 and np.isfinite(out["loss"])
    # deterministic: same state → identical metrics
    out2 = tr.evaluate_device(state, eval_fn, d.n_models)
    assert out == out2


def test_resume_keeps_finetuned_t2d(tmp_path):
    """Checkpoint resume must win over the pretrained-t2d graft: the graft
    runs at build time (conv_onet/config.py:131-133), the resume restore
    after it — a requeued run must not clobber fine-tuned encoder_t2d
    weights with the stale pretrained snapshot."""
    import flax
    import jax.numpy as jnp

    from vtaco_tpu.core.checkpoint import CheckpointIO
    from vtaco_tpu.train.loop import train

    root, mesh_root = generate(
        str(tmp_path / "data"), n_models=6, n_query=400, n_surface=800,
        img_h=16, img_w=12, seed=9, splits=(("train", 0.7), ("val", 0.3)),
    )
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    out = str(tmp_path / "out")
    cfg["training"].update(out_dir=out, batch_size=2, validate_every=0,
                           visualize_every=0, checkpoint_every=0,
                           backup_every=0, print_every=0)
    # build a pretrained t2d checkpoint from the tactile config
    tcfg = _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root)
    tmodel, _ = get_model(tcfg)
    ttr = Trainer.from_config(tmodel, tcfg)
    tds = get_dataset("train", tcfg)
    from vtaco_tpu.data import BatchLoader

    tb = next(iter(BatchLoader(tds, 2, num_workers=1, seed=0)))
    tstate = ttr.init_state(tb)
    t2d_path = str(tmp_path / "t2d.ckpt")
    CheckpointIO(out, state=tstate).save(t2d_path, it=1)
    cfg["model"]["encoder_t2d_kwargs"]["model_file"] = t2d_path

    state1, _ = train(cfg, max_iters=1)  # writes out/model.ckpt at exit

    # simulate fine-tuning drift: perturb encoder_t2d in the checkpoint
    ck = CheckpointIO(out, state=state1)
    restored, scalars = ck.load("model.ckpt", state=state1)
    st = restored["state"]
    params = flax.core.unfreeze(st.params)
    leaf = params["encoder_t2d"]["encoder_hand"]["fc_pos"]["bias"]
    params["encoder_t2d"]["encoder_hand"]["fc_pos"]["bias"] = leaf + 123.0
    st = st.replace(params=flax.core.freeze(params))
    CheckpointIO(out, state=st).save("model.ckpt", **scalars)

    state2, _ = train(cfg, max_iters=2)  # resumes at it=1, runs 1 more step
    got = np.asarray(
        state2.params["encoder_t2d"]["encoder_hand"]["fc_pos"]["bias"]
    )
    # the perturbation must survive the graft (graft-then-restore order);
    # one optimizer step can move it only marginally
    assert np.all(np.abs(got - np.asarray(leaf)) > 100.0)

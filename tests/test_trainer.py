"""End-to-end trainer/generator tests on the synthetic dataset (tiny)."""

import glob
import os

import numpy as np
import pytest

from vtaco_tpu.core.config import get_dataset, get_model, load_config
from vtaco_tpu.data import BatchLoader
from vtaco_tpu.data.synthetic import generate
from vtaco_tpu.train.loop import build_mesh_bank
from vtaco_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    root, mesh_root = generate(
        str(out), n_models=4, n_query=500, n_surface=1000,
        img_h=16, img_w=12, seed=7,
    )
    return root, mesh_root


def _small_cfg(path, root, mesh_root, **data_over):
    cfg = load_config(path, "configs/default.yaml")
    cfg["data"].update(
        path=root,
        points_subsample=256,
        pointcloud_n=128,
        num_sample=256,
        mesh_dir=os.path.join(mesh_root, "mesh_obj"),
        depth_origin=os.path.join(mesh_root, "depth_origin.txt"),
    )
    cfg["data"].update(data_over)
    m = cfg["model"]
    for kw in (m.get("encoder_kwargs"), m.get("encoder_hand_kwargs")):
        if isinstance(kw, dict):
            kw["hidden_dim"] = 8
    if isinstance(m.get("encoder_kwargs"), dict) and m["encoder_kwargs"].get("unet3d"):
        m["encoder_kwargs"]["grid_resolution"] = 8
        m["encoder_kwargs"]["unet3d_kwargs"].update(
            num_levels=2, f_maps=8, out_channels=32
        )
    if isinstance(m.get("encoder_hand_kwargs"), dict):
        m["encoder_hand_kwargs"]["plane_resolution"] = 8
        if m["encoder_hand_kwargs"].get("unet"):
            m["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
    if m.get("train_tactile"):
        # shrink the 512 default c_dim; the VTacO t2d kwargs below shrink
        # identically so pretrained-t2d grafting stays structure-compatible
        m["c_dim"] = 32
    if isinstance(m.get("encoder_t2d_kwargs"), dict):
        tk = m["encoder_t2d_kwargs"]
        tk["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8,
                                         c_dim=32)
        tk["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
        tk["encoder_img_kwargs"].update(depth=2, start_filts=8)
    if isinstance(m.get("encoder_img_kwargs"), dict) and m.get("encoder_img") == "UNet":
        m["encoder_img_kwargs"].update(depth=2, start_filts=8)
    if isinstance(m.get("decoder_kwargs"), dict):
        m["decoder_kwargs"]["hidden_size"] = 16
    return cfg


def test_tactile_path_trains(synth):
    root, mesh_root = synth
    cfg = _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    tr = Trainer.from_config(model, cfg)
    ds = get_dataset("train", cfg)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    losses = []
    for _ in range(4):
        state, sc = tr.train_step(state, batch)
        losses.append(sc["loss"])
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfitting one batch must reduce loss
    ev = tr.eval_step(state, batch)
    assert set(ev) >= {"loss", "loss_depth"}


def test_vtaco_t2d_img_path(synth):
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    model, aux = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg, ds)
    assert bank is not None and len(bank.names) >= 2
    tr = Trainer.from_config(model, cfg, mesh_bank=bank, contact_per_finger=32)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    state, sc = tr.train_step(state, batch)
    assert set(sc) >= {"loss", "loss_l1", "loss_mano", "loss_pc"}
    assert all(np.isfinite(list(sc.values())))
    # eval with IoU on winding labels
    val = get_dataset("val", cfg)
    vb = next(iter(BatchLoader(val, 1, shuffle=False, num_workers=1)))
    ev = tr.eval_step(state, vb)
    assert "iou" in ev and 0.0 <= ev["iou"] <= 1.0


def test_contact_head_loss_path(synth):
    """with_contact=True (compute_loss_contact, training.py:896-948): the
    second decoder head trains against the near-surface contact labels.
    The synthetic labels must not be degenerate (all-zero labels once made
    this path vacuous) and the BCE must move under training."""
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    m = cfg["model"]
    m.update(with_img=False, with_contact=True, encoder_t2d=False,
             encoder_img=False, encoder_t2d_kwargs=None)
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    assert np.asarray(batch["points.contact"]).sum() > 0, (
        "synthetic contact labels are degenerate"
    )
    tr = Trainer.from_config(model, cfg)
    state = tr.init_state(batch)
    scs = []
    for _ in range(3):
        state, sc = tr.train_step(state, batch)
        scs.append(sc)
    assert "loss_contact" in scs[0]
    assert all(np.isfinite(s["loss_contact"]) for s in scs)
    assert scs[-1]["loss"] < scs[0]["loss"]


def test_pred_depth_contact_mode(synth):
    """legacy_gt_depth=False (the non-quirk mode): train AND eval gate
    contact sampling on the t2d-predicted depths. Both must run finite,
    and the eval step must differ from the GT-depth trainer's (it gates
    on a different query distribution) while both gates stay consistent
    between their own train/eval."""
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    cfg["training"]["legacy_gt_depth"] = False
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg, ds)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank,
                             contact_per_finger=32)
    assert tr.legacy_gt_depth is False
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    state, sc = tr.train_step(state, batch)
    assert all(np.isfinite(list(sc.values()))), sc
    val = get_dataset("val", cfg)
    vb = next(iter(BatchLoader(val, 1, shuffle=False, num_workers=1)))
    ev = tr.eval_step(state, vb)
    assert "iou" in ev and np.isfinite(ev["iou"])

    # the GT-depth trainer evaluates the same state on different queries
    cfg2 = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    tr_gt = Trainer.from_config(model, cfg2, mesh_bank=bank,
                                contact_per_finger=32)
    assert tr_gt.legacy_gt_depth is True
    ev_gt = tr_gt.eval_step(state, vb)
    assert np.isfinite(ev_gt["iou"])


def test_skip_unused_t2d_loss_identical(synth):
    """In the shipped VTacO path (pretrained t2d + legacy GT depth) the t2d
    forward never reaches the loss — dropping it must not change any loss
    scalar (only the frozen t2d's BatchNorm stats stop drifting)."""
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg, ds)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    tr_ref = Trainer.from_config(model, cfg, mesh_bank=bank,
                                 contact_per_finger=32)
    tr_skip = Trainer.from_config(model, cfg, mesh_bank=bank,
                                  contact_per_finger=32,
                                  skip_unused_t2d=True)
    state = tr_ref.init_state(batch)
    _, sc_ref = tr_ref.train_step(state, batch)
    _, sc_skip = tr_skip.train_step(state, batch)
    assert set(sc_ref) == set(sc_skip)
    for k in sc_ref:
        np.testing.assert_allclose(sc_skip[k], sc_ref[k], rtol=1e-6, atol=1e-7)


def test_bf16_compute_dtype_trains(synth):
    """Mixed-precision training (bf16 activations in the encoders, f32
    decoder/master state/geometry) must run finite, reduce the loss, and
    keep all state leaves f32. Also pins the selective-cast recipe: the
    decoder subtree is excluded by default (bf16 decoder training
    measurably drops held-out IoU)."""
    import jax
    import jax.numpy as jnp

    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg, ds)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank, contact_per_finger=32,
                             compute_dtype="bfloat16")
    assert tr.keep_f32_modules == ("decoder",)
    cast = tr._cast_params(
        {"decoder": {"w": jnp.ones(2)}, "encoder": {"w": jnp.ones(2)}}
    )
    assert cast["decoder"]["w"].dtype == jnp.float32
    assert cast["encoder"]["w"].dtype == jnp.bfloat16
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    losses = []
    for _ in range(8):
        state, sc = tr.train_step(state, batch)
        losses.append(sc["loss"])
    assert all(np.isfinite(losses))
    # bf16 steps are noisier than f32; require progress over the run, not
    # strict monotonicity at a fixed step count
    assert min(losses[4:]) < losses[0]
    for leaf in jax.tree.leaves(state.params) + jax.tree.leaves(state.batch_stats):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_fast_config_reaches_trainer(synth):
    """configs/VTacO/VTacO_YCB_fast.yaml: the execution-strategy keys must
    flow through from_config (same model/loss as VTacO_YCB, fast options
    on)."""
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB_fast.yaml", root, mesh_root)
    assert cfg["data"]["on_device"] is True
    assert cfg["training"]["steps_per_dispatch"] == 8
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg, ds)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank)
    assert tr.compute_dtype == "bfloat16"
    assert tr.skip_unused_t2d is True

    cfgh = _small_cfg("configs/VTacOH/VTacOH_YCB_fast.yaml", root, mesh_root)
    assert cfgh["data"]["on_device"] is True
    assert cfgh["training"]["steps_per_dispatch"] == 8
    modelh, _ = get_model(cfgh)
    trh = Trainer.from_config(modelh, cfgh, mesh_bank=bank)
    assert trh.compute_dtype == "bfloat16"
    assert trh.keep_f32_modules == ("decoder",)

    cfgt = _small_cfg("configs/tactile/tactile_test_fast.yaml", root,
                      mesh_root)
    assert cfgt["data"]["on_device"] is True
    modelt, _ = get_model(cfgt)
    trt = Trainer.from_config(modelt, cfgt)
    assert trt.train_tactile and trt.compute_dtype == "bfloat16"


def test_vtacoh_img_path(synth):
    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacOH/VTacOH_YCB.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    tr = Trainer.from_config(model, cfg, tips_per_finger=32)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    state, sc = tr.train_step(state, batch)
    assert all(np.isfinite(list(sc.values())))

    # fused band mesh program, 'tips' gating mode (VTacOH: with_img,
    # no t2d — fingertip-proximity features from the in-program MANO pass)
    from vtaco_tpu.generate.generator import Generator3D

    cfg["generation"]["resolution_0"] = 8
    genh = Generator3D.from_config(model, cfg, band_transfer=True)
    val = get_dataset("val", cfg, return_idx=True)
    vb1 = next(iter(BatchLoader(val, 1, shuffle=False, num_workers=1)))
    (vh, fh), _, cdh = genh.generate_obj_mesh_wnf(state, vb1)
    assert np.isfinite(cdh) and genh.band_overflows == 0
    assert fh.ndim == 2 and fh.shape[1] == 3


def test_checkpoint_roundtrip(synth, tmp_path):
    from vtaco_tpu.core.checkpoint import CheckpointIO

    root, mesh_root = synth
    cfg = _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    tr = Trainer.from_config(model, cfg)
    ds = get_dataset("train", cfg)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    state, _ = tr.train_step(state, batch)

    ckpt = CheckpointIO(str(tmp_path), state=state)
    ckpt.save("model.ckpt", it=7, epoch_it=1, loss_val_best=0.25)
    restored, scalars = ckpt.load("model.ckpt", state=state)
    assert scalars["it"] == 7 and abs(scalars["loss_val_best"] - 0.25) < 1e-9
    r = restored["state"]
    a = np.concatenate([np.ravel(x) for x in __import__("jax").tree.leaves(r.params)])
    b = np.concatenate(
        [np.ravel(x) for x in __import__("jax").tree.leaves(state.params)]
    )
    np.testing.assert_allclose(a, b)
    with pytest.raises(FileNotFoundError):
        ckpt.load("missing.ckpt")

    # URL loading (src/checkpoints.py:72-82): fetched into the checkpoint
    # dir by basename, then loaded like a local file
    import functools
    import http.server
    import threading

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/model.ckpt"
        ckpt2 = CheckpointIO(str(tmp_path / "dl"), state=state)
        _, scalars2 = ckpt2.load(url, state=state)
        assert scalars2["it"] == 7
        assert os.path.exists(tmp_path / "dl" / "model.ckpt")
    finally:
        httpd.shutdown()

    import urllib.error

    with pytest.raises(urllib.error.URLError):
        CheckpointIO(str(tmp_path / "dl2"), state=state).load(
            "http://127.0.0.1:9/nope.ckpt"  # discard port: refused fast
        )


def test_generator_obj_mesh(synth):
    from vtaco_tpu.generate.generator import Generator3D

    root, mesh_root = synth
    cfg = _small_cfg("configs/VTacO/VTacO_YCB.yaml", root, mesh_root)
    cfg["generation"]["resolution_0"] = 8  # nx = 32
    cfg["generation"]["batch_size"] = 16384
    model, _ = get_model(cfg)
    ds = get_dataset("train", cfg)
    bank = build_mesh_bank(cfg, ds)
    tr = Trainer.from_config(model, cfg, mesh_bank=bank, contact_per_finger=32)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)

    gen = Generator3D.from_config(model, cfg, contact_per_finger=32)
    val = get_dataset("val", cfg, return_idx=True)
    vb = next(iter(BatchLoader(val, 1, shuffle=False, num_workers=1)))
    (verts, faces), emd, cd = gen.generate_obj_mesh_wnf(state, vb)
    assert np.isfinite(emd) and np.isfinite(cd)
    assert faces.ndim == 2 and faces.shape[1] == 3
    hv, hf = gen.generate_hand_mesh(state, vb)
    assert hv.shape == (778, 3) and hf.shape[1] == 3

    # fused one-dispatch band path (encode + contact gates + gated decode
    # + iso-band in ONE program, generator._mesh_band_impl) vs the
    # multi-dispatch legacy path at exact f32 transfer: same surface up to
    # XLA fusion drift (the programs differ, the math doesn't)
    gen_f32 = Generator3D.from_config(model, cfg, contact_per_finger=32,
                                      transfer_dtype="float32")
    (v_ref, _), _, _ = gen_f32.generate_obj_mesh_wnf(state, vb)
    gen_b = Generator3D.from_config(model, cfg, contact_per_finger=32,
                                    band_transfer=True)
    (v_b, f_b), emd_b, cd_b = gen_b.generate_obj_mesh_wnf(state, vb)
    assert np.isfinite(cd_b) and gen_b.band_overflows == 0
    assert f_b.shape[1] == 3 and len(v_b) > 0
    from vtaco_tpu import native

    for a, b in ((v_ref, v_b), (v_b, v_ref)):
        d2, _ = native.geom.nearest(a, b)
        assert float(np.sqrt(d2.max())) < 5e-3, np.sqrt(d2.max())

    # eval_points_dense_band(inputs=...) — encode fused into the band
    # program — must match the two-dispatch c= variant (same math,
    # different program boundaries)
    import jax.numpy as jnp

    inputs1 = jnp.asarray(vb["inputs"])
    cc = gen_b._apply(state, model.encode_inputs, inputs1, train=False)
    g1, l1 = gen_b.eval_points_dense_band(state, 16, cc)
    g2, l2 = gen_b.eval_points_dense_band(state, 16, inputs=inputs1)
    assert abs(l1 - l2) < 1e-5
    np.testing.assert_allclose(g1, g2, atol=1e-4)

    # mc_level options flow from config and produce (possibly empty) meshes
    cfg["generation"]["mc_level"] = "mean"
    gen_m = Generator3D.from_config(model, cfg, contact_per_finger=32)
    assert gen_m.mc_level == "mean"
    (_, _), emd_m, cd_m = gen_m.generate_obj_mesh_wnf(state, vb)
    assert np.isfinite(cd_m)

    # MISE coarse-to-fine extraction end to end (8 -> 16 final grid)
    mv, mf = gen.generate_obj_mesh_mise(state, vb, resolution0=8,
                                        upsampling_steps=1)
    assert mv.ndim == 2 and mv.shape[1] == 3
    assert mf.ndim == 2 and mf.shape[1] == 3


def test_tactile_generator_pc(synth):
    from vtaco_tpu.generate.generator import Generator3D

    root, mesh_root = synth
    cfg = _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    tr = Trainer.from_config(model, cfg)
    ds = get_dataset("train", cfg)
    batch = next(iter(BatchLoader(ds, batch_size=1, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    gen = Generator3D.from_config(model, cfg)
    pcs = gen.generate_tactile_pc(state, batch)
    assert pcs.shape == (1, 5, 16 * 12, 3)
    assert np.isfinite(pcs).all()


def test_crop_mode_trains(synth):
    """Sliding-window (pointcloud_crop) path end to end: crop fields →
    patch encoder/decoder → one train step."""
    root, mesh_root = synth
    cfg = load_config("configs/crop/scene_crop.yaml", "configs/default.yaml")
    # query_vol_size 16 + a fixed seed: the crop center is drawn uniformly
    # over the cloud's bbox (core.py:118 / reference core.py:185-232), and a
    # tiny window can land on zero query points — such samples are dropped
    # (reference parity), which on this 4-model set can empty the epoch.
    np.random.seed(0)
    cfg["data"].update(path=root, points_subsample=128, pointcloud_n=128,
                       query_vol_size=16)
    cfg["model"]["encoder_kwargs"].update(hidden_dim=8)
    cfg["model"]["encoder_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
    cfg["model"]["encoder_kwargs"]["unet3d_kwargs"]["num_levels"] = 1
    cfg["model"]["decoder_kwargs"].update(hidden_size=16)

    ds = get_dataset("train", cfg)
    model, _ = get_model(cfg, dataset=ds)
    tr = Trainer.from_config(model, cfg)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    assert any(k.startswith("inputs.ind.") for k in batch)
    state = tr.init_state(batch)
    state, sc = tr.train_step(state, batch)
    assert np.isfinite(sc["loss"])


def test_async_checkpoint(synth, tmp_path):
    from vtaco_tpu.core.checkpoint import CheckpointIO

    root, mesh_root = synth
    cfg = _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root)
    model, _ = get_model(cfg)
    tr = Trainer.from_config(model, cfg)
    ds = get_dataset("train", cfg)
    batch = next(iter(BatchLoader(ds, batch_size=2, num_workers=1, seed=0)))
    state = tr.init_state(batch)
    ckpt = CheckpointIO(str(tmp_path), state=state)
    fut = ckpt.save_async("model.ckpt", it=3)
    fut.result(timeout=60)
    ckpt.wait()
    restored, scalars = ckpt.load("model.ckpt", state=state)
    assert scalars["it"] == 3


def test_exit_after_preemption(synth, tmp_path):
    """--exit-after contract: checkpoint written, SystemExit code 3."""
    from vtaco_tpu.train.loop import train

    root, mesh_root = synth
    cfg = _small_cfg("configs/tactile/tactile_test.yaml", root, mesh_root)
    cfg["training"]["out_dir"] = str(tmp_path)
    cfg["training"]["batch_size"] = 2
    cfg["training"]["validate_every"] = 0
    cfg["training"]["visualize_every"] = 0
    with pytest.raises(SystemExit) as e:
        train(cfg, exit_after=1)
    assert e.value.code == 3
    assert os.path.exists(os.path.join(str(tmp_path), "model.ckpt"))

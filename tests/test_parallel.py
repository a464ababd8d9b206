"""Multi-device decoding/training over the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vtaco_tpu.models.conv_onet import ConvOccupancyNetwork
from vtaco_tpu.models.decoder import LocalDecoder
from vtaco_tpu.parallel.mesh import make_mesh


def _setup(rng, C=8, R=6):
    dec = LocalDecoder(c_dim=C, hidden_size=16, n_blocks=2)
    model = ConvOccupancyNetwork(decoder=dec)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 4, 3)), jnp.float32)
    cp = {"grid": jnp.asarray(rng.standard_normal((1, R, R, R, C)), jnp.float32)}

    def initp(m):
        m.decode(p, cp)

    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), method=initp))()

    class S:
        params = v["params"]
        batch_stats = {}

    return model, cp, S()


def test_mesh_construction():
    mesh = make_mesh(data=8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_query_axis_sharded_decode(rng):
    from vtaco_tpu.generate.generator import Generator3D

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    mesh = make_mesh(data=8)
    nx = 16
    sharded = gen.eval_points_dense_sharded(state, nx, cp, mesh)
    single = gen.eval_points_dense(state, nx, cp, fast=True)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_batched_dp_decode(rng):
    from vtaco_tpu.generate.generator import Generator3D

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    mesh = make_mesh(data=8)
    B, R, C = 8, 6, 8
    cB = {"grid": jnp.asarray(rng.standard_normal((B, R, R, R, C)), jnp.float32)}
    out = gen.decode_dense_batched(state, 16, cB, device_mesh=mesh)
    assert out.shape == (8, 16**3)
    one = gen.eval_points_dense(state, 16, {"grid": cB["grid"][3:4]}, fast=True)
    np.testing.assert_allclose(out[3], one, atol=1e-5)


def test_2d_mesh_dp_decode(rng):
    """A (data=4, model=2) 2D mesh composes: DP query-sharded decode runs
    over the 'data' axis with the 'model' axis (reserved for tensor
    parallelism, SURVEY §2.8) replicated — same values as single-device."""
    from vtaco_tpu.generate.generator import Generator3D

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    mesh2d = make_mesh(data=4, model=2)
    nx = 16
    sharded = gen.eval_points_dense_sharded(state, nx, cp, mesh2d)
    single = gen.eval_points_dense(state, nx, cp, fast=True)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_batched_points_decode(rng):
    """decode_points_batched == the per-object chunked decode, on and off
    the device mesh (same padded-chunk math, one dispatch)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1,
                      points_batch_size=64)
    B, R, C = 4, 6, 8
    cB = {"grid": jnp.asarray(rng.standard_normal((B, R, R, R, C)),
                              jnp.float32)}
    pts = rng.uniform(-0.5, 0.5, (B, 150, 3)).astype(np.float32)
    out = gen.decode_points_batched(state, pts, cB)
    assert out.shape == (B, 150)
    for b in (0, 3):
        one = gen.eval_points(state, pts[b], {"grid": cB["grid"][b : b + 1]})
        np.testing.assert_allclose(out[b], one, atol=1e-2)

    # fast (vmapped scattered trunk) == legacy (chunked module decode)
    legacy = gen.decode_points_batched(state, pts, cB, fast=False,
                                       transfer_dtype=jnp.float32)
    fast = gen.decode_points_batched(state, pts, cB,
                                     transfer_dtype=jnp.float32)
    np.testing.assert_allclose(fast, legacy, atol=1e-5)

    mesh = make_mesh(data=4)
    out_dp = gen.decode_points_batched(state, pts, cB, device_mesh=mesh)
    np.testing.assert_allclose(out_dp, out, atol=1e-2)


def test_batched_mise_matches_single(rng):
    """Batched DP MISE refinement (coarse batched dense + lockstep padded
    refinement) equals per-object multires_decode."""
    from vtaco_tpu.generate.generator import Generator3D
    from vtaco_tpu.generate.mise import multires_decode, multires_decode_batched

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1,
                      points_batch_size=64)
    B, R, C = 4, 6, 8
    cB = {"grid": jnp.asarray(rng.standard_normal((B, R, R, R, C)),
                              jnp.float32)}
    mesh = make_mesh(data=4)
    level = 0.0
    grids, levels = multires_decode_batched(gen, state, cB, 8, 1, level,
                                            device_mesh=mesh)
    assert len(grids) == B and grids[0].shape == (17, 17, 17)
    assert levels == [0.0] * B
    for b in (0, 2):
        single, _ = multires_decode(
            gen, state, {"grid": cB["grid"][b : b + 1]}, 8, 1, level,
            chunk=64,
        )
        # bf16 transfer on the batched path vs f32 single path → loose atol
        np.testing.assert_allclose(grids[b], single, atol=2e-2)

    # thresholds=None → per-object coarse-field means (for uncalibrated
    # weights the fixed level can miss the field's range entirely)
    grids2, levels2 = multires_decode_batched(gen, state, cB, 8, 1, None,
                                              device_mesh=mesh)
    assert len(levels2) == B and len(set(levels2)) > 1
    for g, lv in zip(grids2, levels2):
        assert g.min() <= lv <= g.max()

    # threaded host bookkeeping (multi-core serving hosts) is bit-exact
    # vs this 1-core box's serial path — per-object engine handles are
    # independent; only the page pool is shared (mutex-protected)
    from vtaco_tpu.generate import mise as mise_mod

    old = mise_mod.HOST_THREADS
    mise_mod.HOST_THREADS = 4
    try:
        grids3, levels3 = multires_decode_batched(gen, state, cB, 8, 1,
                                                  level, device_mesh=mesh)
    finally:
        mise_mod.HOST_THREADS = old
    assert levels3 == levels
    for g3, g in zip(grids3, grids):
        np.testing.assert_array_equal(g3, g)


def _tiny_train_cfg(root, mesh_root):
    import os

    from vtaco_tpu.core.config import load_config

    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    cfg["data"].update(
        path=root, points_subsample=128, pointcloud_n=64, num_sample=128,
        mesh_dir=os.path.join(mesh_root, "mesh_obj"),
        depth_origin=os.path.join(mesh_root, "depth_origin.txt"),
    )
    m = cfg["model"]
    m["encoder_kwargs"].update(hidden_dim=8, grid_resolution=8)
    m["encoder_kwargs"]["unet3d_kwargs"].update(num_levels=2, f_maps=8,
                                                out_channels=32)
    m["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8)
    m["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
    tk = m["encoder_t2d_kwargs"]
    tk["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8)
    tk["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
    tk["encoder_img_kwargs"].update(depth=2, start_filts=8)
    m["decoder_kwargs"].update(hidden_size=16)
    return cfg


def test_dp_training_with_eval(rng):
    """DP train + B=1 eval through the same trainer (eval batches don't
    divide the mesh and must replicate instead of crashing)."""
    from vtaco_tpu.core.config import get_dataset, get_model
    from vtaco_tpu.data import BatchLoader
    from vtaco_tpu.data.synthetic import generate
    from vtaco_tpu.train.loop import build_mesh_bank
    from vtaco_tpu.train.trainer import Trainer

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        root, mesh_root = generate(tmp, n_models=4, n_query=300,
                                   n_surface=400, img_h=16, img_w=12, seed=2)
        cfg = _tiny_train_cfg(root, mesh_root)

        mesh = make_mesh(data=2)
        model, _ = get_model(cfg)
        ds = get_dataset("train", cfg)
        bank = build_mesh_bank(cfg)
        tr = Trainer.from_config(model, cfg, mesh_bank=bank, device_mesh=mesh,
                                 contact_per_finger=16)
        batch = next(iter(BatchLoader(ds, 2, num_workers=1, seed=0)))
        state = tr.init_state(batch)
        state, sc = tr.train_step(state, batch)
        assert np.isfinite(sc["loss"])
        val = get_dataset("val", cfg, return_idx=True)
        vb = next(iter(BatchLoader(val, 1, shuffle=False, num_workers=1)))
        ev = tr.eval_step(state, vb)  # B=1 → replicated, must not crash
        assert "iou" in ev

        # fused multi-step dispatch under the same DP mesh: the scanned
        # program shards each on-device batch over the 'data' axis
        from vtaco_tpu.data.device_data import DeviceDataset
        from vtaco_tpu.parallel.mesh import replicate

        dds = DeviceDataset(ds, pointcloud_noise=cfg["data"]["pointcloud_noise"])
        fused = tr.make_fused_train_fn(dds, n_points=128, n_cloud=64)
        state = replicate(mesh, state)
        ids = np.array([[0, 1], [1, 0]], np.int32)
        state, scal = fused(state, jax.random.PRNGKey(3), jnp.asarray(ids))
        assert all(np.isfinite(np.asarray(v)).all() for v in scal.values())
        assert int(state.step) == 3  # 1 earlier train_step + 2 fused


def test_tp_training_matches_dp(rng):
    """Tensor parallelism over the 'model' axis (parallel/tp.py): a
    (data=2, model=2) mesh with conv-channel-sharded params runs the same
    train step as the DP-only (data=2) mesh — same loss, same updated
    params — with the wide kernels genuinely partitioned."""
    from jax.sharding import PartitionSpec as P

    from vtaco_tpu.core.config import get_dataset, get_model
    from vtaco_tpu.data import BatchLoader
    from vtaco_tpu.data.synthetic import generate
    from vtaco_tpu.parallel.tp import shard_state, tp_spec
    from vtaco_tpu.train.loop import build_mesh_bank
    from vtaco_tpu.train.trainer import Trainer

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        root, mesh_root = generate(tmp, n_models=4, n_query=300,
                                   n_surface=400, img_h=16, img_w=12, seed=2)
        cfg = _tiny_train_cfg(root, mesh_root)
        model, _ = get_model(cfg)
        ds = get_dataset("train", cfg)
        bank = build_mesh_bank(cfg)
        batch = next(iter(BatchLoader(ds, 2, num_workers=1, seed=0)))

        mesh_dp = make_mesh(data=2)
        tr_dp = Trainer.from_config(model, cfg, mesh_bank=bank,
                                    device_mesh=mesh_dp, contact_per_finger=16)
        state0 = tr_dp.init_state(batch)
        state_dp, sc_dp = tr_dp.train_step(state0, batch)

        mesh_tp = make_mesh(data=2, model=2)
        tr_tp = Trainer.from_config(model, cfg, mesh_bank=bank,
                                    device_mesh=mesh_tp, contact_per_finger=16)
        state_tp0 = shard_state(mesh_tp, state0, min_shard=4)
        # the rule actually partitions: every rank≥2 kernel whose last axis
        # divides evenly at ≥4/chip carries a 'model' spec
        sharded = [
            x for x in jax.tree.leaves(state_tp0.params)
            if x.ndim >= 2 and x.sharding.spec == P(*([None] * (x.ndim - 1)
                                                      + ["model"]))
        ]
        assert len(sharded) >= 5, "TP sharding rule partitioned nothing"
        state_tp, sc_tp = tr_tp.train_step(state_tp0, batch)

        np.testing.assert_allclose(sc_tp["loss"], sc_dp["loss"], rtol=2e-5)
        for a, b in zip(jax.tree.leaves(state_tp.params),
                        jax.tree.leaves(state_dp.params)):
            # sharded collectives reorder the reductions; Adam's
            # grad/sqrt(nu) normalization amplifies that float noise near
            # zero-gradient entries — tolerance covers reordering only
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=5e-3)

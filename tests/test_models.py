"""Model module tests (tiny shapes — XLA-CPU compiles are the bottleneck)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNG = jax.random.PRNGKey(0)


def test_resnet_block_fc_identity_at_init(rng):
    """fc_1 is zero-initialized, so at init the block is the (shortcut of
    the) input — mirrors the reference's init (src/layers.py:39)."""
    from vtaco_tpu.models.layers import ResnetBlockFC

    blk = ResnetBlockFC(8, 8)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    v = blk.init(RNG, x)
    y = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_tactile_unet_bounds_and_shape(rng):
    from vtaco_tpu.models.layers import TactileUNet

    net = TactileUNet(num_classes=1, depth=3, start_filts=8)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 3)), jnp.float32)
    v = net.init(RNG, x, train=False)
    y = net.apply(v, x, train=False)
    assert y.shape == (2, 32, 24, 1)
    yn = np.asarray(y)
    assert (yn >= 0).all() and (yn <= 1).all()  # sigmoid output
    # shared-BN quirk: exactly one BatchNorm per down/up block
    flat = jax.tree_util.tree_leaves_with_path(v["batch_stats"])
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    bn_blocks = {n.split("/")[0].strip("[']") for n in names}
    down_up = [k for k in v["params"] if k.startswith(("down", "up"))]
    assert len(down_up) == 3 + 2


def test_resnet18_head(rng):
    from vtaco_tpu.models.layers import Resnet18

    net = Resnet18(num_classes=32)
    x = jnp.asarray(rng.standard_normal((2, 64, 48, 3)), jnp.float32)
    v = net.init(RNG, x, train=False)
    y = net.apply(v, x, train=False)
    assert y.shape == (2, 32)
    # the two-stage head exists: 512 -> 100 -> num_classes
    assert v["params"]["linear"]["kernel"].shape == (512, 100)
    assert v["params"]["fc"]["kernel"].shape == (100, 32)


def test_unet3d_shapes(rng):
    from vtaco_tpu.models.unet3d import UNet3D

    net = UNet3D(out_channels=8, f_maps=8, num_levels=2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 8)), jnp.float32)
    v = net.init(RNG, x, train=False)
    y = net.apply(v, x, train=False)
    assert y.shape == (1, 8, 8, 8, 8)


def test_unet3d_remat_parity(rng):
    """Per-block remat (the B=12 train-memory mode) must keep the exact
    parameter tree and outputs of the plain UNet — checkpoints interchange."""
    import jax

    from vtaco_tpu.models.unet3d import UNet3D

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 8)), jnp.float32)
    net = UNet3D(out_channels=8, f_maps=8, num_levels=2)
    net_r = UNet3D(out_channels=8, f_maps=8, num_levels=2, remat=True)
    v = net.init(RNG, x, train=False)
    v_r = net_r.init(RNG, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_r)
    # remat shifts XLA fusion boundaries → last-ulp drift, not bit equality
    np.testing.assert_allclose(
        net.apply(v, x, train=True), net_r.apply(v, x, train=True),
        rtol=1e-5, atol=2e-6,
    )
    g = jax.grad(lambda p: net.apply(p, x, train=True).sum())(v)
    g_r = jax.grad(lambda p: net_r.apply(p, x, train=True).sum())(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        g, g_r,
    )

    # 'finest' (remat only the full-resolution blocks — the targeted B=12
    # memory mode): same tree, same outputs/grads
    net_f = UNet3D(out_channels=8, f_maps=8, num_levels=2, remat="finest")
    v_f = net_f.init(RNG, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_f)
    np.testing.assert_allclose(
        net.apply(v, x, train=True), net_f.apply(v, x, train=True),
        rtol=1e-5, atol=2e-6,
    )
    g_f = jax.grad(lambda p: net_f.apply(p, x, train=True).sum())(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        g, g_f,
    )
    import pytest

    with pytest.raises(ValueError):
        UNet3D(out_channels=8, f_maps=8, num_levels=2,
               remat="typo").init(RNG, x, train=False)


def test_small_channel_conv3_matches_conv3d(rng):
    """SmallChannelConv3 (three depth-shifted 2D convs) must equal the
    plain 3D conv with the same kernel, bias on and off."""
    import jax.lax as lax

    from vtaco_tpu.models.unet3d import SmallChannelConv3

    x = jnp.asarray(rng.standard_normal((2, 6, 8, 8, 4)), jnp.float32)
    for use_bias in (True, False):
        mod = SmallChannelConv3(5, use_bias=use_bias)
        v = mod.init(RNG, x)
        got = mod.apply(v, x)
        ref = lax.conv_general_dilated(
            x, v["params"]["kernel"], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if use_bias:
            ref = ref + v["params"]["bias"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_pointnet_plane_cell_content(rng):
    """Scattered plane features land in the right cells: a point's encoder
    feature must equal the plane cell at its (x, z) index when it is the
    only point in that cell."""
    from vtaco_tpu.models.pointnet import LocalPoolPointnet
    from vtaco_tpu.ops.geometry import coordinate2index, normalize_coordinate

    enc = LocalPoolPointnet(
        c_dim=4, hidden_dim=4, plane_type="xz", plane_resolution=4, n_blocks=2
    )
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 10, 3)), jnp.float32)
    v = enc.init(RNG, pts, train=False)
    fea = enc.apply(v, pts, train=False)
    assert set(fea.keys()) == {"xz"}
    assert fea["xz"].shape == (1, 4, 4, 4)
    # occupied cells are exactly the scattered indices
    idx = np.asarray(coordinate2index(normalize_coordinate(pts, plane="xz"), 4))[0]
    occupied = np.unique(idx)
    grid = np.asarray(fea["xz"]).reshape(16, 4)
    nz = np.where(np.abs(grid).sum(-1) > 0)[0]
    assert set(nz) <= set(occupied.tolist())


def test_local_decoder_paths(rng):
    from vtaco_tpu.models.decoder import LocalDecoder

    dec = LocalDecoder(c_dim=4, hidden_size=8, n_blocks=2, with_contact=True)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 7, 3)), jnp.float32)
    c_plane = {
        "grid": jnp.asarray(rng.standard_normal((2, 4, 4, 4, 4)), jnp.float32),
        "xz": jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32),
    }
    c_img = jnp.asarray(rng.standard_normal((2, 7, 4)), jnp.float32)

    def all_paths(dec):
        # touch every head so the param tree is complete (flax params are
        # created on first use, unlike torch's eager construction)
        dec(p, c_plane)
        dec.forward_img(p, c_plane, c_img)
        dec.forward_contact(p, c_plane)

    v = dec.init(RNG, method=all_paths)
    out = dec.apply(v, p, c_plane)
    assert out.shape == (2, 7)
    out_img = dec.apply(v, p, c_plane, c_img, method="forward_img")
    assert out_img.shape == (2, 7)
    occ, contact = dec.apply(v, p, c_plane, method="forward_contact")
    assert occ.shape == contact.shape == (2, 7)
    # img path must differ from plain path (different input projection)
    assert np.abs(np.asarray(out_img) - np.asarray(out)).max() > 1e-7


def test_fusion_shapes_and_tying(rng):
    from vtaco_tpu.models.fusion import TransformerFusion

    fuser = TransformerFusion(
        d_model=8, num_layers=2, key_feature_dim=8, with_pos_embed=False
    )
    a = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    v = fuser.init(RNG, a, None, b, None)
    out = fuser.apply(v, a, None, b, None)
    assert out.shape == (2, 16, 8)
    # weight tying: exactly one self_attn + one cross_attn parameter group
    # regardless of num_layers (reference _get_clones shares the instance)
    assert set(v["params"].keys()) == {"self_attn", "cross_attn"}


def test_pointnetpp(rng):
    from vtaco_tpu.models.pointnetpp import PointNetPlusPlus

    net = PointNetPlusPlus(c_dim=8)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 600, 3)), jnp.float32)
    v = net.init(RNG, pts, train=False)
    xyz, feats = net.apply(v, pts, train=False)
    assert xyz.shape == (1, 600, 3)
    assert feats.shape == (1, 600, 8)


def test_voxel_encoders(rng):
    from vtaco_tpu.models.voxels import LocalVoxelEncoder, VoxelEncoder

    vox = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 8)) > 0.5, jnp.float32)
    enc = LocalVoxelEncoder(c_dim=4, plane_type=["xz", "xy"], plane_resolution=4)
    v = enc.init(RNG, vox, train=False)
    fea = enc.apply(v, vox, train=False)
    assert fea["xz"].shape == (1, 4, 4, 4) and fea["xy"].shape == (1, 4, 4, 4)

    genc = VoxelEncoder(c_dim=6)
    x32 = jnp.zeros((1, 32, 32, 32))
    v2 = genc.init(RNG, x32, train=False)
    out = genc.apply(v2, x32, train=False)
    assert out.shape == (1, 6)


def test_factory_builds_tiny_composite(rng):
    """Config → model factory → full forward through every encode path."""
    from vtaco_tpu.core.config import get_model, load_config

    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    m = cfg["model"]
    m["encoder_kwargs"].update(hidden_dim=4, grid_resolution=8)
    m["encoder_kwargs"]["unet3d_kwargs"].update(num_levels=2, f_maps=8, out_channels=32)
    m["encoder_hand_kwargs"].update(hidden_dim=4, plane_resolution=8)
    m["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=4)
    m["encoder_t2d_kwargs"]["encoder_hand_kwargs"].update(hidden_dim=4, plane_resolution=8)
    m["encoder_t2d_kwargs"]["encoder_hand_kwargs"]["unet_kwargs"].update(
        depth=2, start_filts=4
    )
    m["encoder_t2d_kwargs"]["encoder_img_kwargs"].update(depth=2, start_filts=4)
    m["decoder_kwargs"].update(hidden_size=8)

    model, aux = get_model(cfg)
    assert aux["t2d_pretrained_file"]

    B, N = 1, 16
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 50, 3)), jnp.float32)
    imgs = jnp.asarray(rng.uniform(0, 1 / 255, (B, 5, 32, 24, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 3)), jnp.float32)

    @jax.jit
    def init_and_run(pts, imgs, p):
        def fn(model):
            c = model.encode_inputs(pts, train=False)
            ch = model.encode_hand_inputs(pts, train=False)
            ci = model.encode_img_inputs(imgs, train=False)
            pd, chd = model.encode_t2d(pts, imgs, train=False)
            logits = model.decode_img(p, c, jnp.zeros((B, N, ci.shape[-1])))
            return logits, ch, ci, pd, chd

        v = model.init(RNG, method=fn)
        return model.apply(v, method=fn)

    logits, ch, ci, pd, chd = init_and_run(pts, imgs, p)
    assert logits.shape == (B, N)
    assert ch["mano_param"].shape == (B, 51)
    assert ch["mano_verts"].shape == (B, 778, 3)
    assert ch["mano_joints"].shape == (B, 21, 3)
    assert ci.shape == (B, 5, 32)
    assert pd.shape == (B, 5, 32 * 24)  # t2d depth maps flattened per finger
    assert chd["mano_param"].shape == (B, 30)  # 5 sensors x (pos3 + rot3)
    pdn = np.asarray(pd)
    assert (pdn >= 0).all() and (pdn <= 1).all()


def test_attention_decoder(rng):
    from vtaco_tpu.models.decoder import AttentionDecoder

    dec = AttentionDecoder(c_dim=8, hidden_size=8, n_blocks=2, input_size=16)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 16, 3)), jnp.float32)
    c_plane = {"xz": jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)}
    c_img = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)

    def all_paths(d):
        d(p, c_plane)
        d.forward_img(p, c_plane, c_img)

    v = dec.init(RNG, method=all_paths)
    out = dec.apply(v, p, c_plane, c_img, method="forward_img")
    assert out.shape == (2, 16)
    # fusion transformer is engaged: img path differs from plain path
    plain = dec.apply(v, p, c_plane)
    assert np.abs(np.asarray(out) - np.asarray(plain)).max() > 1e-6
    # weight-tied fusion: one self_attn + one cross_attn group
    assert set(v["params"]["fuser"].keys()) == {"self_attn", "cross_attn"}

    # AttentionDecoder shares the trunk PARAMETER NAMES with LocalDecoder
    # but not its semantics (the fuser runs first) — every fast/band/
    # batched path must refuse or fall back rather than silently dropping
    # the fusion (generator._fast_capable)
    import pytest

    from vtaco_tpu.generate.generator import Generator3D
    from vtaco_tpu.models.conv_onet import ConvOccupancyNetwork

    model = ConvOccupancyNetwork(decoder=dec)
    gen = Generator3D(model, resolution0=2, padding=0.1,
                      band_transfer=True)
    assert not gen._fast_capable()
    assert not gen._band_enabled()  # even with band_transfer=True

    def init_all(m):
        m.decode(p, c_plane)
        m.decode_img(p, c_plane, c_img)

    vm = model.init(RNG, method=init_all)

    class S:
        params = vm["params"]
        batch_stats = {}

    # dense decode routes through the chunked module path (the decoder's
    # own forward, fusion intact) and matches a direct module decode
    vals = gen.eval_points_dense(S(), 8, c_plane,
                                 transfer_dtype=jnp.float32)
    from vtaco_tpu.ops.geometry import make_3d_grid

    pf = 1.1 * np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, (8,) * 3),
                          np.float32)
    direct = model.apply(vm, jnp.asarray(pf[None]), c_plane,
                         method=model.decode)[0]
    np.testing.assert_allclose(vals, np.asarray(direct), atol=2e-5)
    with pytest.raises(NotImplementedError):
        gen.eval_points_fast(S(), np.zeros((32, 3), np.float32), c_plane)
    with pytest.raises(NotImplementedError):
        gen.decode_dense_batched(S(), 8, c_plane)
    with pytest.raises(NotImplementedError):
        gen.decode_points_batched(S(), np.zeros((2, 8, 3), np.float32),
                                  c_plane)
    with pytest.raises(NotImplementedError):
        gen.decode_dense_batched_band(S(), 8, c_plane)
    with pytest.raises(NotImplementedError):
        gen.eval_points_dense_band(S(), 8, c_plane)


def test_index_encoder(rng):
    from vtaco_tpu.models.pointnet import IndexEncoder

    enc = IndexEncoder(num_embeddings=10, c_dim=6)
    idx = jnp.asarray([1, 7])
    v = enc.init(RNG, idx)
    out = enc.apply(v, idx)
    assert out.shape == (2, 6)

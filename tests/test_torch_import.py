"""Torch checkpoint import: layer numerics + full-tree roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import linen as nn

from vtaco_tpu.core import torch_import as TI


def test_conv2d_import_numerics(rng):
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    fconv = nn.Conv(5, (3, 3), padding=1)
    sd = {k: v.detach().numpy() for k, v in tconv.state_dict().items()}
    params = {
        "kernel": TI._to_flax_leaf("conv.weight", sd["weight"], "kernel", (3, 3, 3, 5)),
        "bias": sd["bias"],
    }
    got = fconv.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_convtranspose_import_numerics(rng):
    tconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    x = rng.standard_normal((1, 5, 7, 4)).astype(np.float32)
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    fconv = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
    sd = {k: v.detach().numpy() for k, v in tconv.state_dict().items()}
    params = {
        "kernel": TI._to_flax_leaf(
            "up_convs.0.upconv.weight", sd["weight"], "kernel", (2, 2, 4, 6)
        ),
        "bias": sd["bias"],
    }
    got = fconv.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5
    )


def test_batchnorm_import_numerics(rng):
    tbn = torch.nn.BatchNorm2d(4)
    tbn.weight.data.normal_()
    tbn.bias.data.normal_()
    tbn.running_mean.normal_()
    tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    want = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    fbn = nn.BatchNorm(use_running_average=True)
    sd = {k: v.detach().numpy() for k, v in tbn.state_dict().items()}
    got = fbn.apply(
        {
            "params": {"scale": sd["weight"], "bias": sd["bias"]},
            "batch_stats": {"mean": sd["running_mean"], "var": sd["running_var"]},
        },
        x,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5
    )


def test_path_translation():
    cases = [
        (("decoder", "fc_c3", "kernel"), "decoder.fc_c.3"),
        (("encoder", "block2", "fc_0"), "encoder.blocks.2.fc_0"),
        (("encoder_hand", "unet_mod", "down1", "conv2"),
         "encoder_hand.unet.down_convs.1.conv2"),
        (("encoder", "unet3d_mod", "enc2", "SingleConv1", "conv1"),
         "encoder.unet3d.encoders.2.basic_module.SingleConv1.conv"),
        (("encoder", "unet3d_mod", "dec0", "SingleConv2", "groupnorm0"),
         "encoder.unet3d.decoders.0.basic_module.SingleConv2.groupnorm"),
        (("encoder_img", "layer3_1", "conv2"), "encoder_img.layer3.1.conv2"),
        (("encoder_img", "layer2_0", "down_bn"),
         "encoder_img.layer2.0.downsample.1"),
        (("encoder_t2d", "encoder_img", "up0", "upconv"),
         "encoder_t2d.encoder_img.up_convs.0.upconv"),
    ]
    for path, want in cases:
        assert TI._translate_path(path[:-1]) + "." in want + "." or \
            TI._translate_path(path[:-1]) == want, (
                TI._translate_path(path[:-1]), want)


def test_full_model_roundtrip(rng):
    """export → import over the full VTacO tree must be the identity and
    must consume every exported tensor."""
    from vtaco_tpu.core.config import get_model, load_config

    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    m = cfg["model"]
    m["encoder_kwargs"].update(hidden_dim=8, grid_resolution=8)
    m["encoder_kwargs"]["unet3d_kwargs"].update(num_levels=2, f_maps=8, out_channels=32)
    m["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8)
    m["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
    tk = m["encoder_t2d_kwargs"]
    tk["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8)
    tk["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
    tk["encoder_img_kwargs"].update(depth=2, start_filts=8)
    m["decoder_kwargs"].update(hidden_size=16)
    model, _ = get_model(cfg)

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (1, 40, 3), minval=-0.4, maxval=0.4)
    imgs = jax.random.uniform(key, (1, 5, 16, 12, 3))
    p = jax.random.uniform(key, (1, 8, 3))

    def init_fn(mm):
        c = mm.encode_inputs(pts, train=False)
        mm.encode_hand_inputs(pts, train=False)
        ci = mm.encode_img_inputs(imgs, train=False)
        mm.encode_t2d(pts, imgs, train=False)
        mm.decode(p, c)
        mm.decode_img(p, c, jnp.zeros((1, 8, ci.shape[-1])))

    variables = jax.jit(lambda: model.init(key, method=init_fn))()
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    sd = TI.export_state_dict(params, stats)
    # perturb so a silent no-op import can't pass
    sd = {k: v + 1.0 for k, v in sd.items()}
    new_params, new_stats, report = TI.import_state_dict(sd, params, stats)
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]

    for path, leaf in TI._flatten(params).items():
        np.testing.assert_allclose(
            TI._flatten(new_params)[path], np.asarray(leaf) + 1.0, atol=1e-5,
            err_msg=str(path),
        )


def test_fusion_import_numerics(rng):
    """TransformerFusion (fuser) import: identical weights → matching
    outputs in eval mode, with the reference's weight-tied clones and the
    dead after_norm accounted for in the report."""
    import sys

    sys.path.insert(0, "tests")
    import reference_shim  # noqa: F401  (installs torch dependency shims)

    sys.path.insert(0, "/root/reference")
    from src.TransformerFusion import TransformerFusion as TorchFusion

    from vtaco_tpu.models.fusion import TransformerFusion

    tf = TorchFusion(d_model=8, num_layers=2, key_feature_dim=4,
                     with_pos_embed=True)
    tf.eval()

    fuser = TransformerFusion(d_model=8, num_layers=2, key_feature_dim=4,
                              with_pos_embed=True)
    feat = rng.standard_normal((2, 16, 8)).astype(np.float32)
    feat2 = rng.standard_normal((2, 16, 8)).astype(np.float32)
    coord = rng.standard_normal((2, 16, 3)).astype(np.float32)
    v = fuser.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                   jnp.asarray(coord), jnp.asarray(feat2), jnp.asarray(coord))

    sd = {k: t.detach().numpy() for k, t in tf.state_dict().items()}
    params, stats, report = TI.import_state_dict(
        sd, jax.tree.map(np.asarray, v["params"]),
        jax.tree.map(np.asarray, v.get("batch_stats", {})),
    )
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]

    got = fuser.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(feat), jnp.asarray(coord),
                      jnp.asarray(feat2), jnp.asarray(coord))
    with torch.no_grad():
        want = tf(torch.from_numpy(feat), torch.from_numpy(coord),
                  torch.from_numpy(feat2), torch.from_numpy(coord))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_index_encoder_import(rng):
    """IndexEncoder (encoder: 'idx') ↔ the reference's bare nn.Embedding."""
    from vtaco_tpu.models.pointnet import IndexEncoder

    emb = torch.nn.Embedding(7, 6)
    enc = IndexEncoder(num_embeddings=7, c_dim=6)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    sd = {f"encoder.{k}": t.detach().numpy() for k, t in emb.state_dict().items()}
    params, _, report = TI.import_state_dict(
        sd, {"encoder": jax.tree.map(np.asarray, v["params"])}, {},
    )
    assert not report["missing"] and not report["unused"], report
    idx = np.array([0, 3, 6])
    got = enc.apply({"params": params["encoder"]}, jnp.asarray(idx))
    want = emb(torch.from_numpy(idx)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

"""Torch-free full-model parity against committed reference activations.

tests/test_full_parity.py proves parity by running the PyTorch reference
in-process; this module proves the same surfaces against *golden fixtures*
(tests/golden/vtaco_golden.npz): reference outputs captured once from
/root/reference (src/conv_onet/models/__init__.py:24-197 built via
src/conv_onet/config.py:16-143) together with the imported parameter tree
and the exact inputs. The fixture model is the VTacO_YCB flagship with
every module family intact but widths shrunk to commit-friendly size
(c_dim 8, 2-level UNet3D, 16³ grid; the ResNet-18 tactile feature encoder
is the one omission — its 11M fixed-width parameters don't fit a committed
fixture and stay covered by the torch-backed tests).

Regenerate with: python tests/golden/make_golden.py  (requires torch).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flax import traverse_util

from vtaco_tpu.core.config import get_model, load_config

def _golden_path(width):
    name = ("vtaco_golden.npz" if width == 8
            else f"vtaco_golden_w{width}.npz")
    return os.path.join(os.path.dirname(__file__), "golden", name)


GOLDEN_WIDTHS = (8, 16)  # two pinned configurations (VERDICT r2 item 7)
GOLDEN = _golden_path(8)  # legacy alias (make_golden.py prints it)

H, W = 32, 24  # tactile image size (divides the t2d U-Net's 2 poolings)


def golden_cfg(width=8):
    """The flagship config at committable widths — shared with
    tests/golden/make_golden.py so fixture and test build the same model.
    ``width`` scales every module family's channel counts (8 = the
    original tiny fixture; 16 doubles them) so the goldens pin more than
    one configuration of the channel-dependent kernels."""
    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    m = cfg["model"]
    m["c_dim"] = width
    ek = m["encoder_kwargs"]
    ek["hidden_dim"] = width
    ek["grid_resolution"] = 16
    ek["unet3d_kwargs"] = {
        "num_levels": 2, "f_maps": width, "in_channels": width,
        "out_channels": width,
    }
    hk = m["encoder_hand_kwargs"]
    hk["hidden_dim"] = width
    hk["plane_resolution"] = 16
    hk["unet_kwargs"] = {"depth": 2, "merge_mode": "concat",
                         "start_filts": width}
    m["encoder_img"] = False  # ResNet-18 is fixed-width (11M params)
    tk = m["encoder_t2d_kwargs"]
    tk["pretrained"] = False
    tk["encoder_img_kwargs"] = {"num_classes": 1, "start_filts": width,
                                "depth": 2}
    thk = tk["encoder_hand_kwargs"]
    thk["c_dim"] = 16
    thk["hidden_dim"] = width
    thk["plane_resolution"] = 16
    thk["unet_kwargs"] = {"depth": 2, "merge_mode": "concat",
                          "start_filts": width}
    m["decoder_kwargs"]["hidden_size"] = width
    return cfg


def golden_inputs(rng, width=8):
    """The fixture's inputs — derived from a seeded Generator so the
    regeneration script and this test agree bit-for-bit."""
    pts = rng.uniform(-0.4, 0.4, (1, 256, 3)).astype(np.float32)
    imgs = (rng.random((1, 5, H, W, 3)) / 255.0).astype(np.float32)
    p = rng.uniform(-0.5, 0.5, (1, 128, 3)).astype(np.float32)
    c_img = rng.standard_normal((1, 128, width)).astype(np.float32)
    return pts, imgs, p, c_img


@pytest.fixture(scope="module", params=GOLDEN_WIDTHS)
def golden(request):
    width = request.param
    path = _golden_path(width)
    assert os.path.exists(path), (
        "committed fixture missing — regenerate with "
        "python tests/golden/make_golden.py"
    )
    data = dict(np.load(path))
    params = traverse_util.unflatten_dict(
        {tuple(k[len("param/"):].split("/")): jnp.asarray(v)
         for k, v in data.items() if k.startswith("param/")}
    )
    stats = traverse_util.unflatten_dict(
        {tuple(k[len("stat/"):].split("/")): jnp.asarray(v)
         for k, v in data.items() if k.startswith("stat/")}
    )
    model, _ = get_model(golden_cfg(width))
    variables = {"params": params, "batch_stats": stats}
    return model, variables, data, width


def test_fixture_matches_model_structure(golden):
    """The committed parameter tree must exactly tile the current model's
    init structure — catches silent architecture drift."""
    model, variables, data, width = golden
    pts, imgs, p, c_img = golden_inputs(np.random.default_rng(1), width)

    def init_fn(mm):
        c = mm.encode_inputs(jnp.asarray(pts), train=False)
        mm.encode_hand_inputs(jnp.asarray(pts), train=False)
        mm.encode_t2d(jnp.asarray(pts), jnp.asarray(imgs), train=False)
        mm.decode(jnp.asarray(p), c)
        mm.decode_img(jnp.asarray(p), c, jnp.asarray(c_img))

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), method=init_fn)
    )
    want = {
        "param/" + "/".join(k): v.shape
        for k, v in traverse_util.flatten_dict(shapes["params"]).items()
    }
    want.update({
        "stat/" + "/".join(k): v.shape
        for k, v in traverse_util.flatten_dict(
            shapes.get("batch_stats", {})).items()
    })
    have = {k: v.shape for k, v in data.items()
            if k.startswith(("param/", "stat/"))}
    assert want == have, (
        sorted(set(want) ^ set(have))[:8]
        or [(k, want[k], have[k]) for k in want if want[k] != have[k]][:8]
    )


def test_encoder_grid_features(golden):
    model, variables, data, width = golden
    pts, _, _, _ = golden_inputs(np.random.default_rng(1), width)
    ours = model.apply(variables, jnp.asarray(pts), train=False,
                       method=model.encode_inputs)
    # fixture stores the ref (B, C, z, y, x) layout transposed to ours
    np.testing.assert_allclose(
        np.asarray(ours["grid"]), data["ref/grid"], atol=1e-3, rtol=1e-3
    )


def test_hand_encoder_mano(golden):
    model, variables, data, width = golden
    pts, _, _, _ = golden_inputs(np.random.default_rng(1), width)
    ours = model.apply(variables, jnp.asarray(pts), train=False,
                       method=model.encode_hand_inputs)
    for key, atol in (("mano_param", 2e-4), ("mano_verts", 2e-4),
                      ("mano_joints", 2e-4)):
        np.testing.assert_allclose(
            np.asarray(ours[key]), data["ref/" + key], atol=atol, rtol=2e-4
        )


def test_t2d_depth_and_pose(golden):
    model, variables, data, width = golden
    pts, imgs, _, _ = golden_inputs(np.random.default_rng(1), width)
    depth, hand = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(imgs), train=False,
        method=model.encode_t2d,
    )
    np.testing.assert_allclose(np.asarray(depth), data["ref/t2d_depth"],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(hand["mano_param"]),
                               data["ref/t2d_pose"], atol=2e-4, rtol=2e-4)


def test_decode_logits(golden):
    model, variables, data, width = golden
    pts, _, p, c_img = golden_inputs(np.random.default_rng(1), width)
    c = model.apply(variables, jnp.asarray(pts), train=False,
                    method=model.encode_inputs)
    ours = model.apply(variables, jnp.asarray(p), c, method=model.decode)
    np.testing.assert_allclose(np.asarray(ours), data["ref/logits"],
                               atol=2e-4, rtol=2e-4)
    ours_i = model.apply(variables, jnp.asarray(p), c, jnp.asarray(c_img),
                         method=model.decode_img)
    np.testing.assert_allclose(np.asarray(ours_i), data["ref/logits_img"],
                               atol=2e-4, rtol=2e-4)

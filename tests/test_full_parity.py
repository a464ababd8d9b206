"""Full-model numerical parity vs the PyTorch reference.

The reference ConvolutionalOccupancyNetwork (built through its own factory,
src/conv_onet/config.py:16-143) is loaded in-process as a numerical oracle
(tests/reference_shim.py); its randomly initialized state_dict is imported
into this framework's parameter tree; then, with identical weights and
inputs, every encode/decode surface and the extracted mesh must agree at
fp32 tolerance — the north-star parity clause as a passing test.

The architecture is the VTacO_YCB flagship at reduced spatial sizes
(grid 64³→32³, tactile images 320×240→32×24 — channel widths, depths and
every module family unchanged) so the CPU oracle runs in seconds.

``VTACO_FULL_PARITY=1`` runs the same assertions at the flagship's full
operating point — feature grid 64³ (configs/VTacO/VTacO_YCB.yaml:22-42)
and 320×240 tactile images (src/conv_onet/training.py:18-19) — as a
one-shot evidence run (CPU minutes; measured deltas recorded in
docs/DESIGN.md § Numerics).
"""

import copy
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vtaco_tpu.core import torch_import as TI
from vtaco_tpu.core.config import get_model, load_config

FULL = os.environ.get("VTACO_FULL_PARITY") == "1"


def _parity_cfg():
    cfg = load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    m = cfg["model"]
    if not FULL:
        m["encoder_kwargs"]["grid_resolution"] = 32
    m["encoder_t2d_kwargs"]["pretrained"] = False
    return cfg


# tactile image size (must divide the t2d U-Net's poolings); full mode
# uses the reference's 320×240 capture resolution
H, W = (320, 240) if FULL else (32, 24)


def _assert_close_bulk(a, b, mean, q999, amax):
    """fp32 parity for conv-derived tensors: XLA and torch pick different
    conv algorithms, and the worst element drifts with run order (algorithm
    selection is process-state dependent) — bound the bulk tightly and the
    tail loosely instead of one flaky atol."""
    diff = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    if FULL:  # one-shot evidence run: record the measured deltas
        print(f"[full-parity] mean={diff.mean():.3e} "
              f"q999={np.quantile(diff, 0.999):.3e} max={diff.max():.3e} "
              f"(bounds {mean:g}/{q999:g}/{amax:g})", flush=True)
    assert float(diff.mean()) < mean, diff.mean()
    assert float(np.quantile(diff, 0.999)) < q999, np.quantile(diff, 0.999)
    assert float(diff.max()) < amax, diff.max()


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """(ref torch model, our model, our variables, import report)."""
    from tests.reference_shim import build_reference_model

    cfg = _parity_cfg()
    ref = build_reference_model(copy.deepcopy(cfg))

    model, _ = get_model(cfg)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (1, 40, 3), minval=-0.4, maxval=0.4)
    imgs = jax.random.uniform(rng, (1, 5, H, W, 3), maxval=1 / 255)
    p = jax.random.uniform(rng, (1, 8, 3))

    def init_fn(mm):
        c = mm.encode_inputs(pts, train=False)
        mm.encode_hand_inputs(pts, train=False)
        ci = mm.encode_img_inputs(imgs, train=False)
        mm.encode_t2d(pts, imgs, train=False)
        mm.decode(p, c)
        mm.decode_img(p, c, jnp.zeros((1, 8, ci.shape[-1])))

    shapes = jax.eval_shape(lambda: model.init(rng, method=init_fn))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    # round-trip through the reference's on-disk checkpoint format
    # (src/checkpoints.py:28-40) so .pt files from the reference train loop
    # are proven loadable, not just in-memory state_dicts
    ckpt_path = tmp_path_factory.mktemp("ref_ckpt") / "model.pt"
    torch.save(
        {"model": ref.state_dict(), "epoch_it": 0, "it": 0,
         "loss_val_best": 0.0},
        ckpt_path,
    )
    params, stats, report = TI.load_reference_checkpoint(
        str(ckpt_path), zeros["params"], zeros.get("batch_stats", {})
    )
    variables = {"params": params, "batch_stats": stats}
    return ref, model, variables, report


def test_import_covers_full_tree(pair):
    """Every learnable tensor of the real reference model must land."""
    _, _, _, report = pair
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]


def _inputs(rng):
    pts = rng.uniform(-0.4, 0.4, (1, 256, 3)).astype(np.float32)
    imgs = (rng.random((1, 5, H, W, 3)) / 255.0).astype(np.float32)
    return pts, imgs


def _ref_apply(fn, *args):
    with torch.no_grad():
        return fn(*[torch.from_numpy(np.asarray(a)) for a in args])


def test_encoder_grid_features(pair, rng):
    ref, model, variables, _ = pair
    pts, _ = _inputs(rng)
    ours = model.apply(variables, jnp.asarray(pts), train=False,
                       method=model.encode_inputs)
    theirs = _ref_apply(ref.encode_inputs, pts)
    # ref grid layout (B, C, z, y, x) ↔ ours (B, z, y, x, C).
    # The grid passes through a 9-conv-deep UNet3D; fp32 accumulation
    # differs by ~5e-4 typical at the output (pre-UNet features agree to
    # ~1e-7) with an order-dependent tail.
    # measured full-size (grid 64³, VTACO_FULL_PARITY=1): mean 1.4e-4,
    # q999 8.2e-4, max 1.7e-3 — docs/DESIGN.md § Numerics
    _assert_close_bulk(
        np.asarray(ours["grid"]),
        theirs["grid"].numpy().transpose(0, 2, 3, 4, 1),
        mean=2e-4, q999=1.5e-3, amax=5e-3,
    )


def test_hand_encoder_mano(pair, rng):
    ref, model, variables, _ = pair
    pts, _ = _inputs(rng)
    ours = model.apply(variables, jnp.asarray(pts), train=False,
                       method=model.encode_hand_inputs)
    theirs = _ref_apply(ref.encode_hand_inputs, pts)
    np.testing.assert_allclose(
        np.asarray(ours["mano_param"]), theirs["mano_param"].numpy(),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["mano_verts"]), theirs["mano_verts"].numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["mano_joints"]), theirs["mano_joints"].numpy(),
        atol=2e-4,
    )


def test_img_encoder_features(pair, rng):
    ref, model, variables, _ = pair
    _, imgs = _inputs(rng)
    ours = model.apply(variables, jnp.asarray(imgs), train=False,
                       method=model.encode_img_inputs)
    # ref takes (B, F, C, H, W)
    theirs = _ref_apply(ref.encode_img_inputs, imgs.transpose(0, 1, 4, 2, 3))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-4, rtol=2e-4
    )


def test_t2d_depth_and_pose(pair, rng):
    ref, model, variables, _ = pair
    pts, imgs = _inputs(rng)
    our_depth, our_hand = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(imgs), train=False,
        method=model.encode_t2d,
    )
    ref_depth, ref_hand = _ref_apply(
        ref.encode_t2d, pts, imgs.transpose(0, 1, 4, 2, 3)
    )
    np.testing.assert_allclose(
        np.asarray(our_depth), ref_depth.numpy(), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(our_hand["mano_param"]), ref_hand["mano_param"].numpy(),
        atol=2e-4, rtol=2e-4,
    )


def test_decode_logits(pair, rng):
    ref, model, variables, _ = pair
    pts, imgs = _inputs(rng)
    p = rng.uniform(-0.5, 0.5, (1, 128, 3)).astype(np.float32)
    c_img_all = rng.standard_normal((1, 128, 32)).astype(np.float32)

    ours_c = model.apply(variables, jnp.asarray(pts), train=False,
                         method=model.encode_inputs)
    theirs_c = _ref_apply(ref.encode_inputs, pts)

    ours = model.apply(variables, jnp.asarray(p), ours_c, method=model.decode)
    with torch.no_grad():
        theirs = ref.decode(torch.from_numpy(p), theirs_c).logits
    # the logits inherit the encoder grid's conv-algorithm drift through
    # the trilinear sampling + 5-block trunk
    # measured full-size: mean 8.2e-5, q999/max 2.6e-4 (docs/DESIGN.md)
    _assert_close_bulk(np.asarray(ours), theirs.numpy(),
                       mean=2e-4, q999=2e-3, amax=5e-3)

    ours_i = model.apply(variables, jnp.asarray(p), ours_c,
                         jnp.asarray(c_img_all), method=model.decode_img)
    with torch.no_grad():
        theirs_i = ref.decode_img(
            torch.from_numpy(p), theirs_c, torch.from_numpy(c_img_all)
        ).logits
    _assert_close_bulk(np.asarray(ours_i), theirs_i.numpy(),
                       mean=2e-4, q999=2e-3, amax=5e-3)


def test_mesh_extraction_chamfer(pair, rng):
    """Dense-grid decode → marching cubes on both stacks; the meshes must
    coincide at fp32 tolerance (Chamfer-L1), mirroring
    generate_obj_mesh_wnf / generation.py:115-284."""
    from vtaco_tpu.generate.generator import Generator3D
    from vtaco_tpu.generate.marching_cubes import marching_cubes
    from vtaco_tpu.ops import metrics
    from vtaco_tpu.ops.geometry import make_3d_grid

    ref, model, variables, _ = pair
    pts, _ = _inputs(rng)
    nx = 64 if FULL else 32
    box = 1.1

    ours_c = model.apply(variables, jnp.asarray(pts), train=False,
                         method=model.encode_inputs)
    theirs_c = _ref_apply(ref.encode_inputs, pts)

    class _State:
        params = variables["params"]
        batch_stats = variables["batch_stats"]

    gen = Generator3D(model, resolution0=nx // 4, padding=0.1)
    our_grid = gen.eval_points_dense(
        _State(), nx, ours_c, transfer_dtype=jnp.float32
    ).reshape(nx, nx, nx)

    # the reference's eval_points hot loop (generation.py:338-383): chunked
    # decode over the same dense grid
    pointsf = box * np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, (nx,) * 3))
    vals = []
    with torch.no_grad():
        for i in range(0, len(pointsf), 8192):
            pi = torch.from_numpy(pointsf[i : i + 8192]).unsqueeze(0).float()
            vals.append(ref.decode(pi, theirs_c).logits.squeeze(0).numpy())
    ref_grid = np.concatenate(vals).reshape(nx, nx, nx)

    # Decoder logits amplify the encoder's fp32 conv-algorithm noise
    # (~5e-4 post-UNet3D); the Chamfer below is the north-star assertion.
    # measured full-size: mean 1.0e-4, q999 6.1e-4, max 1.2e-3
    _assert_close_bulk(our_grid, ref_grid, mean=5e-4, q999=5e-3, amax=1e-2)

    v_ours, f_ours = marching_cubes(our_grid, gradient="ascent")
    v_ref, f_ref = marching_cubes(ref_grid, gradient="ascent")
    assert len(v_ours) > 0 and len(v_ref) > 0
    for v in (v_ours, v_ref):
        v -= nx / 2
        v *= box / nx
    cd = float(np.asarray(metrics.chamfer_distance(
        jnp.asarray(v_ref[None]), jnp.asarray(v_ours[None])
    ))[0])
    if FULL:
        print(f"[full-parity] chamfer={cd:.3e} "
              f"verts ours={len(v_ours)} ref={len(v_ref)}", flush=True)
    assert cd < 1e-4, cd

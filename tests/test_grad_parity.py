"""Loss-value and gradient parity vs the PyTorch reference for all 5 loss
paths (src/conv_onet/training.py:454-1001).

The riskiest rewrite in this repo is the training losses: the reference
interleaves host numpy (contact selection, winding numbers, camera math)
inside each loss, which became fixed-shape on-device machinery here
(train/contact.py, ops/winding.py). Forward parity (test_full_parity)
cannot catch a sign/weighting error in a loss term — these tests compare
the actual loss scalars and parameter gradients of both stacks on
identical inputs.

RNG divergence is sidestepped per the plan in VERDICT r4: both stacks are
fed the *same pre-sampled points*. Sampling that is structurally different
by design (randomized fixed-shape slots vs dynamic np.where) is pinned by
(a) monkeypatching ``np.random.randint`` in the reference to a
deterministic arange so its selection is reproducible, and (b) injecting
the reference's exact sample into our trainer through the contact-sampler
seam. The t2d paths' sample is captured from the reference itself via the
``igl.fast_winding_number_for_meshes`` shim (which also supplies exact
winding numbers from native/geom.cpp).

Everything runs at shrunk widths (the formulas are width-independent);
B=1 so train-mode BatchNorm sees identical batch statistics (the
reference runs the image encoder per sample — a (5, …) batch — while we
flatten (B·5, …)).
"""

import copy
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vtaco_tpu.core import torch_import as TI
from vtaco_tpu.core.config import get_model, load_config
from vtaco_tpu.train import contact as C
from vtaco_tpu.train.trainer import Trainer

B = 1
N = 96            # loaded query points
NUM_SAMPLE = 64   # decode sample size
H, W = 16, 12     # tactile image size (divides the shrunk U-Net poolings)
NPTS = 60         # input cloud size


# ---------------------------------------------------------------------------
# configs / model pairs
# ---------------------------------------------------------------------------

def _shrink_model(cfg):
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
            m["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2,
                                                           start_filts=8)
    if m.get("train_tactile"):
        m["c_dim"] = 32
    if isinstance(m.get("encoder_t2d_kwargs"), dict):
        tk = m["encoder_t2d_kwargs"]
        tk["pretrained"] = False
        tk["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8,
                                         c_dim=32)
        tk["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2,
                                                        start_filts=8)
        tk["encoder_img_kwargs"].update(depth=2, start_filts=8)
    if isinstance(m.get("encoder_img_kwargs"), dict) and m.get("encoder_img") == "UNet":
        m["encoder_img_kwargs"].update(depth=2, start_filts=8)
    if isinstance(m.get("decoder_kwargs"), dict):
        m["decoder_kwargs"]["hidden_size"] = 16
    return cfg


def _vtaco_cfg():
    return _shrink_model(
        load_config("configs/VTacO/VTacO_YCB.yaml", "configs/default.yaml")
    )


def _tactile_cfg():
    return _shrink_model(
        load_config("configs/tactile/tactile_test.yaml",
                    "configs/default.yaml")
    )


def _build_pair(cfg, init_fn):
    """(ref torch model, our model, our variables) with shared weights."""
    from tests.reference_shim import build_reference_model

    ref = build_reference_model(copy.deepcopy(cfg))
    model, _ = get_model(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           method=lambda m: init_fn(m))
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    params, stats, report = TI.import_state_dict(
        ref.state_dict(), zeros["params"], zeros.get("batch_stats", {})
    )
    assert not report["missing"], report["missing"][:8]
    return ref, model, {"params": params, "batch_stats": stats}


@pytest.fixture(scope="module")
def vtaco_pair():
    imgs0 = jnp.zeros((1, 5, H, W, 3))
    pts0 = jnp.zeros((1, 16, 3))
    p0 = jnp.zeros((1, 8, 3))

    def init_fn(m):
        c = m.encode_inputs(pts0, train=False)
        m.encode_hand_inputs(pts0, train=False)
        ci = m.encode_img_inputs(imgs0, train=False)
        m.encode_t2d(pts0, imgs0, train=False)
        m.decode(p0, c)
        m.decode_img(p0, c, jnp.zeros((1, 8, ci.shape[-1])))

    return _build_pair(_vtaco_cfg(), init_fn)


@pytest.fixture(scope="module")
def tactile_pair():
    imgs0 = jnp.zeros((1, 5, H, W, 3))
    pts0 = jnp.zeros((1, 16, 3))

    def init_fn(m):
        m.encode_img_inputs(imgs0, train=False)
        m.encode_hand_inputs(pts0, train=False)

    return _build_pair(_tactile_cfg(), init_fn)


# ---------------------------------------------------------------------------
# batch construction
# ---------------------------------------------------------------------------

def _cube_mesh(half=0.25):
    """Closed triangulated cube: well-conditioned winding numbers."""
    s = half
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return v, f


def _base_batch(rng):
    b = {
        "points": rng.uniform(-0.4, 0.4, (B, N, 3)).astype(np.float32),
        "points.occ": (rng.random((B, N)) > 0.5).astype(np.float32),
        "points.mano": rng.standard_normal((B, 51)).astype(np.float32) * 0.1,
        "points.pc_hand": rng.uniform(-0.3, 0.3, (B, 778, 3)).astype(np.float32),
        "points.wrist": rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32),
        "points.cam_pos": rng.uniform(-0.2, 0.2, (B, 5, 3)).astype(np.float32),
        "points.cam_rot": rng.uniform(-0.5, 0.5, (B, 5, 3)).astype(np.float32),
        "inputs": rng.uniform(-0.4, 0.4, (B, NPTS, 3)).astype(np.float32),
        "inputs.pc_ply": rng.uniform(-0.35, 0.35, (B, 200, 3)).astype(np.float32),
        "inputs.img": (rng.random((B, 5, H, W, 3)) / 255.0).astype(np.float32),
        "inputs.depth": np.full((B, 5, H * W), 0.0215, np.float32),
        "inputs.touch_success": np.zeros((B, 5), np.float32),
    }
    return b


def _to_ref_data(b, names=None):
    """Our loader dict → the reference's torch data dict (channels-first
    images)."""
    d = {}
    for k, v in b.items():
        if k == "inputs.img":
            v = v.transpose(0, 1, 4, 2, 3)
        d[k] = torch.from_numpy(np.asarray(v))
    if names is not None:
        d["points.name"] = names
    return d


def _our_a(trainer, b):
    a = trainer.prepare_batch(b)
    return a


# ---------------------------------------------------------------------------
# grad plumbing
# ---------------------------------------------------------------------------

def _ref_backward(ref_model, loss):
    ref_model.zero_grad(set_to_none=True)
    loss.backward()
    return {
        n: (p.grad.detach().numpy() if p.grad is not None
            else np.zeros(p.shape, np.float32))
        for n, p in ref_model.named_parameters()
    }


def _map_ref_grads(ref_grads, variables):
    """Reference named-parameter grads → our parameter tree, through the
    same translation the checkpoint importer uses (transposes are linear,
    so they map gradients exactly as they map weights)."""
    zeros_p = jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                           variables["params"])
    zeros_s = jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                           variables["batch_stats"])
    tg = {n: torch.from_numpy(g) for n, g in ref_grads.items()}
    mapped, _, _ = TI.import_state_dict(tg, zeros_p, zeros_s)
    return mapped


def _our_loss_grads(trainer, variables, a):
    def f(params):
        loss, (scalars, _) = trainer._compute_loss(
            params, variables["batch_stats"], jax.random.PRNGKey(0), a,
            train=True,
        )
        return loss, scalars

    (loss, scalars), grads = jax.jit(
        jax.value_and_grad(f, has_aux=True)
    )(variables["params"])
    return float(loss), {k: float(v) for k, v in scalars.items()}, grads


def _assert_grad_cosine(our_grads, ref_mapped, min_cos=0.999,
                        skip_norm=1e-10, expect=()):
    """Per top-level module: cosine between the stacks' full gradient
    vectors. Modules a path never touches have (near-)zero grads on both
    sides and are skipped by the norm guard."""
    report = {}
    for mod in our_grads:
        ours = np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(our_grads[mod])]
        ).astype(np.float64)
        ref = np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree.leaves(ref_mapped[mod])]
        ).astype(np.float64)
        no, nr = np.linalg.norm(ours), np.linalg.norm(ref)
        if no < skip_norm and nr < skip_norm:
            report[mod] = "unused"
            continue
        cos = float(ours @ ref / max(no * nr, 1e-30))
        report[mod] = cos
        assert cos >= min_cos, (mod, cos, report)
        # magnitudes must agree too (cosine alone misses scale errors)
        assert 0.98 < no / max(nr, 1e-30) < 1.02, (mod, no, nr)
    # the modules the loss path is SUPPOSED to train must have real
    # (nonzero) gradients on both sides — a silently-dead term would
    # otherwise pass every cosine vacuously
    for mod in expect:
        assert isinstance(report.get(mod), float), (mod, report)
    return report


def _close(ours, theirs, rel=5e-4, atol=5e-5):
    assert ours == pytest.approx(theirs, rel=rel, abs=atol), (ours, theirs)


def _ref_trainer(ref_model, training_mod, num_sample=NUM_SAMPLE, **kw):
    opt = torch.optim.Adam(ref_model.parameters(), lr=1e-4)
    return training_mod.Trainer(ref_model, opt, device=torch.device("cpu"),
                                num_sample=num_sample, **kw)


def _ref_training_mod():
    import sys

    mod = sys.modules["src.conv_onet.training"]
    # golden-width globals: 16×12 tactile images, flat rest-gel reference
    mod.h, mod.w = H, W
    mod.depth_origin = np.full(H * W, 0.0215, np.float64)
    return mod


# ---------------------------------------------------------------------------
# path 1: compute_loss (training.py:454-500)
# ---------------------------------------------------------------------------

def test_grad_parity_plain(vtaco_pair, rng):
    ref, model, variables = vtaco_pair
    tmod = _ref_training_mod()
    b = _base_batch(rng)

    ref.train()
    rt = _ref_trainer(ref, tmod, with_img=False, encode_t2d=False)
    loss_t, loss_mano_t, loss_pc_t = rt.compute_loss(_to_ref_data(b))
    ref_grads = _ref_backward(ref, loss_t)

    tr = Trainer(model, with_img=False, encode_t2d=False,
                 num_sample=NUM_SAMPLE, matmul_precision="highest")
    loss, scalars, grads = _our_loss_grads(tr, variables, _our_a(tr, b))

    _close(loss, float(loss_t))
    _close(scalars["loss_mano"], float(loss_mano_t))
    _close(scalars["loss_pc"], float(loss_pc_t))
    _assert_grad_cosine(grads, _map_ref_grads(ref_grads, variables),
                        expect=("encoder", "encoder_hand", "decoder"))


# ---------------------------------------------------------------------------
# path 5: compute_loss_tactile (training.py:950-986)
# ---------------------------------------------------------------------------

def test_grad_parity_tactile(tactile_pair, rng):
    ref, model, variables = tactile_pair
    tmod = _ref_training_mod()
    b = _base_batch(rng)
    b["inputs.depth"] = rng.uniform(0.019, 0.022, (B, 5, H * W)).astype(
        np.float32
    )

    ref.train()
    rt = _ref_trainer(ref, tmod, train_tactile=True)
    loss_t, loss_depth_t, loss_digit_t = rt.compute_loss_tactile(
        _to_ref_data(b)
    )
    ref_grads = _ref_backward(ref, loss_t)

    tr = Trainer(model, train_tactile=True, num_sample=NUM_SAMPLE,
                 matmul_precision="highest")
    loss, scalars, grads = _our_loss_grads(tr, variables, _our_a(tr, b))

    _close(loss, float(loss_t))
    _close(scalars["loss_depth"], float(loss_depth_t))
    _close(scalars["loss_digit"], float(loss_digit_t))
    _assert_grad_cosine(grads, _map_ref_grads(ref_grads, variables),
                        expect=("encoder_img", "encoder_hand"))


# ---------------------------------------------------------------------------
# path 2: compute_loss_img (training.py:502-626)
# ---------------------------------------------------------------------------

def _replicate_img_sampling(ref, b):
    """The reference's fingertip-gated sample, computed with the
    reference's own arithmetic (common.py R_from_PYR / norm_pc_1, scipy
    cdist) so threshold decisions agree bit-for-bit; the random filler is
    pinned to arange (the test monkeypatches np.random.randint the same
    way before running the reference loss)."""
    import sys

    from scipy.spatial import distance

    common = sys.modules["src.common"]
    with torch.no_grad():
        c_hand = ref.encode_hand_inputs(
            torch.from_numpy(b["inputs"])
        )
    joints = c_hand["mano_joints"].numpy()
    tips_idx = [4, 8, 12, 16, 20]
    tips_pos = joints[:, tips_idx].copy()
    sel = []
    for batch in range(B):
        wrist_pos = b["points.mano"][batch, :3]
        tpb = tips_pos[batch] - np.array([0.11, 0.005, 0], np.float32)
        tpb = np.linalg.inv(
            common.R_from_PYR(np.array([-np.pi / 2, np.pi / 2, 0]))
        ) @ tpb.T
        tpb = np.linalg.inv(
            common.R_from_PYR(np.array(b["points.wrist"][batch]))
        ) @ tpb
        tpb = tpb.T + wrist_pos
        tpb = common.norm_pc_1(tpb, b["inputs.pc_ply"][batch])

        d = distance.cdist(b["points"][batch], tpb)
        idx_all, fingers = [], []
        for finger in range(5):
            if b["inputs.touch_success"][batch, finger]:
                idx = np.where(
                    (np.min(d, 1) < 0.05) & (np.argmin(d, 1) == finger)
                )[0]
                idx_all += list(idx)
                fingers += [finger] * len(idx)
        k = len(idx_all)
        sample_rest = np.arange(N)[~np.isin(np.arange(N), idx_all)]
        fill = np.arange(NUM_SAMPLE - k) % len(sample_rest)
        # quirk preserved: the reference indexes p with these RAW indices
        # (not sample_rest[fill]) — training.py:605-607
        pts = np.concatenate(
            [b["points"][batch][idx_all].reshape(-1, 3),
             b["points"][batch][fill]]
        )
        occ = np.concatenate(
            [b["points.occ"][batch][idx_all], b["points.occ"][batch][fill]]
        )
        finger_arr = np.concatenate(
            [np.asarray(fingers, np.int32),
             np.full(NUM_SAMPLE - k, -1, np.int32)]
        )
        valid = finger_arr >= 0
        sel.append((pts.astype(np.float32), occ.astype(np.float32),
                    valid, finger_arr, k))
    return sel


def _det_randint(monkeypatch):
    def fake(n, size=None):
        assert size is not None
        return np.arange(size) % int(n)

    monkeypatch.setattr(np.random, "randint", fake)


def _strip_requires_grad(monkeypatch):
    """The reference builds scratch tensors as
    ``torch.zeros(..., requires_grad=True).to(device)`` and then assigns
    into them in-place (training.py:539,582,814). On CUDA ``.to`` copies
    (non-leaf → legal); on the CPU oracle it is a no-op, so the in-place
    write errors on a leaf. The leaf's own grad is discarded either way —
    drop the flag (gradients still flow to the assigned sources)."""
    for name in ("zeros", "ones", "tensor"):
        orig = getattr(torch, name)

        def fake(*a, _orig=orig, **kw):
            kw.pop("requires_grad", None)
            return _orig(*a, **kw)

        monkeypatch.setattr(torch, name, fake)


def test_grad_parity_img(vtaco_pair, rng, monkeypatch):
    ref, model, variables = vtaco_pair
    tmod = _ref_training_mod()
    b = _base_batch(rng)
    b["inputs.touch_success"][:, [0, 3]] = 1.0

    # force fingertip proximity so the tactile-feature scatter path
    # actually executes: recompute the tips exactly as the reference does,
    # then overwrite a few query points with tips + small offsets (< the
    # 0.05 gate, away from its boundary)
    import sys

    common = sys.modules["src.common"]
    with torch.no_grad():
        joints = ref.encode_hand_inputs(
            torch.from_numpy(b["inputs"])
        )["mano_joints"].numpy()
    for batch in range(B):
        tpb = joints[batch][[4, 8, 12, 16, 20]] - np.array(
            [0.11, 0.005, 0], np.float32
        )
        tpb = np.linalg.inv(
            common.R_from_PYR(np.array([-np.pi / 2, np.pi / 2, 0]))
        ) @ tpb.T
        tpb = np.linalg.inv(
            common.R_from_PYR(np.array(b["points.wrist"][batch]))
        ) @ tpb
        tpb = tpb.T + b["points.mano"][batch, :3]
        tpb = common.norm_pc_1(tpb, b["inputs.pc_ply"][batch])
        for j, f_id in enumerate((0, 0, 3, 3, 3)):
            b["points"][batch, 10 + j] = (
                tpb[f_id] + 0.015 * (j + 1) / 5.0
            ).astype(np.float32)

    sel = _replicate_img_sampling(ref, b)
    assert any(s[4] > 0 for s in sel), "no fingertip-gated points selected"

    ref.train()
    rt = _ref_trainer(ref, tmod, with_img=True, encode_t2d=False)
    _det_randint(monkeypatch)
    _strip_requires_grad(monkeypatch)
    loss_t, loss_mano_t, loss_pc_t = rt.compute_loss_img(_to_ref_data(b))
    ref_grads = _ref_backward(ref, loss_t)

    pts = jnp.asarray(np.stack([s[0] for s in sel]))
    occ = jnp.asarray(np.stack([s[1] for s in sel]))
    valid = jnp.asarray(np.stack([s[2] for s in sel]))
    finger = jnp.asarray(np.stack([s[3] for s in sel]))
    monkeypatch.setattr(
        C, "fingertip_gated_sample",
        lambda *a, **k: (C.ContactSample(pts, valid, finger), occ),
    )

    tr = Trainer(model, with_img=True, encode_t2d=False,
                 num_sample=NUM_SAMPLE, matmul_precision="highest")
    loss, scalars, grads = _our_loss_grads(tr, variables, _our_a(tr, b))

    _close(loss, float(loss_t))
    _close(scalars["loss_mano"], float(loss_mano_t))
    _close(scalars["loss_pc"], float(loss_pc_t))
    _assert_grad_cosine(
        grads, _map_ref_grads(ref_grads, variables),
        expect=("encoder", "encoder_hand", "encoder_img", "decoder"),
    )


# ---------------------------------------------------------------------------
# paths 3/4: compute_loss_t2d / compute_loss_t2d_img (training.py:628-894)
# ---------------------------------------------------------------------------

def _capture_igl(monkeypatch):
    """The igl shim doubles as the sample-capture seam: the reference
    hands it exactly the (p_b_all, mesh) it will decode, and it returns
    exact winding numbers from native/geom.cpp."""
    import sys

    from vtaco_tpu.ops.winding import winding_number_host

    captured = []

    def fake(v, f, p):
        p = np.ascontiguousarray(p, np.float32)
        captured.append(p)
        return winding_number_host(
            np.ascontiguousarray(v, np.float32),
            np.ascontiguousarray(f, np.int32), p,
        ).astype(np.float64)

    igl_mod = sys.modules["igl"]
    monkeypatch.setattr(igl_mod, "fast_winding_number_for_meshes", fake,
                        raising=False)
    tmod = sys.modules["src.conv_onet.training"]
    monkeypatch.setattr(tmod, "igl", igl_mod)
    return captured


def _t2d_batch(rng, contact_pixels=(20,), touch_fingers=(1,)):
    b = _base_batch(rng)
    for f_id, k in zip(touch_fingers, contact_pixels):
        b["inputs.touch_success"][0, f_id] = 1.0
        # k pixels deviate from the rest-gel depth by 1e-3 > the 1e-4 gate
        b["inputs.depth"][0, f_id, 7 : 7 + k] = 0.0205
    return b


def _run_t2d_case(pair, rng, monkeypatch, with_img):
    ref, model, variables = pair
    tmod = _ref_training_mod()
    b = _t2d_batch(rng)
    mv, mf = _cube_mesh()
    vf_dict = {"m0": {"v": mv, "f": mf}}

    # path 3 (no img) inherits the reference's normalized-depth quirk
    # (training.py:647,692): every pixel of a touching finger "contacts",
    # capped at 128 — num_sample must exceed that cap there
    if with_img:
        num_sample, k = NUM_SAMPLE, 20
    else:
        num_sample, k = 160, min(128, H * W)

    ref.train()
    rt = _ref_trainer(ref, tmod, num_sample=num_sample, with_img=with_img,
                      encode_t2d=True, pretrained_t2d=False)
    captured = _capture_igl(monkeypatch)
    _det_randint(monkeypatch)
    _strip_requires_grad(monkeypatch)
    method = rt.compute_loss_t2d_img if with_img else rt.compute_loss_t2d
    loss_t, loss_mano_t, loss_pc_t = method(
        _to_ref_data(b, names=["m0"]), vf_dict
    )
    ref_grads = _ref_backward(ref, loss_t)
    assert len(captured) == B and captured[0].shape == (num_sample, 3)

    # inject the reference's sample; with_img also needs the slot→finger
    # assignment: the touching finger's contact points occupy the leading
    # k slots (the scenario has exactly one touching finger)
    pts = jnp.asarray(np.stack(captured))
    finger = np.full((B, num_sample), -1, np.int32)
    finger[0, :k] = 1
    valid = finger >= 0
    monkeypatch.setattr(
        C, "t2d_contact_sample",
        lambda *a, **kw: C.ContactSample(
            pts, jnp.asarray(valid), jnp.asarray(finger)
        ),
    )

    tr = Trainer(model, with_img=with_img, encode_t2d=True,
                 pretrained_t2d=False, num_sample=num_sample,
                 matmul_precision="highest")
    a = _our_a(tr, b)
    a["mesh_verts"] = jnp.asarray(mv[None])
    a["mesh_faces"] = jnp.asarray(mf[None])
    loss, scalars, grads = _our_loss_grads(tr, variables, a)

    _close(loss, float(loss_t))
    _close(scalars["loss_mano"], float(loss_mano_t))
    _close(scalars["loss_pc"], float(loss_pc_t))
    expect = ["encoder", "encoder_hand", "encoder_t2d"]
    if with_img:
        expect.append("encoder_img")
    _assert_grad_cosine(grads, _map_ref_grads(ref_grads, variables),
                        expect=tuple(expect))


def test_grad_parity_t2d(vtaco_pair, rng, monkeypatch):
    _run_t2d_case(vtaco_pair, rng, monkeypatch, with_img=False)


def test_grad_parity_t2d_img(vtaco_pair, rng, monkeypatch):
    _run_t2d_case(vtaco_pair, rng, monkeypatch, with_img=True)

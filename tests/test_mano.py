"""MANO layer parity vs the reference torch implementation.

The reference ManoLayer is imported from /root/reference (read-only) as a
test oracle; its missing native deps (torch_scatter, pykdtree, pybullet,
chumpy) are stubbed, and its chumpy-based asset loader is monkeypatched to
feed the same npz arrays our JAX layer uses.
"""

import sys
import types

import numpy as np
import pytest

from vtaco_tpu.models.mano import ManoLayer
from vtaco_tpu.models.mano_assets import load_mano_assets


class _R:
    """Minimal chumpy-like wrapper exposing `.r`."""

    def __init__(self, a):
        self.r = a


def _load_reference_manolayer():
    # stub native modules the reference package imports at module scope
    for name in ("torch_scatter",):
        mod = types.ModuleType(name)
        mod.scatter_mean = lambda *a, **k: None
        mod.scatter_max = lambda *a, **k: None
        sys.modules.setdefault(name, mod)
    pykdtree = types.ModuleType("pykdtree")
    pykdtree_kdtree = types.ModuleType("pykdtree.kdtree")
    pykdtree_kdtree.KDTree = object
    pykdtree.kdtree = pykdtree_kdtree
    sys.modules.setdefault("pykdtree", pykdtree)
    sys.modules.setdefault("pykdtree.kdtree", pykdtree_kdtree)
    pybullet = types.ModuleType("pybullet")
    pybullet.computeProjectionMatrixFOV = lambda *a, **k: [0.0] * 16
    sys.modules.setdefault("pybullet", pybullet)

    sys.path.insert(0, "/root/reference")
    try:
        import src.encoder.manolayer as ref_mano
    finally:
        sys.path.pop(0)

    assets = load_mano_assets()

    class _Sparse:
        def __init__(self, a):
            self._a = a

        def toarray(self):
            return self._a

    def fake_ready_arguments(path):
        return {
            "betas": _R(assets["betas"].astype(np.float64)),
            "shapedirs": _R(assets["shapedirs"].astype(np.float64)),
            "posedirs": _R(assets["posedirs"].astype(np.float64)),
            "v_template": _R(assets["v_template"].astype(np.float64)),
            "J_regressor": _Sparse(assets["J_regressor"].astype(np.float64)),
            "weights": _R(assets["weights"].astype(np.float64)),
            "f": assets["faces"].astype(np.uint32),
            "hands_components": assets["hands_components"].astype(np.float64),
            "hands_mean": assets["hands_mean"].astype(np.float64),
            "kintree_table": np.stack(
                [assets["kintree_parents"], np.arange(16)]
            ),
        }

    ref_mano.ready_arguments = fake_ready_arguments
    return ref_mano.ManoLayer


REF_KWARGS = dict(
    center_idx=9,
    flat_hand_mean=False,
    ncomps=45,
    side="right",
    use_pca=False,
    root_rot_mode="axisang",
    joint_rot_mode="axisang",
)


@pytest.fixture(scope="module")
def layers():
    import torch

    RefMano = _load_reference_manolayer()
    ref = RefMano(mano_root="unused", **REF_KWARGS)
    ours = ManoLayer(**REF_KWARGS)
    return ref, ours, torch


def test_mano_matches_reference(layers, rng):
    import torch

    ref, ours, _ = layers
    pose = rng.standard_normal((3, 48)).astype(np.float32) * 0.5
    rv, rj = ref(torch.from_numpy(pose))
    ov, oj = ours(pose)
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), atol=2e-5)


def test_mano_zero_wrist_path(layers, rng):
    """The exact call the composite makes: zeroed wrist, 45-dof pose."""
    import torch

    ref, ours, _ = layers
    pose45 = rng.standard_normal((2, 45)).astype(np.float32) * 0.3
    full = np.concatenate([np.zeros((2, 3), np.float32), pose45], axis=1)
    rv, rj = ref(torch.from_numpy(full))
    ov, oj = ours(full)
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oj), rj.numpy(), atol=2e-5)
    assert ov.shape == (2, 778, 3) and oj.shape == (2, 21, 3)


def test_mano_pca_mode(rng):
    ours = ManoLayer(
        center_idx=9, flat_hand_mean=False, ncomps=6, side="right", use_pca=True
    )
    pose = rng.standard_normal((2, 9)).astype(np.float32) * 0.5
    v, j = ours(pose)
    assert v.shape == (2, 778, 3) and j.shape == (2, 21, 3)
    assert np.isfinite(np.asarray(v)).all()


def test_mano_grad():
    import jax
    import jax.numpy as jnp

    ours = ManoLayer(**REF_KWARGS)

    def loss(pose):
        v, j = ours(pose)
        return jnp.sum(v**2)

    g = jax.grad(loss)(jnp.zeros((1, 48)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

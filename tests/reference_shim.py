"""Import the PyTorch reference (/root/reference, read-only) in-process.

The reference package imports native / heavyweight deps at module scope
that this environment lacks. Everything the model *build + forward* path
actually executes gets a REAL pure-torch implementation (torch_scatter);
everything only touched by train/generation code paths we don't run gets
an inert stub (igl, trimesh, skimage, plyfile, ...). The chumpy-based MANO
asset loader is monkeypatched to feed the same npz arrays our JAX layer
uses (as tests/test_mano.py already does for the layer-level oracle).

Used by tests/test_full_parity.py to build the full reference
ConvolutionalOccupancyNetwork (src/conv_onet/models/__init__.py:24-197 via
src/conv_onet/config.py:16-143) as a numerical oracle.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# pure-torch torch_scatter (the only shim the forward path executes)
# ---------------------------------------------------------------------------

def _make_torch_scatter():
    import torch

    def _expand(index, src):
        # torch_scatter broadcast rule for the shapes the reference uses:
        # index (B, 1, N) against src (B, C, N) along dim=-1
        if index.shape != src.shape:
            index = index.expand_as(src)
        return index

    def scatter_sum(src, index, dim=-1, out=None, dim_size=None):
        index = _expand(index, src)
        if out is None:
            size = list(src.shape)
            size[dim] = (
                dim_size if dim_size is not None else int(index.max()) + 1
            )
            out = src.new_zeros(size)
        return out.scatter_add_(dim, index, src)

    def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
        if out is not None:
            dim_size = out.shape[dim]
        sums = scatter_sum(src, index, dim, None, dim_size)
        cnt = scatter_sum(torch.ones_like(src), index, dim, None, dim_size)
        res = sums / cnt.clamp(min=1)
        if out is not None:
            out.copy_(res)
            return out
        return res

    def scatter_max(src, index, dim=-1, out=None, dim_size=None):
        index = _expand(index, src)
        size = list(src.shape)
        size[dim] = dim_size if dim_size is not None else int(index.max()) + 1
        base = src.new_full(size, float("-inf"))
        vals = base.scatter_reduce(dim, index, src, "amax", include_self=True)
        # empty cells → 0 (torch_scatter leaves them at the fill value; the
        # reference only gathers non-empty cells, so this is unobservable —
        # zeroing keeps any stray read finite)
        vals = torch.where(torch.isinf(vals), torch.zeros_like(vals), vals)
        argm = torch.zeros_like(vals, dtype=torch.long)
        return vals, argm

    mod = types.ModuleType("torch_scatter")
    mod.scatter_mean = scatter_mean
    mod.scatter_max = scatter_max
    mod.scatter_add = scatter_sum
    return mod


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


_TORCH_SCATTER = None


def install_shims():
    """Register stand-ins for the reference's missing native deps."""
    # always (re)install the REAL pure-torch implementation: test_mano.py
    # may have seeded an inert stub earlier in the same process, and
    # src.encoder.pointnet/voxels bind these names at their import — rebind
    # their module globals too if they are already loaded. The shim is a
    # process singleton: reference modules compare bound functions by
    # identity (`self.scatter == scatter_max`, pointnet.py:128), so a
    # rebuilt shim would break models constructed before the rebuild.
    global _TORCH_SCATTER
    if _TORCH_SCATTER is None:
        _TORCH_SCATTER = _make_torch_scatter()
    real = _TORCH_SCATTER
    sys.modules["torch_scatter"] = real
    for name in ("src.encoder.pointnet", "src.encoder.voxels"):
        m = sys.modules.get(name)
        if m is not None:
            m.scatter_mean = real.scatter_mean
            m.scatter_max = real.scatter_max

    pykdtree = _stub("pykdtree")
    pykdtree_kdtree = _stub("pykdtree.kdtree", KDTree=object)
    pykdtree.kdtree = pykdtree_kdtree
    sys.modules.setdefault("pykdtree", pykdtree)
    sys.modules.setdefault("pykdtree.kdtree", pykdtree_kdtree)

    sys.modules.setdefault(
        "pybullet",
        _stub("pybullet", computeProjectionMatrixFOV=lambda *a, **k: [0.0] * 16),
    )
    sys.modules.setdefault("igl", _stub("igl"))
    sys.modules.setdefault("trimesh", _stub("trimesh", Trimesh=object))
    skim = _stub("skimage")
    skim_measure = _stub(
        "skimage.measure",
        marching_cubes=None,
        marching_cubes_lewiner=None,
        block_reduce=None,
    )
    skim.measure = skim_measure
    sys.modules.setdefault("skimage", skim)
    sys.modules.setdefault("skimage.measure", skim_measure)
    sys.modules.setdefault(
        "plyfile", _stub("plyfile", PlyData=object, PlyElement=object)
    )
    sys.modules.setdefault("chumpy", _stub("chumpy"))

    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms", Compose=lambda x: x)
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)

    # The reference's MANO head does `.to(fea_m.get_device())`
    # (src/encoder/pointnet.py:192-193) — a CUDA-only idiom: get_device()
    # is -1 on CPU and `.to(-1)` raises. Map device -1 → 'cpu' so the
    # oracle runs on the CPU torch build (no behavior change otherwise:
    # `.to(-1)` always errors in stock torch).
    import torch

    if not getattr(torch.Tensor.to, "_vtaco_cpu_patch", False):
        _orig_to = torch.Tensor.to

        def _to(self, *args, **kwargs):
            if args and args[0] == -1:
                args = ("cpu",) + args[1:]
            return _orig_to(self, *args, **kwargs)

        _to._vtaco_cpu_patch = True
        torch.Tensor.to = _to


def import_reference():
    """Import src.conv_onet.config from /root/reference; returns the module.

    Must run with shims installed. The conv_onet modules load
    ``./data/VTacO_mesh/depth_origin.txt`` at import time
    (src/conv_onet/training.py:17), so imports happen from a temp CWD that
    provides it.
    """
    install_shims()
    import tempfile

    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="vtaco_ref_import_")
    os.makedirs(os.path.join(tmp, "data", "VTacO_mesh"), exist_ok=True)
    np.savetxt(
        os.path.join(tmp, "data", "VTacO_mesh", "depth_origin.txt"),
        np.full(76800, 0.0215, np.float64),
    )
    sys.path.insert(0, REF_ROOT)
    os.chdir(tmp)
    try:
        import src.conv_onet.config as ref_cfg_mod  # noqa: F401
        import src.encoder.manolayer as ref_mano
    finally:
        os.chdir(cwd)
        sys.path.remove(REF_ROOT)

    _patch_mano_assets(ref_mano)
    return ref_cfg_mod


def _patch_mano_assets(ref_mano):
    """Point the reference ManoLayer at our npz MANO assets (the chumpy
    pickle path needs chumpy; tests/test_mano.py uses the same bridge)."""
    from vtaco_tpu.models.mano_assets import load_mano_assets

    assets = load_mano_assets()

    class _R:
        def __init__(self, a):
            self.r = a

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


def build_reference_model(cfg):
    """Build the reference ConvolutionalOccupancyNetwork on CPU, eval mode.

    cfg: a config dict in the reference's schema (our load_config produces
    identical structure). encoder_t2d_kwargs['pretrained'] should be False
    so no checkpoint file is required.
    """
    import torch

    ref_cfg_mod = import_reference()
    model = ref_cfg_mod.get_model(cfg, device=torch.device("cpu"))
    model.eval()
    return model

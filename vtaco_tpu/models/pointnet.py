"""Point-cloud encoders producing plane/grid feature fields.

Counterpart of src/encoder/pointnet.py: per-point ResNet-FC stack with
local max/mean pooling feature exchange, scatter-mean aggregation into
2D planes and/or a 3D grid, U-Net smoothing, and the optional MANO head
that regresses hand (or sensor) parameters from globally pooled plane
features.

TPU-first choices: channel-last feature fields ((B, R, R, C) planes,
(B, R, R, R, C) grids), XLA segment reductions instead of CUDA scatter,
and a statically-known plane_type so the traced graph has no dict-order
dependence (order: grid, xz, xy, yz — matching the reference's dict
insertion order at pointnet.py:164-172, which fc_mano's input layout
depends on).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtaco_tpu.models.layers import ResnetBlockFC
from vtaco_tpu.models.unet2d import UNet2D
from vtaco_tpu.models.unet3d import build_unet3d
from vtaco_tpu.ops import scatter
from vtaco_tpu.ops.geometry import (
    coordinate2index,
    normalize_3d_coordinate,
    normalize_coordinate,
)

PLANE_ORDER = ("grid", "xz", "xy", "yz")


class IndexEncoder(nn.Module):
    """Per-sample learned latent by dataset index (the reference's
    ``encoder == 'idx'`` mode, src/conv_onet/config.py:87-88: an
    nn.Embedding over the dataset)."""

    num_embeddings: int
    c_dim: int = 128

    @nn.compact
    def __call__(self, idx, train: bool = True):
        return nn.Embed(self.num_embeddings, self.c_dim, name="embedding")(
            jnp.asarray(idx, jnp.int32)
        )


def _canon_planes(plane_type) -> Tuple[str, ...]:
    """Canonicalize the config's plane_type (str or list) to a tuple in the
    reference's feature-dict insertion order."""
    if isinstance(plane_type, str):
        plane_type = [plane_type]
    return tuple(p for p in PLANE_ORDER if p in plane_type)


class LocalPoolPointnet(nn.Module):
    """PointNet encoder with local pooling (registry key
    ``pointnet_local_pool``). src/encoder/pointnet.py:12-211.

    Returns a dict of feature fields; with ``out_mano`` set, returns the
    MANO/sensor parameter head outputs instead (pointnet.py:175-198).
    """

    c_dim: int = 128
    dim: int = 3
    hidden_dim: int = 128
    scatter_type: str = "max"
    unet: bool = False
    unet_kwargs: Optional[dict] = None
    unet3d: bool = False
    unet3d_kwargs: Optional[dict] = None
    plane_resolution: Optional[int] = None
    grid_resolution: Optional[int] = None
    plane_type: Any = "xz"
    padding: float = 0.1
    n_blocks: int = 5
    out_mano: bool = False
    out_dim: Optional[int] = None
    # manolayer_kwargs handled by the composite (the MANO layer is
    # parameter-free; keeping it out of the linen tree avoids re-tracing)
    manolayer_kwargs: Optional[dict] = None

    def setup(self):
        self.planes = _canon_planes(self.plane_type)
        self.fc_pos = nn.Dense(2 * self.hidden_dim, name="fc_pos")
        self.blocks = [
            ResnetBlockFC(2 * self.hidden_dim, self.hidden_dim, name=f"block{i}")
            for i in range(self.n_blocks)
        ]
        self.fc_c = nn.Dense(self.c_dim, name="fc_c")
        if self.unet:
            kw = dict(self.unet_kwargs or {})
            kw.pop("in_channels", None)
            # tolerate the reference config typo 'start_flits'
            if "start_flits" in kw:
                kw["start_filts"] = kw.pop("start_flits")
            self.unet_mod = UNet2D(self.c_dim, **kw)
        if self.unet3d:
            self.unet3d_mod = build_unet3d(self.unet3d_kwargs or {})
        if self.out_mano:
            self.fc_mano = nn.Dense(self.out_dim, name="fc_mano")

    def _point_indices(self, p):
        """Cell index per plane for every input point."""
        index = {}
        for key in self.planes:
            if key == "grid":
                nor = normalize_3d_coordinate(p, padding=self.padding)
                index[key] = coordinate2index(nor, self.grid_resolution, "3d")
            else:
                nor = normalize_coordinate(p, padding=self.padding, plane=key)
                index[key] = coordinate2index(nor, self.plane_resolution)
        return index

    def pool_local(self, index, c):
        """Pool features into cells and gather back per point.

        Matches pointnet.py:116-132 (sum over planes of the gathered pooled
        features).
        """
        pool = scatter.scatter_max if self.scatter_type == "max" else scatter.scatter_mean
        c_out = 0
        for key in self.planes:
            size = (
                self.grid_resolution**3 if key == "grid" else self.plane_resolution**2
            )
            fea = pool(c, index[key], size)
            c_out += scatter.gather_cells(fea, index[key])
        return c_out

    def generate_plane_features(self, p, c, plane, train=True):
        """Scatter-mean point features into a (B, R, R, C) plane, then UNet.

        pointnet.py:85-100. Plane rows index the second plane coordinate (y)
        and columns the first (x), matching the flat x + R*y order.
        """
        xy = normalize_coordinate(p, padding=self.padding, plane=plane)
        index = coordinate2index(xy, self.plane_resolution)
        R = self.plane_resolution
        fea = scatter.scatter_mean(c, index, R * R).reshape(p.shape[0], R, R, self.c_dim)
        if self.unet:
            fea = self.unet_mod(fea)
        return fea

    def generate_grid_features(self, p, c, train=True):
        """Scatter-mean into a (B, R, R, R, C) volume (z, y, x order), then
        3D UNet. pointnet.py:102-114."""
        p_nor = normalize_3d_coordinate(p, padding=self.padding)
        index = coordinate2index(p_nor, self.grid_resolution, "3d")
        R = self.grid_resolution
        fea = scatter.scatter_mean(c, index, R**3).reshape(
            p.shape[0], R, R, R, self.c_dim
        )
        if self.unet3d:
            fea = self.unet3d_mod(fea, train=train)
        return fea

    def __call__(self, p, train: bool = True):
        index = self._point_indices(p)

        net = self.fc_pos(p)
        net = self.blocks[0](net)
        for block in self.blocks[1:]:
            pooled = self.pool_local(index, net)
            net = jnp.concatenate([net, pooled], axis=2)
            net = block(net)
        c = self.fc_c(net)

        fea = {}
        for key in self.planes:
            if key == "grid":
                fea[key] = self.generate_grid_features(p, c, train=train)
            else:
                fea[key] = self.generate_plane_features(p, c, key, train=train)

        if not self.out_mano:
            return fea

        # MANO head: global average pool of the concatenated fields
        # (pointnet.py:175-188). Channel order follows self.planes.
        pooled = [jnp.mean(fea[k], axis=tuple(range(1, fea[k].ndim - 1)))
                  for k in self.planes]
        feature_m = jnp.concatenate(pooled, axis=-1)
        fea_m = self.fc_mano(feature_m)
        # The ManoLayer call (pointnet.py:190-198) lives in the composite
        # model so this module stays a pure parameter tree.
        return {"mano_param": fea_m}


class PatchLocalPoolPointnet(nn.Module):
    """Crop variant taking precomputed indices (key
    ``pointnet_crop_local_pool``). src/encoder/pointnet.py:213-368.

    Inputs are a dict with 'points' (B, N, 3|60) and 'index' {plane: (B, N)}
    whose ids may include an overflow cell (reso^k) for masked points.
    """

    c_dim: int = 128
    dim: int = 3
    hidden_dim: int = 128
    scatter_type: str = "max"
    unet: bool = False
    unet_kwargs: Optional[dict] = None
    unet3d: bool = False
    unet3d_kwargs: Optional[dict] = None
    plane_resolution: Optional[int] = None
    grid_resolution: Optional[int] = None
    plane_type: Any = "xz"
    padding: float = 0.1
    n_blocks: int = 5
    local_coord: bool = False
    pos_encoding: str = "linear"
    unit_size: float = 0.1

    def setup(self):
        self.planes = _canon_planes(self.plane_type)
        self.fc_pos = nn.Dense(2 * self.hidden_dim, name="fc_pos")
        self.blocks = [
            ResnetBlockFC(2 * self.hidden_dim, self.hidden_dim, name=f"block{i}")
            for i in range(self.n_blocks)
        ]
        self.fc_c = nn.Dense(self.c_dim, name="fc_c")
        if self.unet:
            kw = dict(self.unet_kwargs or {})
            kw.pop("in_channels", None)
            if "start_flits" in kw:
                kw["start_filts"] = kw.pop("start_flits")
            self.unet_mod = UNet2D(self.c_dim, **kw)
        if self.unet3d:
            self.unet3d_mod = build_unet3d(self.unet3d_kwargs or {})

    def _cells(self, key):
        return self.grid_resolution**3 if key == "grid" else self.plane_resolution**2

    def pool_local(self, index, c):
        pool = scatter.scatter_max if self.scatter_type == "max" else scatter.scatter_mean
        c_out = 0
        for key in self.planes:
            # +1 overflow cell for masked/outlier points
            fea = pool(c, index[key], self._cells(key) + 1)
            c_out += scatter.gather_cells(fea, index[key])
        return c_out

    def __call__(self, inputs, train: bool = True):
        p = inputs["points"]
        index = {k: v.astype(jnp.int32) for k, v in inputs["index"].items()}
        if self.local_coord:
            from vtaco_tpu.ops.local_coords import map2local

            pp = map2local(p, self.unit_size, self.pos_encoding)
            net = self.fc_pos(pp)
        else:
            net = self.fc_pos(p)
        net = self.blocks[0](net)
        for block in self.blocks[1:]:
            pooled = self.pool_local(index, net)
            net = jnp.concatenate([net, pooled], axis=2)
            net = block(net)
        c = self.fc_c(net)

        fea = {}
        B = p.shape[0]
        for key in self.planes:
            # scatter with the overflow cell, then drop it
            # (pointnet.py:283-312 'deal with outliers')
            full = scatter.scatter_mean(c, index[key], self._cells(key) + 1)
            full = full[:, : self._cells(key), :]
            if key == "grid":
                R = self.grid_resolution
                f = full.reshape(B, R, R, R, self.c_dim)
                if self.unet3d:
                    f = self.unet3d_mod(f, train=train)
            else:
                R = self.plane_resolution
                f = full.reshape(B, R, R, self.c_dim)
                if self.unet:
                    f = self.unet_mod(f)
            fea[key] = f
        return fea

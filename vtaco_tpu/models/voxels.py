"""Voxel-grid encoders.

Counterparts of src/encoder/voxels.py: a local encoder that lifts a voxel
occupancy grid to per-voxel features and scatters them into plane/grid
fields (key ``voxel_simple_local``), and a plain global conv encoder.
NDHWC layout; voxel coordinates span [-0.5, 0.5] per axis as in
voxels.py:93-102.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtaco_tpu.models.unet2d import UNet2D
from vtaco_tpu.models.unet3d import build_unet3d
from vtaco_tpu.ops import scatter
from vtaco_tpu.ops.geometry import (
    coordinate2index,
    normalize_3d_coordinate,
    normalize_coordinate,
)


class LocalVoxelEncoder(nn.Module):
    """Conv3d stem + scatter into feature fields. voxels.py:10-119."""

    dim: int = 3
    c_dim: int = 128
    unet: bool = False
    unet_kwargs: Optional[dict] = None
    unet3d: bool = False
    unet3d_kwargs: Optional[dict] = None
    plane_resolution: int = 512
    grid_resolution: Optional[int] = None
    plane_type: Any = "xz"
    kernel_size: int = 3
    padding: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        D, H, W = x.shape[1:4]
        n_voxel = D * H * W

        # voxel center coordinates, axis i in [-0.5, 0.5] (voxels.py:93-102)
        c1 = jnp.linspace(-0.5, 0.5, D)
        c2 = jnp.linspace(-0.5, 0.5, H)
        c3 = jnp.linspace(-0.5, 0.5, W)
        g1, g2, g3 = jnp.meshgrid(c1, c2, c3, indexing="ij")
        p = jnp.broadcast_to(
            jnp.stack([g1, g2, g3], axis=-1).reshape(1, n_voxel, 3), (B, n_voxel, 3)
        )

        if self.kernel_size == 1:
            c = nn.Conv(self.c_dim, (1, 1, 1), name="conv_in")(x[..., None])
        else:
            c = nn.Conv(self.c_dim, (self.kernel_size,) * 3, padding=1,
                        name="conv_in")(x[..., None])
        c = nn.relu(c).reshape(B, n_voxel, self.c_dim)

        planes = [self.plane_type] if isinstance(self.plane_type, str) else self.plane_type
        fea = {}
        if "grid" in planes:
            nor = normalize_3d_coordinate(p, padding=self.padding)
            idx = coordinate2index(nor, self.grid_resolution, "3d")
            R = self.grid_resolution
            f = scatter.scatter_mean(c, idx, R**3).reshape(B, R, R, R, self.c_dim)
            if self.unet3d:
                f = build_unet3d(self.unet3d_kwargs or {})(f, train=train)
            fea["grid"] = f
        else:
            for key in ("xz", "xy", "yz"):
                if key in planes:
                    nor = normalize_coordinate(p, padding=self.padding, plane=key)
                    idx = coordinate2index(nor, self.plane_resolution)
                    R = self.plane_resolution
                    f = scatter.scatter_mean(c, idx, R * R).reshape(B, R, R, self.c_dim)
                    if self.unet:
                        kw = dict(self.unet_kwargs or {})
                        kw.pop("in_channels", None)
                        f = UNet2D(self.c_dim, **kw)(f)
                    fea[key] = f
        return fea


class VoxelEncoder(nn.Module):
    """Global conv-pool voxel encoder → (B, c_dim). voxels.py:121-153."""

    dim: int = 3
    c_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        net = nn.Conv(32, (3, 3, 3), padding=1, name="conv_in")(x[..., None])
        for i, ch in enumerate((64, 128, 256, 512)):
            net = nn.Conv(ch, (3, 3, 3), strides=2, padding=1, name=f"conv_{i}")(
                nn.relu(net)
            )
        hidden = net.reshape(B, -1)
        return nn.Dense(self.c_dim, name="fc")(nn.relu(hidden))

"""Feature interpolation ops (the decoder's hot path).

Bilinear plane sampling and trilinear grid sampling with *border* padding
and *align_corners* semantics, matching the reference's use of
``F.grid_sample(..., padding_mode='border', align_corners=True)`` at
src/conv_onet/models/decoder.py:55-68.

Layout is TPU-native channel-last:
  planes  (B, H, W, C)   sampled with uv  (B, N, 2), uv[...,0]=x→W, 1=y→H
  grids   (B, D, H, W, C) sampled with uvw (B, N, 3), 0=x→W, 1=y→H, 2=z→D
Coordinates are the [0, 1]-normalized outputs of
``normalize_coordinate`` / ``normalize_3d_coordinate`` (the reference maps
them to [-1, 1] for grid_sample; with align_corners the composition is just
``pix = u * (S - 1)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pix(u, size):
    """[0,1] coord → continuous pixel coord with align_corners + border clamp."""
    return jnp.clip(u * (size - 1), 0.0, size - 1)


def interp_plane(fea, uv, mode: str = "bilinear"):
    """Sample plane features at continuous 2D locations.

    Args:
      fea: (B, H, W, C) feature plane.
      uv:  (B, N, 2) normalized coords in [0, 1].
    Returns:
      (B, N, C) sampled features.
    """
    B, H, W, C = fea.shape
    x = _pix(uv[..., 0], W)
    y = _pix(uv[..., 1], H)

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        flat = fea.reshape(B, H * W, C)
        idx = yi * W + xi
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0
    wy = y - y0

    flat = fea.reshape(B, H * W, C)

    def g(yy, xx):
        return jnp.take_along_axis(flat, (yy * W + xx)[..., None], axis=1)

    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    return g(y0, x0) * w00 + g(y0, x1) * w01 + g(y1, x0) * w10 + g(y1, x1) * w11


def interp_grid(fea, uvw, mode: str = "bilinear"):
    """Sample 3D grid features at continuous locations (trilinear).

    Args:
      fea: (B, D, H, W, C) feature volume (D↔z, H↔y, W↔x).
      uvw: (B, N, 3) normalized coords in [0, 1], (x, y, z) order.
    Returns:
      (B, N, C) sampled features.
    """
    B, D, H, W, C = fea.shape
    x = _pix(uvw[..., 0], W)
    y = _pix(uvw[..., 1], H)
    z = _pix(uvw[..., 2], D)

    flat = fea.reshape(B, D * H * W, C)

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        zi = jnp.clip(jnp.round(z).astype(jnp.int32), 0, D - 1)
        idx = (zi * H + yi) * W + xi
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    wz = (z - z0)[..., None]

    def g(zz, yy, xx):
        return jnp.take_along_axis(flat, ((zz * H + yy) * W + xx)[..., None], axis=1)

    c00 = g(z0, y0, x0) * (1 - wx) + g(z0, y0, x1) * wx
    c01 = g(z0, y1, x0) * (1 - wx) + g(z0, y1, x1) * wx
    c10 = g(z1, y0, x0) * (1 - wx) + g(z1, y0, x1) * wx
    c11 = g(z1, y1, x0) * (1 - wx) + g(z1, y1, x1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz

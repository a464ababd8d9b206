"""Occupancy decoders: interpolate local features at query points and run a
conditioned ResNet-FC stack to a logit.

Counterpart of src/conv_onet/models/decoder.py. Feature fields are
channel-last dicts {plane: (B, R, R, C) | 'grid': (B, R, R, R, C)}; query
points (B, N, 3). ``forward_img`` is the visual-tactile fusion path used by
VTacO (query point concatenated with its per-point tactile feature,
decoder.py:71-103); ``forward_contact`` adds a second contact-logit head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtaco_tpu.models.layers import ResnetBlockFC
from vtaco_tpu.ops.geometry import (
    normalize_3d_coordinate,
    normalize_coordinate,
)
from vtaco_tpu.ops.interp import interp_grid, interp_plane


def _actvn(leaky: bool):
    if leaky:
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    return nn.relu


class LocalDecoder(nn.Module):
    """Registry key ``simple_local`` — decoder.py:9-161."""

    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "bilinear"
    padding: float = 0.1
    with_contact: bool = False

    def setup(self):
        if self.c_dim != 0:
            self.fc_c = [
                nn.Dense(self.hidden_size, name=f"fc_c{i}")
                for i in range(self.n_blocks)
            ]
        self.fc_p = nn.Dense(self.hidden_size, name="fc_p")
        self.fc_p_img = nn.Dense(self.hidden_size, name="fc_p_img")
        self.blocks = [
            ResnetBlockFC(self.hidden_size, name=f"block{i}")
            for i in range(self.n_blocks)
        ]
        self.fc_out = nn.Dense(1, name="fc_out")
        if self.with_contact:
            self.fc_out_contact = nn.Dense(1, name="fc_out_contact")

    def sample_features(self, p, c_plane):
        """Sum of plane/grid features sampled at p (decoder.py:136-147)."""
        c = 0
        if "grid" in c_plane:
            uvw = normalize_3d_coordinate(p, padding=self.padding)
            c += interp_grid(c_plane["grid"], uvw, mode=self.sample_mode)
        for key in ("xz", "xy", "yz"):
            if key in c_plane:
                uv = normalize_coordinate(p, padding=self.padding, plane=key)
                c += interp_plane(c_plane[key], uv, mode=self.sample_mode)
        return c

    def _trunk(self, net, c):
        act = _actvn(self.leaky)
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        return self.fc_out(act(net)).squeeze(-1), net

    def __call__(self, p, c_plane, **kwargs):
        c = self.sample_features(p, c_plane) if self.c_dim != 0 else None
        net = self.fc_p(p)
        out, _ = self._trunk(net, c)
        return out

    def forward_img(self, p, c_plane, c_img, **kwargs):
        """Tactile-feature fusion: fc_p_img([p, c_img]) (decoder.py:85-87)."""
        c = self.sample_features(p, c_plane) if self.c_dim != 0 else None
        net = self.fc_p_img(jnp.concatenate([p, c_img], axis=2))
        out, _ = self._trunk(net, c)
        return out

    def forward_feats(self, p, c, **kwargs):
        """Trunk on pre-interpolated features (dense-grid fast path)."""
        net = self.fc_p(p)
        out, _ = self._trunk(net, c if self.c_dim != 0 else None)
        return out

    def forward_img_feats(self, p, c, c_img, **kwargs):
        """forward_img on pre-interpolated features (dense-grid fast path)."""
        net = self.fc_p_img(jnp.concatenate([p, c_img], axis=-1))
        out, _ = self._trunk(net, c if self.c_dim != 0 else None)
        return out

    def forward_contact(self, p, c_plane, **kwargs):
        c = self.sample_features(p, c_plane) if self.c_dim != 0 else None
        net = self.fc_p(p)
        act = _actvn(self.leaky)
        out, trunk = self._trunk(net, c)
        out_contact = self.fc_out_contact(act(trunk)).squeeze(-1)
        return out, out_contact


class AttentionDecoder(nn.Module):
    """Registry key ``attention_local`` — decoder.py:163-329. Fuses the
    tactile features into the sampled field via TransformerFusion
    (``c = fuser(c_img, 1, c, 1)``, decoder.py:258)."""

    dim: int = 3
    c_dim: int = 128
    input_size: int = 2048
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "bilinear"
    padding: float = 0.1
    with_contact: bool = False

    def setup(self):
        from vtaco_tpu.models.fusion import TransformerFusion

        if self.c_dim != 0:
            self.fc_c = [
                nn.Dense(self.hidden_size, name=f"fc_c{i}")
                for i in range(self.n_blocks)
            ]
        self.fc_p = nn.Dense(self.hidden_size, name="fc_p")
        self.fc_p_img = nn.Dense(self.hidden_size, name="fc_p_img")
        self.blocks = [
            ResnetBlockFC(self.hidden_size, name=f"block{i}")
            for i in range(self.n_blocks)
        ]
        self.fc_out = nn.Dense(1, name="fc_out")
        if self.with_contact:
            self.fc_out_contact = nn.Dense(1, name="fc_out_contact")
        self.fuser = TransformerFusion(
            use_xyz=True,
            input_size=self.input_size,
            d_model=self.c_dim,
            num_layers=1,
            key_feature_dim=64,
            with_pos_embed=False,
            encoder_pos_embed_input_dim=3,
            decoder_pos_embed_input_dim=3,
        )

    sample_features = LocalDecoder.sample_features
    _trunk = LocalDecoder._trunk

    def __call__(self, p, c_plane, **kwargs):
        c = self.sample_features(p, c_plane) if self.c_dim != 0 else None
        net = self.fc_p(p)
        out, _ = self._trunk(net, c)
        return out

    def forward_img(self, p, c_plane, c_img, **kwargs):
        c = self.sample_features(p, c_plane) if self.c_dim != 0 else None
        net = self.fc_p(p)
        c = self.fuser(c_img, None, c, None)
        out, _ = self._trunk(net, c)
        return out

    def forward_contact(self, p, c_plane, **kwargs):
        c = self.sample_features(p, c_plane) if self.c_dim != 0 else None
        net = self.fc_p(p)
        act = _actvn(self.leaky)
        out, trunk = self._trunk(net, c)
        out_contact = self.fc_out_contact(act(trunk)).squeeze(-1)
        return out, out_contact


class PatchLocalDecoder(nn.Module):
    """Registry key ``simple_local_crop`` — decoder.py:332-425. Queries come
    pre-normalized per crop: p = {'p': (B,N,3), 'p_n': {plane: (B,N,2|3)}}."""

    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "bilinear"
    local_coord: bool = False
    pos_encoding: str = "linear"
    unit_size: float = 0.1
    padding: float = 0.1
    with_contact: bool = False

    def setup(self):
        if self.c_dim != 0:
            self.fc_c = [
                nn.Dense(self.hidden_size, name=f"fc_c{i}")
                for i in range(self.n_blocks)
            ]
        self.fc_p = nn.Dense(self.hidden_size, name="fc_p")
        self.blocks = [
            ResnetBlockFC(self.hidden_size, name=f"block{i}")
            for i in range(self.n_blocks)
        ]
        self.fc_out = nn.Dense(1, name="fc_out")

    def __call__(self, p, c_plane, **kwargs):
        p_n = p["p_n"]
        pts = p["p"]
        c = 0
        if self.c_dim != 0:
            if "grid" in c_plane:
                c += interp_grid(c_plane["grid"], p_n["grid"], mode=self.sample_mode)
            for key in ("xz", "xy", "yz"):
                if key in c_plane:
                    c += interp_plane(c_plane[key], p_n[key], mode=self.sample_mode)
        if self.local_coord:
            from vtaco_tpu.ops.local_coords import map2local

            pts = map2local(pts, self.unit_size, self.pos_encoding)
        net = self.fc_p(pts)
        act = _actvn(self.leaky)
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        return self.fc_out(act(net)).squeeze(-1)


class LocalPointDecoder(nn.Module):
    """Registry key ``simple_local_point`` — decoder.py:427-515. Conditions
    on kernel-weighted features of the raw input cloud instead of fields."""

    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "gaussian"
    gaussian_val: float = 0.1
    padding: float = 0.1
    with_contact: bool = False

    def setup(self):
        if self.c_dim != 0:
            self.fc_c = [
                nn.Dense(self.hidden_size, name=f"fc_c{i}")
                for i in range(self.n_blocks)
            ]
        self.fc_p = nn.Dense(self.hidden_size, name="fc_p")
        self.blocks = [
            ResnetBlockFC(self.hidden_size, name=f"block{i}")
            for i in range(self.n_blocks)
        ]
        self.fc_out = nn.Dense(1, name="fc_out")

    def sample_point_feature(self, q, p, fea):
        """Gaussian / inverse-distance kernel feature transfer
        (decoder.py:468-485)."""
        dist = jnp.linalg.norm(p[:, None, :, :] - q[:, :, None, :], axis=3) + 10e-6
        if self.sample_mode == "gaussian":
            weight = jnp.exp(-(dist**2) / (self.gaussian_val**2))
        else:
            weight = 1.0 / dist
        weight = weight / jnp.sum(weight, axis=2, keepdims=True)
        return weight @ fea

    def __call__(self, p, c, **kwargs):
        if self.c_dim != 0:
            pp, fea = c
            # the reference chunks >=30k queries host-side (decoder.py:490);
            # here XLA tiles the (N, M) kernel matmul itself.
            c = self.sample_point_feature(p, pp, fea)
        net = self.fc_p(p)
        act = _actvn(self.leaky)
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        return self.fc_out(act(net)).squeeze(-1)

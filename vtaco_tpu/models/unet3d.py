"""3D U-Net family for smoothing the object feature volume.

Counterpart of src/encoder/unet3d.py (wolny/pytorch-3dunet lineage):
configurable conv-order strings ('gcr' = GroupNorm+Conv+ReLU default),
DoubleConv encoder/decoder blocks, max-pool downsampling, nearest-neighbor
upsampling with concat joining, 1x1x1 final conv. The shipped VTacO config
runs UNet3D(num_levels=4, f_maps=32, in=32, out=32) over the 64^3 object
grid. NDHWC layout.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def number_of_features_per_level(init_channels: int, num_levels: int):
    """[c, 2c, 4c, ...]. src/encoder/unet3d.py:11-12."""
    return [init_channels * 2**k for k in range(num_levels)]


class SmallChannelConv3(nn.Module):
    """3³ stride-1 SAME conv computed as three depth-shifted 2D convs.

    Exact (up to fp summation order): y[d] = Σ_dd conv2d(x[d+dd-1], w[dd]).
    On TPU, XLA's 2D conv path runs the sub-128-channel shapes of the
    UNet3D top levels ~1.8× faster than the 3D path (the 64³×C32 level-0
    conv measures 2.2 ms vs 4.0 ms fwd on v5e — see docs/DESIGN.md).
    Parameter names/shapes match nn.Conv ('kernel' (3,3,3,Cin,Cout),
    'bias'), so checkpoints are interchangeable with the plain conv.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, c_in, self.features), jnp.float32,
        )
        # same dtype promotion as nn.Conv(dtype=None): bf16 only when both
        # activations and (pre-cast) params are bf16
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        kernel = kernel.astype(dt)
        x = x.astype(dt)
        b, d, h, w, _ = x.shape
        x2 = x.reshape(b * d, h, w, c_in)
        ys = [
            jax.lax.conv_general_dilated(
                x2, kernel[dd], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, d, h, w, self.features)
            for dd in range(3)
        ]
        z = jnp.zeros((b, 1, h, w, self.features), ys[0].dtype)
        y = (jnp.concatenate([z, ys[0][:, :-1]], axis=1) + ys[1]
             + jnp.concatenate([ys[2][:, 1:], z], axis=1))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class SingleConv(nn.Module):
    """One conv layer assembled from an order string.

    Matches create_conv at src/encoder/unet3d.py:19-100: 'c' conv (bias only
    when no norm in order), 'g' GroupNorm (grouped on in- or out-channels
    depending on position), 'b' BatchNorm, 'r'/'l'/'e' activations.
    3³ SAME convs on large-spatial inputs (≥ 2¹⁷ voxels, any channel
    count) route through SmallChannelConv3 (same params, same math,
    faster TPU layout).
    """

    out_channels: int
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        order = self.order
        has_norm = "g" in order or "b" in order
        for i, ch in enumerate(order):
            if ch == "r":
                x = nn.relu(x)
            elif ch == "l":
                x = nn.leaky_relu(x, negative_slope=0.1)
            elif ch == "e":
                x = nn.elu(x)
            elif ch == "c":
                # the depth-decomposed conv wins on large-spatial levels
                # (64³-class, any channel count measured: C32→32 1.8×,
                # C96→32 1.2×); at 32³ and below the 3D path is equal or
                # better — see docs/DESIGN.md
                spatial = x.shape[1] * x.shape[2] * x.shape[3]
                if self.kernel_size == 3 and self.padding == 1 and \
                        spatial >= 131072:
                    x = SmallChannelConv3(
                        self.out_channels, use_bias=not has_norm,
                        name=f"conv{i}",
                    )(x)
                else:
                    x = nn.Conv(
                        self.out_channels,
                        (self.kernel_size,) * 3,
                        padding=self.padding,
                        use_bias=not has_norm,
                        name=f"conv{i}",
                    )(x)
            elif ch == "g":
                num_channels = x.shape[-1]
                groups = self.num_groups if num_channels >= self.num_groups else 1
                # epsilon: torch nn.GroupNorm default (1e-5; flax defaults
                # to 1e-6, which visibly shifts near-constant groups — the
                # scattered grid is mostly empty cells)
                x = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                                 name=f"groupnorm{i}")(x)
            elif ch == "b":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"batchnorm{i}")(x)
            else:
                raise ValueError(f"unsupported layer type '{ch}'")
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs with the encoder/decoder channel split.

    Matches src/encoder/unet3d.py:103-144: on the encoder path conv1 goes to
    max(out/2, in) channels, conv2 to out; on the decoder both go to out.
    """

    out_channels: int
    encoder: bool
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_channels = x.shape[-1]
        if self.encoder:
            mid = max(self.out_channels // 2, in_channels)
        else:
            mid = self.out_channels
        x = SingleConv(mid, self.kernel_size, self.order, self.num_groups,
                       name="SingleConv1")(x, train=train)
        x = SingleConv(self.out_channels, self.kernel_size, self.order,
                       self.num_groups, name="SingleConv2")(x, train=train)
        return x


class ExtResNetBlock(nn.Module):
    """Residual basic block used by ResidualUNet3D. src/encoder/unet3d.py:147-192."""

    out_channels: int
    kernel_size: int = 3
    order: str = "cge"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = SingleConv(self.out_channels, self.kernel_size, self.order,
                         self.num_groups, name="conv1")(x, train=train)
        residual = out
        out = SingleConv(self.out_channels, self.kernel_size, self.order,
                         self.num_groups, name="conv2")(out, train=train)
        n_order = "".join(c for c in self.order if c not in "rel")
        out = SingleConv(self.out_channels, self.kernel_size, n_order,
                         self.num_groups, name="conv3")(out, train=train)
        out = out + residual
        if "l" in self.order:
            return nn.leaky_relu(out, negative_slope=0.1)
        if "e" in self.order:
            return nn.elu(out)
        return nn.relu(out)


class Abstract3DUNet(nn.Module):
    """Encoder/decoder 3D U-Net skeleton. src/encoder/unet3d.py:361-474.

    ``basic_module`` chooses DoubleConv (max-pool down, nearest-resize up,
    concat join) or ExtResNetBlock (transpose-conv up, sum join).
    """

    out_channels: int
    f_maps: int | Sequence[int] = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    basic_module: str = "double_conv"  # 'double_conv' | 'ext_resnet'
    # rematerialize conv blocks in the backward pass: peak activation
    # memory drops from the whole-UNet chain to one block's internals plus
    # the block-boundary residuals — what makes B=12 at 64³ fit on one chip.
    # True remats every block; 'finest' only the full-resolution blocks
    # (the first encoder and last decoder — the memory peak; coarser
    # levels are 8× smaller per level, so rematting them buys almost no
    # memory while still paying their recompute). nn.remat preserves the
    # parameter tree, so checkpoints interchange across settings.
    remat: bool | str = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)

        use_double = self.basic_module == "double_conv"
        if self.remat not in (False, True, "finest"):
            raise ValueError(
                f"unet3d remat must be false, true or 'finest'; got "
                f"{self.remat!r}"
            )
        DC_r = nn.remat(DoubleConv, static_argnums=(2,))
        ERB_r = nn.remat(ExtResNetBlock, static_argnums=(2,))

        def blocks(finest):
            if self.remat is True or (self.remat == "finest" and finest):
                return DC_r, ERB_r
            return DoubleConv, ExtResNetBlock

        encoders_features = []
        for i, out_f in enumerate(f_maps):
            DC, ERB = blocks(finest=i == 0)
            if i > 0:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            if use_double:
                x = DC(out_f, encoder=True, order=self.layer_order,
                       num_groups=self.num_groups, name=f"enc{i}")(
                    x, train  # positional: static arg under nn.remat
                )
            else:
                x = ERB(out_f, order=self.layer_order,
                        num_groups=self.num_groups, name=f"enc{i}")(
                    x, train
                )
            encoders_features.insert(0, x)

        encoders_features = encoders_features[1:]
        rev = list(reversed(f_maps))
        for i, enc_f in enumerate(encoders_features):
            DC, ERB = blocks(finest=i == len(encoders_features) - 1)
            out_f = rev[i + 1]
            tgt = enc_f.shape[1:4]
            if use_double:
                b, d, h, w, c = x.shape
                x = jax.image.resize(x, (b, *tgt, c), method="nearest")
                x = jnp.concatenate([enc_f, x], axis=-1)
                x = DC(out_f, encoder=False, order=self.layer_order,
                       num_groups=self.num_groups, name=f"dec{i}")(
                    x, train
                )
            else:
                x = nn.ConvTranspose(out_f, (3, 3, 3), strides=(2, 2, 2),
                                     padding=1, name=f"up{i}")(x)
                # transpose conv must reproduce the encoder spatial size
                x = x[:, : tgt[0], : tgt[1], : tgt[2], :]
                x = enc_f + x
                x = ERB(out_f, order=self.layer_order,
                        num_groups=self.num_groups, name=f"dec{i}")(
                    x, train
                )

        x = nn.Conv(self.out_channels, (1, 1, 1), name="final_conv")(x)
        # is_segmentation sigmoid is train-time inactive in the reference
        # (testing=False, unet3d.py:469-472) — omitted.
        return x


class UNet3D(Abstract3DUNet):
    """Standard 3D U-Net (DoubleConv + nearest upsampling).

    src/encoder/unet3d.py:477-491. Accepts the reference's kwargs
    (in_channels is inferred from the input, final_sigmoid ignored).
    """

    basic_module: str = "double_conv"


class ResidualUNet3D(Abstract3DUNet):
    """Residual 3D U-Net (ExtResNetBlock + transposed-conv upsampling).

    src/encoder/unet3d.py:494-509.
    """

    basic_module: str = "ext_resnet"
    num_levels: int = 5


def build_unet3d(kwargs: dict) -> UNet3D:
    """Construct UNet3D from reference-style unet3d_kwargs (in_channels /
    final_sigmoid / is_segmentation keys accepted and ignored where moot)."""
    kw = dict(kwargs)
    kw.pop("in_channels", None)
    kw.pop("final_sigmoid", None)
    kw.pop("is_segmentation", None)
    return UNet3D(**kw)

"""Plain 2D U-Net used to smooth tri-plane features inside the point
encoder (no normalization, no output activation).

Counterpart of src/encoder/unet.py:48-239 (which the reference instantiates
at src/encoder/pointnet.py:50 with ``UNet(c_dim, in_channels=c_dim,
depth=4, merge_mode='concat', start_filts=32)``). NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vtaco_tpu.models.layers import xavier_normal


class DownConv(nn.Module):
    """Two relu 3x3 convs + optional 2x2 maxpool. src/encoder/unet.py:48-72."""

    out_channels: int
    pooling: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            kernel_init=xavier_normal,
                            bias_init=nn.initializers.zeros, name="conv1")(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            kernel_init=xavier_normal,
                            bias_init=nn.initializers.zeros, name="conv2")(x))
        before_pool = x
        if self.pooling:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, before_pool


class UpConv(nn.Module):
    """Upsample + merge + two relu convs. src/encoder/unet.py:75-114."""

    out_channels: int
    merge_mode: str = "concat"
    up_mode: str = "transpose"

    @nn.compact
    def __call__(self, from_down, from_up):
        if self.up_mode == "transpose":
            from_up = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                                       kernel_init=xavier_normal,
                                       bias_init=nn.initializers.zeros,
                                       name="upconv")(from_up)
        else:
            b, h, w, c = from_up.shape
            from_up = jax.image.resize(from_up, (b, h * 2, w * 2, c), "bilinear")
            from_up = nn.Conv(self.out_channels, (1, 1),
                              kernel_init=xavier_normal,
                              bias_init=nn.initializers.zeros,
                              name="upconv_1x1")(from_up)
        if self.merge_mode == "concat":
            x = jnp.concatenate([from_up, from_down], axis=-1)
        else:
            x = from_up + from_down
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            kernel_init=xavier_normal,
                            bias_init=nn.initializers.zeros, name="conv1")(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            kernel_init=xavier_normal,
                            bias_init=nn.initializers.zeros, name="conv2")(x))
        return x


class UNet2D(nn.Module):
    """Plane-feature U-Net: raw linear output (no norm / sigmoid).

    Matches src/encoder/unet.py:117-239. ``num_classes`` is the output
    channel count (the encoder passes c_dim).
    """

    num_classes: int
    in_channels: int = 3
    depth: int = 4
    start_filts: int = 32
    up_mode: str = "transpose"
    merge_mode: str = "concat"

    @nn.compact
    def __call__(self, x):
        encoder_outs = []
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2**i)
            pooling = i < self.depth - 1
            x, before_pool = DownConv(outs, pooling=pooling, name=f"down{i}")(x)
            encoder_outs.append(before_pool)
        for i in range(self.depth - 1):
            outs = outs // 2
            before_pool = encoder_outs[-(i + 2)]
            x = UpConv(outs, merge_mode=self.merge_mode, up_mode=self.up_mode,
                       name=f"up{i}")(before_pool, x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=xavier_normal,
                    bias_init=nn.initializers.zeros, name="conv_final")(x)
        return x

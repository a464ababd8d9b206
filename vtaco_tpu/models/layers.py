"""Building-block modules (flax.linen, channel-last).

Counterparts of the reference's src/layers.py: the fully-connected ResNet
block used by every point encoder/decoder, the from-scratch ResNet-18/34/50
image encoders (tactile feature extractor), and the BatchNorm U-Net used as
the tactile depth estimator U_I. Layouts are TPU-native NHWC; convolutions
carry explicit symmetric padding to match the torch shapes.

Every nn.BatchNorm here (and in pointnetpp/fusion/unet3d) passes
momentum=0.9: flax's momentum is the running-stat DECAY, so 0.9 equals
torch BatchNorm2d's default momentum=0.1 (new = 0.9*old + 0.1*batch);
flax's own default 0.99 would update running statistics 10x slower than
the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') equivalent
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch xavier_normal_ equivalent
xavier_normal = nn.initializers.variance_scaling(1.0, "fan_avg", "normal")


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block: ``x_s + fc_1(relu(fc_0(relu(x))))``.

    Matches src/layers.py:8-50 including the zero-initialized second linear
    (layers.py:39) and the bias-free shortcut when sizes differ.
    """

    size_in: int
    size_out: int | None = None
    size_h: int | None = None

    @nn.compact
    def __call__(self, x):
        size_out = self.size_out if self.size_out is not None else self.size_in
        size_h = self.size_h if self.size_h is not None else min(self.size_in, size_out)

        net = nn.Dense(size_h, name="fc_0")(nn.relu(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros, name="fc_1")(
            nn.relu(net)
        )
        if self.size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


class BasicBlock(nn.Module):
    """ResNet basic block (3x3 + 3x3, BN after each). src/layers.py:54-83."""

    channels: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        if self.downsample:
            identity = nn.Conv(
                self.channels, (1, 1), strides=self.stride, use_bias=False,
                kernel_init=kaiming_out, name="down_conv",
            )(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="down_bn")(
                identity
            )
        out = nn.Conv(
            self.channels, (3, 3), strides=self.stride, padding=1, use_bias=False,
            kernel_init=kaiming_out, name="conv1",
        )(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False,
            kernel_init=kaiming_out, name="conv2",
        )(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(out)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNet bottleneck (1x1, 3x3, 1x1 with 4x expansion). src/layers.py:86-126."""

    channels: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        if self.downsample:
            identity = nn.Conv(
                self.channels * self.expansion, (1, 1), strides=self.stride,
                use_bias=False, kernel_init=kaiming_out, name="down_conv",
            )(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="down_bn")(
                identity
            )
        out = nn.Conv(self.channels, (1, 1), use_bias=False,
                      kernel_init=kaiming_out, name="conv1")(x)
        out = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(out))
        out = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=kaiming_out, name="conv2")(out)
        out = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(out))
        out = nn.Conv(self.channels * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_out, name="conv3")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn3")(out)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """From-scratch ResNet with the reference's two-stage head.

    Matches src/layers.py:129-192: 7x7/2 stem, 3x3/2 maxpool, four stages,
    global average pool, then ``Linear(512*exp, 100) -> Linear(100, n)``
    (both heads, no activation between — layers.py:188-189).
    """

    block: str  # 'basic' | 'bottleneck'
    blocks_num: Sequence[int]
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        expansion = 1 if self.block == "basic" else 4
        Blk = BasicBlock if self.block == "basic" else Bottleneck

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=kaiming_out, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_ch = 64
        for stage, (ch, n_blocks) in enumerate(zip((64, 128, 256, 512), self.blocks_num)):
            stride = 1 if stage == 0 else 2
            down = stride != 1 or in_ch != ch * expansion
            x = Blk(ch, stride=stride, downsample=down, name=f"layer{stage+1}_0")(
                x, train=train
            )
            for b in range(1, n_blocks):
                x = Blk(ch, name=f"layer{stage+1}_{b}")(x, train=train)
            in_ch = ch * expansion

        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.Dense(100, name="linear")(x)
        x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def Resnet18(num_classes=32):
    return ResNet(block="basic", blocks_num=(2, 2, 2, 2), num_classes=num_classes)


def Resnet34(num_classes=32):
    return ResNet(block="basic", blocks_num=(3, 4, 6, 3), num_classes=num_classes)


def Resnet50(num_classes=32):
    return ResNet(block="bottleneck", blocks_num=(3, 4, 6, 3), num_classes=num_classes)


def Resnet101(num_classes=32):
    return ResNet(block="bottleneck", blocks_num=(3, 4, 23, 3), num_classes=num_classes)


def Resnet152(num_classes=32):
    return ResNet(block="bottleneck", blocks_num=(3, 8, 36, 3), num_classes=num_classes)


class TactileDownConv(nn.Module):
    """Two 3x3 convs + shared BatchNorm + optional 2x2 maxpool.

    Matches src/layers.py:246-273 including the quirk that ONE BatchNorm
    instance normalizes both conv outputs (layers.py:260,267-269) — the
    scale/bias and running stats are shared between the two applications.
    """

    out_channels: int
    pooling: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_normal, bias_init=nn.initializers.zeros,
                    name="conv1")(x)
        x = nn.relu(bn(x))
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_normal, bias_init=nn.initializers.zeros,
                    name="conv2")(x)
        x = nn.relu(bn(x))
        before_pool = x
        if self.pooling:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, before_pool


class TactileUpConv(nn.Module):
    """Transpose-conv upsample, skip merge, two 3x3 convs + shared BN.

    Matches src/layers.py:276-319.
    """

    out_channels: int
    merge_mode: str = "concat"
    up_mode: str = "transpose"

    @nn.compact
    def __call__(self, from_down, from_up, train: bool = True):
        if self.up_mode == "transpose":
            from_up = nn.ConvTranspose(
                self.out_channels, (2, 2), strides=(2, 2),
                kernel_init=xavier_normal, bias_init=nn.initializers.zeros,
                name="upconv",
            )(from_up)
        else:
            b, h, w, c = from_up.shape
            from_up = jax.image.resize(from_up, (b, h * 2, w * 2, c), "bilinear")
            from_up = nn.Conv(self.out_channels, (1, 1),
                              kernel_init=xavier_normal,
                              bias_init=nn.initializers.zeros, name="upconv_1x1")(
                from_up
            )
        if self.merge_mode == "concat":
            x = jnp.concatenate([from_up, from_down], axis=-1)
        else:
            x = from_up + from_down
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_normal, bias_init=nn.initializers.zeros,
                    name="conv1")(x)
        x = nn.relu(bn(x))
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=xavier_normal, bias_init=nn.initializers.zeros,
                    name="conv2")(x)
        x = nn.relu(bn(x))
        return x


class TactileUNet(nn.Module):
    """The tactile depth estimator U-Net (registry key ``UNet``).

    Matches src/layers.py:322-450: BatchNorm down/up blocks, 1x1 final conv,
    sigmoid output in [0, 1] (layers.py:446). Input (B, H, W, 3) RGB,
    output (B, H, W, num_classes).
    """

    num_classes: int = 1
    in_channels: int = 3
    depth: int = 4
    start_filts: int = 32
    up_mode: str = "transpose"
    merge_mode: str = "concat"

    @nn.compact
    def __call__(self, x, train: bool = True):
        encoder_outs = []
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2**i)
            pooling = i < self.depth - 1
            x, before_pool = TactileDownConv(
                outs, pooling=pooling, name=f"down{i}"
            )(x, train=train)
            encoder_outs.append(before_pool)
        for i in range(self.depth - 1):
            outs = outs // 2
            before_pool = encoder_outs[-(i + 2)]
            x = TactileUpConv(
                outs, merge_mode=self.merge_mode, up_mode=self.up_mode,
                name=f"up{i}",
            )(before_pool, x, train=train)
        x = nn.Conv(self.num_classes, (1, 1),
                    kernel_init=xavier_normal, bias_init=nn.initializers.zeros,
                    name="conv_final")(x)
        return jax.nn.sigmoid(x)

"""ResNet backbone (NHWC, frozen BatchNorm) for the DETR visual stream.

Behavior spec: reference `exp/gpv/models/backbone.py` — torchvision
resnet50 with FrozenBatchNorm2d, C5 (2048ch, stride 32) output, padding mask
downsampled by nearest interpolation. Rebuilt as flax NHWC convs (XLA's
native TPU conv layout); torchvision's OIHW weights are transposed by the
checkpoint converter.

Torchvision bottleneck structure per block: conv1x1 -> BN -> ReLU ->
conv3x3(stride) -> BN -> ReLU -> conv1x1 -> BN ; add identity/downsample;
ReLU. Stride lives on the 3x3 conv (torchvision v1.5+ "ResNet B" variant).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import FrozenBatchNorm


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; output channels = 4 * planes
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Stage(nn.Module):
    """One ResNet stage (sequence of bottlenecks). Kept as a submodule so
    rematerialization can operate at STAGE granularity: per-bottleneck remat
    barely helps (the block-INPUT activations dominate memory), while
    checkpointing whole stages stores only 4 stage inputs."""
    n_blocks: int
    planes: int
    stride: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for b in range(self.n_blocks):
            x = Bottleneck(
                planes=self.planes,
                stride=self.stride if b == 0 else 1,
                downsample=(b == 0),
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"block{b}")(x)
        return x


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning {layer_name: feature} NHWC maps."""
    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50
    return_layers: Sequence[str] = ("layer4",)
    dilate_c5: bool = False
    remat: bool = False  # rematerialize whole stages under grad
    stem_s2d: bool = False  # serving: space-to-depth stem (ops/stem_s2d.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stem: 7x7/2 conv, BN, ReLU, 3x3/2 maxpool (torch pads 3 and 1).
        # stem_s2d is the exact blocked rewrite: conv1 becomes 4x4/s1 over
        # 2x2 space-to-depth input (weights via ops.stem_s2d, MXU-friendly
        # 12 input channels instead of 3).
        if self.stem_s2d:
            from ..ops.stem_s2d import space_to_depth
            x = space_to_depth(x)
            x = nn.Conv(64, (4, 4), strides=(1, 1),
                        padding=[(2, 1), (2, 1)], use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = {}
        planes = (64, 128, 256, 512)
        StageT = nn.remat(Stage) if self.remat else Stage
        for stage_i, (n_blocks, p) in enumerate(zip(self.layers, planes)):
            name = f"layer{stage_i + 1}"
            stride = 1 if stage_i == 0 else 2
            dilation = 1
            if self.dilate_c5 and stage_i == 3:
                stride, dilation = 1, 2
            x = StageT(n_blocks=n_blocks, planes=p, stride=stride,
                       dilation=dilation, dtype=self.dtype, name=name)(x)
            if name in self.return_layers:
                outs[name] = x
        return outs


def resnet50(return_layers=("layer4",), dilate_c5=False,
             dtype=jnp.float32) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), return_layers=tuple(return_layers),
                  dilate_c5=dilate_c5, dtype=dtype)

"""Audio encoder: 2D ResNet over log-filterbank spectrograms.

Capability parity with the reference's audio tower
(/root/reference/model.py:103-121): torchvision ResNet with a 1-channel
7x7/2 stem conv, ``resnet9`` = BasicBlock x [1,1,1,1] (plus resnet18/34/50
variants), fc removed, GAP to a 512-d embedding (2048-d for resnet50).

TPU-first: channels-last ``[B, F, T, 1]`` input, explicit torch-style
padding, GSPMD-global BatchNorm statistics.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from selavi_tpu.models.common import ConvBN

Dtype = Any

# name -> (block kind, blocks per stage, feature dim)
AUDIO_ARCHS = {
    "resnet9": ("basic", (1, 1, 1, 1), 512),
    "resnet18": ("basic", (2, 2, 2, 2), 512),
    "resnet34": ("basic", (3, 4, 6, 3), 512),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 2048),
}


class BasicBlock2D(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvBN(
            self.planes,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=(1, 1),
            use_relu=True,
            dtype=self.dtype,
        )(x, train)
        out = ConvBN(
            self.planes,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=(1, 1),
            use_relu=False,
            dtype=self.dtype,
        )(out, train)
        if self.stride != 1 or self.in_planes != self.planes:
            residual = ConvBN(
                self.planes,
                kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                padding=(0, 0),
                use_relu=False,
                dtype=self.dtype,
            )(x, train)
        return nn.relu(out + residual)


class Bottleneck2D(nn.Module):
    in_planes: int
    planes: int  # bottleneck width; output is planes * 4
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out_planes = self.planes * 4
        residual = x
        out = ConvBN(
            self.planes, (1, 1), (1, 1), (0, 0), True, dtype=self.dtype
        )(x, train)
        out = ConvBN(
            self.planes,
            (3, 3),
            (self.stride, self.stride),
            (1, 1),
            True,
            dtype=self.dtype,
        )(out, train)
        out = ConvBN(
            out_planes, (1, 1), (1, 1), (0, 0), False, dtype=self.dtype
        )(out, train)
        if self.stride != 1 or self.in_planes != out_planes:
            residual = ConvBN(
                out_planes,
                (1, 1),
                (self.stride, self.stride),
                (0, 0),
                False,
                dtype=self.dtype,
            )(x, train)
        return nn.relu(out + residual)


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1) with -inf padding."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


class AudioResNet(nn.Module):
    """ResNet over 1-channel spectrograms ``[B, F, T, 1]`` -> pooled features."""

    arch: str = "resnet9"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kind, stage_blocks, _ = AUDIO_ARCHS[self.arch]
        block = BasicBlock2D if kind == "basic" else Bottleneck2D
        expansion = 1 if kind == "basic" else 4

        x = ConvBN(
            64,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=(3, 3),
            dtype=self.dtype,
        )(x, train)
        x = _max_pool_3x3_s2(x)

        in_planes = 64
        for stage, (planes, nblocks) in enumerate(
            zip((64, 128, 256, 512), stage_blocks)
        ):
            for b in range(nblocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block(in_planes, planes, stride, dtype=self.dtype)(
                    x, train
                )
                in_planes = planes * expansion

        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)

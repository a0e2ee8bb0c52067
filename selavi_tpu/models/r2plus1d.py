"""R(2+1)D-18 video encoder, built TPU-first in flax linen.

Capability parity with the reference's torchvision ``r2plus1d_18`` tower
(/root/reference/model.py:93-100): a (2+1)D-factorized 3D CNN — each 3D conv
is a spatial (1,3,3) conv followed by a temporal (3,1,1) conv with an
intermediate "midplanes" width chosen so the parameter count matches a full
3D conv. Four stages of two basic blocks, global average pool to a 512-d
embedding.

TPU-first design notes (not a port):

* layout is channels-last ``[B, T, H, W, C]`` — the native XLA TPU conv
  layout, so every conv lands on the MXU without transposes;
* explicit torch-style floor padding keeps stage shapes identical to the
  reference so downstream head/BN shapes agree;
* BatchNorm batch statistics are global under jit with a sharded batch
  (GSPMD) == reference SyncBN semantics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from selavi_tpu.models.common import ConvBN, conv_kaiming_init

Dtype = Any

VIDEO_FEATURE_DIMS = {
    "r2plus1d_18": 512,
    "s3d": 1024,
    "s3dg": 1024,
    "r3d_50": 2048,
}


def _midplanes(in_planes: int, out_planes: int) -> int:
    """(2+1)D intermediate width: parameter-count-matched factorization."""
    return (in_planes * out_planes * 3 * 3 * 3) // (
        in_planes * 3 * 3 + 3 * out_planes
    )


class Conv2Plus1D(nn.Module):
    """Factorized 3D conv: (1,3,3) spatial -> BN -> ReLU -> (3,1,1) temporal."""

    in_planes: int
    out_planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        mid = _midplanes(self.in_planes, self.out_planes)
        s = self.stride
        x = ConvBN(
            mid,
            kernel_size=(1, 3, 3),
            strides=(1, s, s),
            padding=(0, 1, 1),
            use_relu=True,
            dtype=self.dtype,
        )(x, train)
        x = nn.Conv(
            self.out_planes,
            kernel_size=(3, 1, 1),
            strides=(s, 1, 1),
            padding=[(1, 1), (0, 0), (0, 0)],
            use_bias=False,
            kernel_init=conv_kaiming_init,
            dtype=self.dtype,
        )(x)
        return x


class BasicBlock2Plus1D(nn.Module):
    """Residual basic block with (2+1)D convs (two per block)."""

    in_planes: int
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x

        out = Conv2Plus1D(
            self.in_planes, self.planes, self.stride, dtype=self.dtype
        )(x, train)
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(out)
        out = nn.relu(out)

        out = Conv2Plus1D(self.planes, self.planes, 1, dtype=self.dtype)(
            out, train
        )
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(out)

        if self.stride != 1 or self.in_planes != self.planes:
            residual = ConvBN(
                self.planes,
                kernel_size=(1, 1, 1),
                strides=(self.stride,) * 3,
                padding=(0, 0, 0),
                use_relu=False,
                dtype=self.dtype,
            )(x, train)

        return nn.relu(out + residual)


class R2Plus1D18(nn.Module):
    """R(2+1)D-18: stem + 4 stages x 2 blocks + GAP -> 512-d features.

    Input: video ``[B, T, H, W, 3]`` float (already normalized).
    Output: ``[B, 512]`` pooled features.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_map: bool = False):
        # R(2+1)D stem: spatial 7x7/2 conv to 45 mid-channels, then temporal
        # 3x1x1 conv to 64 (torchvision R2Plus1dStem equivalent).
        x = ConvBN(
            45,
            kernel_size=(1, 7, 7),
            strides=(1, 2, 2),
            padding=(0, 3, 3),
            dtype=self.dtype,
        )(x, train)
        x = ConvBN(
            64,
            kernel_size=(3, 1, 1),
            strides=(1, 1, 1),
            padding=(1, 0, 0),
            dtype=self.dtype,
        )(x, train)

        plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for in_planes, planes, stride in plan:
            x = BasicBlock2Plus1D(
                in_planes, planes, stride, dtype=self.dtype
            )(x, train)
            x = BasicBlock2Plus1D(planes, planes, 1, dtype=self.dtype)(
                x, train
            )

        if return_map:
            # pre-GAP feature map [B, t, h, w, 512] (retrieval path,
            # reference retrieval_utils.py:80-98 truncates before avgpool)
            return x.astype(jnp.float32)
        # Global average pool over (T, H, W) -> [B, 512].
        x = jnp.mean(x, axis=(1, 2, 3))
        return x.astype(jnp.float32)

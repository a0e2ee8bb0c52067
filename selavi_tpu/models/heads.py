"""Classification heads: the reference's per-name ``mlp_v{i}``/``mlp_a{i}``
modules (/root/reference/model.py:62-90,201-219) re-designed as a single
vmapped parameter stack ``[H, ...]`` — one fused batched matmul per layer for
all heads instead of H small sequential matmuls. This keeps the MXU busy and
makes "apply every head to the full [N, 512] feature matrix" (the
self-labeling path, /root/reference/src/sk_utils.py:307-312) a single einsum.

Head layout conversion helpers are in selavi_tpu.train.checkpoint.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from selavi_tpu.models.common import (
    dense_torch_bias_init,
    dense_torch_kernel_init,
)

Dtype = Any


class MLPHead(nn.Module):
    """One projection head.

    ``use_mlp=True``:   Dropout -> Dense(hidden, no bias) -> BN -> ReLU ->
                        Dropout -> Dense(num_classes)
    ``use_mlp=False``:  Dense(num_classes)  (plain linear classifier)
    ``n_hidden=None``:  Dropout -> Dense(num_classes)  (linear-with-dropout
                        variant of the reference MLPv2)
    """

    num_classes: int
    n_hidden: Optional[int] = 512
    dropout_rate: float = 0.3
    use_mlp: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        n_input = x.shape[-1]
        if not self.use_mlp:
            return nn.Dense(
                self.num_classes,
                kernel_init=dense_torch_kernel_init,
                bias_init=dense_torch_bias_init(n_input),
                dtype=self.dtype,
                name="proj",
            )(x)

        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.n_hidden is not None:
            x = nn.Dense(
                self.n_hidden,
                use_bias=False,
                kernel_init=dense_torch_kernel_init,
                dtype=self.dtype,
                name="hidden",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=dense_torch_kernel_init,
            bias_init=dense_torch_bias_init(
                self.n_hidden if self.n_hidden is not None else n_input
            ),
            dtype=self.dtype,
            name="proj",
        )(x)
        return x


class HeadStack(nn.Module):
    """``headcount`` independent heads as one vmapped module.

    Input features ``[B, D]`` -> logits ``[H, B, K]``. Parameters and batch
    stats carry a leading head axis; dropout RNGs are split per head so the
    heads stay decorrelated (the reference trains them as independent
    modules).
    """

    headcount: int
    num_classes: int
    n_hidden: Optional[int] = 512
    dropout_rate: float = 0.3
    use_mlp: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        vmapped = nn.vmap(
            MLPHead,
            in_axes=None,
            out_axes=0,
            axis_size=self.headcount,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
        )
        return vmapped(
            num_classes=self.num_classes,
            n_hidden=self.n_hidden,
            dropout_rate=self.dropout_rate,
            use_mlp=self.use_mlp,
            dtype=self.dtype,
            name="heads",
        )(x, train)

"""Shared initializers / layer helpers for the selavi-tpu model zoo.

TPU-first conventions used throughout the model code:

* channels-last layouts everywhere (video ``[B, T, H, W, C]``, audio
  spectrograms ``[B, F, T, 1]``) so XLA can tile convolutions directly
  onto the MXU without layout transposes;
* explicit symmetric padding tuples (torch-style floor arithmetic) instead
  of "SAME" so downsampling shapes match the reference towers exactly
  (reference: /root/reference/model.py:93-121 builds torchvision towers);
* BatchNorm is plain flax BatchNorm — under jit with the batch sharded over
  the mesh the batch statistics are *global* (GSPMD inserts the collectives),
  which is the TPU-native equivalent of the reference's SyncBatchNorm
  (/root/reference/main.py:117-123).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# He / kaiming-normal with fan_out, matching the reference's from-scratch conv
# init (/root/reference/model.py:51-59).
conv_kaiming_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)

# torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
# kernel and bias. Used so head logit scales match the reference at init.
dense_torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def dense_torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


class ConvBN(nn.Module):
    """Conv -> BatchNorm [-> ReLU] with torch-style explicit padding."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[int]
    use_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = [(p, p) for p in self.padding]
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            use_bias=False,
            kernel_init=conv_kaiming_init,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x

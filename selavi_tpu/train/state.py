"""Training state containers.

Device state (params / batch_stats / opt_state / step) is a flax struct
pytree living replicated on the mesh. SeLaVi-specific host state — the
``selflabels [N, H]`` matrix, cached Gaussian marginals, SK schedule
position — travels alongside and is checkpointed with the device state
(reference keeps all of it in one ``checkpoint.pth.tar``,
/root/reference/main.py:222-242).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from selavi_tpu.selflabel.marginals import MarginalState


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    video_shape,
    audio_shape,
) -> TrainState:
    import jax.numpy as jnp

    video = jnp.zeros(video_shape, jnp.float32)
    audio = jnp.zeros(audio_shape, jnp.float32)
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng},
        video,
        audio,
        train=False,
    )
    variables = (
        variables.unfreeze()
        if isinstance(variables, FrozenDict)
        else dict(variables)
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


@dataclasses.dataclass
class SelfLabelState:
    """Host-side SeLaVi training state (checkpointed)."""

    selflabels: np.ndarray  # [N, H] int32
    marginals: MarginalState
    sk_counter: int = 0
    epoch: int = 0

    @classmethod
    def init(cls, n: int, headcount: int) -> "SelfLabelState":
        return cls(
            selflabels=np.zeros((n, headcount), np.int32),
            marginals=MarginalState(),
        )

"""Optimizer and LR schedule.

Reference: SGD(momentum=0.9, weight_decay=args.wd) over *all* parameters —
including BN scales and biases (/root/reference/main.py:132-137) — with
``GradualWarmupScheduler(multiplier=world_size, total_epoch=warmup_epochs)``
stepped per epoch (/root/reference/main.py:138-144,219-220;
/root/reference/src/warmup_scheduler.py:12-71).

optax equivalents with torch-exact update order: decoupled? No — torch
couples weight decay into the gradient *before* the momentum buffer
(d_p = g + wd * p; buf = mu * buf + d_p; p -= lr * buf), which is
``add_decayed_weights -> trace -> scale by lr`` in optax.
"""

from __future__ import annotations

import optax


def warmup_lr(
    epoch: int,
    base_lr: float,
    multiplier: float,
    warmup_epochs: int,
    use_warmup: bool = True,
) -> float:
    """LR used during ``epoch`` (scheduler value after ``epoch`` steps)."""
    if not use_warmup or warmup_epochs <= 0:
        return base_lr
    e = min(epoch, warmup_epochs)
    return base_lr * (1.0 + (multiplier - 1.0) * e / warmup_epochs)


def make_optimizer(
    base_lr: float,
    weight_decay: float,
    momentum: float = 0.9,
    multiplier: float = 1.0,
    warmup_epochs: int = 10,
    use_warmup: bool = True,
    batches_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """SGD+momentum with per-epoch warmup LR, as a step-indexed schedule."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // batches_per_epoch
        if not use_warmup or warmup_epochs <= 0:
            return jnp.asarray(base_lr, jnp.float32)
        e = jnp.minimum(epoch, warmup_epochs).astype(jnp.float32)
        return base_lr * (1.0 + (multiplier - 1.0) * e / warmup_epochs)

    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )

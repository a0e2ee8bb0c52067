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


# ---------------------------------------------------------------------------
# Generic GradualWarmup chaining (reference warmup_scheduler.py:25-80).
#
# The reference's GradualWarmupScheduler accepts ANY torch scheduler as
# ``after_scheduler`` (including ReduceLROnPlateau via a dedicated step
# path). The two configurations the reference actually *uses* are
# reproduced as the pure functions above (warmup_lr) and in
# eval/finetune.py (finetune_lr_factor); the classes below restore the
# generic surface in JAX idiom: schedulers are pure functions / explicit
# state, not objects mutating an optimizer.
# ---------------------------------------------------------------------------

import dataclasses as _dataclasses
from typing import Callable, NamedTuple, Optional


@_dataclasses.dataclass(frozen=True)
class GradualWarmupChain:
    """Epoch-indexed LR: gradual warmup, then an arbitrary after-schedule.

    Mirrors /root/reference/src/warmup_scheduler.py:33-46: during epochs
    ``<= total_epoch`` the LR ramps (from 0 when ``multiplier == 1``,
    else from ``base_lr`` toward ``base_lr * multiplier``); afterwards the
    after-schedule runs on the *shifted* epoch with its base scaled to
    ``base_lr * multiplier`` (reference :36-38 rescales
    ``after_scheduler.base_lrs`` once warmup finishes).

    ``after(shifted_epoch) -> factor`` returns a multiplier on
    ``base_lr * multiplier`` (e.g. MultiStepLR: ``gamma ** k``).
    """

    base_lr: float
    multiplier: float = 1.0
    total_epoch: int = 10
    after: Optional[Callable[[int], float]] = None

    def __post_init__(self):
        if self.multiplier < 1.0:
            raise ValueError("multiplier should be >= 1.")

    def lr(self, epoch: int) -> float:
        if epoch > self.total_epoch:
            target = self.base_lr * self.multiplier
            if self.after is not None:
                return target * self.after(epoch - self.total_epoch)
            return target
        if self.multiplier == 1.0:
            return self.base_lr * (float(epoch) / self.total_epoch)
        return self.base_lr * (
            (self.multiplier - 1.0) * epoch / self.total_epoch + 1.0
        )


def multistep_factor(milestones, gamma: float) -> Callable[[int], float]:
    """torch MultiStepLR as a pure factor function (for ``after=``)."""

    ms = sorted(milestones)

    def factor(epoch: int) -> float:
        return gamma ** sum(1 for m in ms if m <= epoch)

    return factor


class PlateauState(NamedTuple):
    """Explicit state for ReduceLROnPlateau (torch mutates this in-place)."""

    best: float
    num_bad_epochs: int
    cooldown_counter: int
    factor: float  # accumulated LR factor (product of gamma reductions)


@_dataclasses.dataclass(frozen=True)
class ReduceOnPlateau:
    """Functional ReduceLROnPlateau with torch-default semantics.

    Matches torch.optim.lr_scheduler.ReduceLROnPlateau (the
    ``after_scheduler`` the reference's docstring names,
    /root/reference/src/warmup_scheduler.py:21,47-59): ``mode`` min/max,
    relative/absolute ``threshold``, ``patience`` bad epochs before a
    ``gamma`` reduction, ``cooldown`` epochs after a reduction, floor at
    ``min_factor`` (torch's min_lr expressed as a factor).
    """

    mode: str = "min"
    gamma: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    min_factor: float = 0.0

    def init(self) -> PlateauState:
        best = float("inf") if self.mode == "min" else float("-inf")
        return PlateauState(best, 0, 0, 1.0)

    def _is_better(self, metric: float, best: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < best * (1.0 - self.threshold)
            return metric < best - self.threshold
        if self.threshold_mode == "rel":
            return metric > best * (1.0 + self.threshold)
        return metric > best + self.threshold

    def step(self, state: PlateauState, metric: float) -> PlateauState:
        best, bad, cool, factor = state
        if self._is_better(metric, best):
            best, bad = metric, 0
        else:
            bad += 1
        if cool > 0:
            cool -= 1
            bad = 0  # torch ignores bad epochs during cooldown
        if bad > self.patience:
            factor = max(factor * self.gamma, self.min_factor)
            cool = self.cooldown
            bad = 0
        return PlateauState(best, bad, cool, factor)


@_dataclasses.dataclass(frozen=True)
class GradualWarmupPlateau:
    """GradualWarmup chained into ReduceLROnPlateau.

    Mirrors the reference's dedicated plateau path
    (/root/reference/src/warmup_scheduler.py:47-59): stepped at *end* of
    epoch with the epoch's metric; epoch 0 is treated as 1 (:50); during
    ``epoch <= total_epoch`` the warmup formula applies (the multiplier
    form, even at multiplier == 1 — reference :52 uses only that branch);
    afterwards the plateau controller sees the shifted epoch sequence.
    """

    base_lr: float
    multiplier: float = 1.0
    total_epoch: int = 10
    plateau: ReduceOnPlateau = ReduceOnPlateau()

    def init(self) -> PlateauState:
        return self.plateau.init()

    def step(
        self, state: PlateauState, metric: float, epoch: int
    ) -> tuple[PlateauState, float]:
        """Returns (new_state, lr to use for the NEXT epoch)."""
        epoch = epoch if epoch != 0 else 1
        if epoch <= self.total_epoch:
            lr = self.base_lr * (
                (self.multiplier - 1.0) * epoch / self.total_epoch + 1.0
            )
            return state, lr
        state = self.plateau.step(state, metric)
        return state, self.base_lr * self.multiplier * state.factor

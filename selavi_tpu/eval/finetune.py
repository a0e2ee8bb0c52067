"""Action-recognition finetuning (UCF-101 / HMDB-51).

Capability parity with /root/reference/finetune_video.py:

* ``FinetuneModel``: pretrained video tower + optional L2-norm / BN /
  Dropout(0.7) + orthogonally-initialized linear classifier (:44-92);
* two LR param groups — classifier at ``head_lr``/``weight_decay``, tower at
  ``base_lr``/``wd_base`` (:149-173) — via optax.multi_transform;
* SGD(momentum)/Adam + MultiStepLR(milestones, gamma) chained after a
  GradualWarmup x8 over ``lr_warmup_epochs`` (:229-268 and
  src/warmup_scheduler.py:32-44): the exact epoch->factor curve is
  reproduced in ``finetune_lr_factor``;
* train on ``train_clips_per_video`` random clips; evaluate with
  ``val_clips_per_video x num_spatial_crops`` deterministic views,
  mean-aggregated per video before top-k (:421-500, utils.py:354-374);
* 3-fold protocol with best-epoch video acc@1/acc@5 per fold (:616-650).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from selavi_tpu.models.r2plus1d import R2Plus1D18
from selavi_tpu.ops.preprocess import augment_video_batch
from selavi_tpu.utils.meters import (
    AverageMeter,
    aggregate_video_accuracy,
    topk_accuracy,
)

logger = logging.getLogger(__name__)

NUM_CLASSES = {"hmdb51": 51, "ucf101": 101}


class FinetuneModel(nn.Module):
    """Video tower + classifier head (reference Finetune_Model)."""

    num_classes: int
    use_dropout: bool = False
    use_bn: bool = False
    use_l2_norm: bool = False
    dropout: float = 0.7
    dtype: any = jnp.float32
    midplanes_mode: str = "parity"

    @nn.compact
    def __call__(self, video, train: bool = True):
        x = R2Plus1D18(dtype=self.dtype,
                       midplanes_mode=self.midplanes_mode,
                       name="base")(video, train=train)
        if self.use_l2_norm:
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="final_bn",
            )(x)
        if self.use_dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.orthogonal(1.0),
            bias_init=nn.initializers.zeros,
            name="classifier",
        )(x)
        return x


def finetune_lr_factor(
    epoch: int,
    warmup_epochs: int,
    milestones: tuple[int, ...],
    gamma: float,
    multiplier: float = 8.0,
    use_scheduler: bool = True,
) -> float:
    """LR multiplier at ``epoch`` relative to the group base LR
    (GradualWarmup x multiplier -> MultiStepLR on shifted milestones)."""
    if not use_scheduler:
        return 1.0
    if warmup_epochs > 0:
        if epoch <= warmup_epochs:
            return 1.0 + (multiplier - 1.0) * epoch / warmup_epochs
        shifted = [m - warmup_epochs for m in milestones]
        k = sum(1 for m in shifted if m <= epoch - warmup_epochs)
        return multiplier * (gamma ** k)
    k = sum(1 for m in milestones if m <= epoch)
    return gamma ** k


@dataclasses.dataclass
class FinetuneConfig:
    num_classes: int = 101
    head_lr: float = 0.0025
    base_lr: float = 0.00025
    weight_decay: float = 0.005
    wd_base: float = 5e-3
    momentum: float = 0.9
    optim_name: str = "sgd"
    feature_extract: bool = False
    use_dropout: bool = False
    use_bn: bool = False
    use_l2_norm: bool = False
    lr_warmup_epochs: int = 2
    lr_milestones: tuple[int, ...] = (6, 10)
    lr_gamma: float = 0.05
    use_scheduler: bool = True
    epochs: int = 12


def make_finetune_optimizer(
    cfg: FinetuneConfig, batches_per_epoch: int
) -> optax.GradientTransformation:
    """Two param groups by top-level name: 'classifier' vs everything else."""

    # host-side python is not allowed inside a jitted schedule; build the
    # per-epoch factor table once and index it.
    table = jnp.asarray(
        [
            finetune_lr_factor(
                int(e),
                cfg.lr_warmup_epochs,
                cfg.lr_milestones,
                cfg.lr_gamma,
                use_scheduler=cfg.use_scheduler,
            )
            for e in range(cfg.epochs + 1)
        ],
        jnp.float32,
    )

    def factor(step):
        epoch = step // max(batches_per_epoch, 1)
        return table[jnp.clip(epoch, 0, cfg.epochs)]

    def group_tx(lr, wd):
        if cfg.optim_name == "adam":
            # coupled L2 (torch.optim.Adam, reference
            # finetune_video.py:238-243): wd*param joins the RAW gradient
            # before the moment estimates — decayed-weights-after-Adam
            # would be AdamW, a different regularizer
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.scale_by_adam(),
                optax.scale_by_schedule(lambda s: -lr * factor(s)),
            )
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=cfg.momentum),
            optax.scale_by_schedule(lambda s: -lr * factor(s)),
        )

    def label_fn(params):
        def lab(path, _):
            key = getattr(path[0], "key", "") if path else ""
            if key == "classifier":
                return "head"
            if key == "final_bn":
                # the reference's param groups cover only classifier.* and
                # base.* (finetune_video.py:148-172): final_bn's affine
                # params never enter the optimizer, i.e. stay frozen
                return "frozen"
            return "frozen" if cfg.feature_extract else "base"

        return jax.tree.map_with_path(lab, params)

    return optax.multi_transform(
        {
            "head": group_tx(cfg.head_lr, cfg.weight_decay),
            "base": group_tx(cfg.base_lr, cfg.wd_base),
            "frozen": optax.set_to_zero(),
        },
        label_fn,
    )


def make_finetune_steps(model, tx, compute_dtype=jnp.float32):
    @jax.jit
    def train_step(params, batch_stats, opt_state, video_u8, labels, rng):
        video = augment_video_batch(
            video_u8, rng, flip=True, dtype=compute_dtype
        )

        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                video,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss, logits

    @jax.jit
    def eval_step(params, batch_stats, video_u8, labels):
        video = (
            (video_u8.astype(jnp.float32) / 255.0 - 0.45) / 0.225
        ).astype(compute_dtype)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video,
            train=False,
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()
        return logits, loss

    return train_step, eval_step


def evaluate(
    eval_step: Callable,
    params,
    batch_stats,
    loader,
    writer=None,
    epoch: int = 0,
    ds: str = "hmdb51",
) -> tuple[float, float, float]:
    """Clip-level loss + video-level acc@1/acc@5
    (reference finetune_video.py:421-500).

    Multi-host aware: batches may be globally sharded (pod-sharded test
    loader); fields are gathered via ``fetch_to_host`` and the video
    aggregation drops rank-padding duplicates (identified by the batch
    ``index``), so video accuracies are identical for any process count."""
    from selavi_tpu.parallel.mesh import fetch_to_host

    losses, top1 = AverageMeter(), AverageMeter()
    softmaxes: dict = {}
    labels_by_vid: dict = {}
    seen: set = set()
    for batch in loader:
        labels = fetch_to_host(batch["label"])
        logits, loss = eval_step(
            params, batch_stats, batch["video"], jnp.asarray(labels)
        )
        logits = fetch_to_host(logits)
        losses.update(float(loss), len(logits))
        acc1, _ = topk_accuracy(logits, labels, (1, 5))
        top1.update(acc1, len(logits))
        vids = fetch_to_host(batch["vid_idx"])
        idxs = (
            fetch_to_host(batch["index"]) if "index" in batch else None
        )
        for j, vid in enumerate(vids):
            if idxs is not None:
                if int(idxs[j]) in seen:
                    continue
                seen.add(int(idxs[j]))
            softmaxes.setdefault(int(vid), []).append(logits[j])
            labels_by_vid[int(vid)] = int(labels[j])
    vid_acc1, vid_acc5 = aggregate_video_accuracy(
        softmaxes, labels_by_vid, topk=(1, 5)
    )
    logger.info(
        "Test: Loss %.4f ClipAcc@1 %.3f VidAcc@1 %.3f",
        losses.avg,
        top1.avg,
        vid_acc1,
    )
    if writer:
        writer.add_scalar(f"{ds}/val/vid_acc1/epoch", vid_acc1, epoch)
        writer.add_scalar(f"{ds}/val/vid_acc5/epoch", vid_acc5, epoch)
    return losses.avg, float(vid_acc1), float(vid_acc5)

"""Finetune orchestration: pretrained-tower loading, epoch loop, folds.

Mirrors /root/reference/finetune_video.py:95-330,616-650 as a reusable
runner (CLI shim at repo root: finetune_video.py).
"""

from __future__ import annotations

import logging
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from selavi_tpu.data.loader import DataLoader, device_prefetch
from selavi_tpu.eval.finetune import (
    NUM_CLASSES,
    FinetuneConfig,
    FinetuneModel,
    evaluate,
    make_finetune_optimizer,
    make_finetune_steps,
)
from selavi_tpu.parallel.mesh import data_sharding, make_mesh
from selavi_tpu.utils.meters import AverageMeter, topk_accuracy

logger = logging.getLogger(__name__)


def load_pretrained_tower(ft_variables: dict, ckpt_path: str) -> dict:
    """Copy the SeLaVi checkpoint's video tower (params + batch stats,
    ``video_network/*``) into a FinetuneModel variable tree (``base/*``).

    The reference's load_model_parameters name-matching (utils.py:264-274)
    becomes a subtree graft: structures are identical by construction.
    """
    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    blob = serialization.msgpack_restore(payload["device"])
    out = jax.device_get(ft_variables)
    out["params"]["base"] = blob["params"]["video_network"]
    out["batch_stats"]["base"] = blob["batch_stats"]["video_network"]
    return out


def run_fold(
    args, fold: int, writer=None, dataset=None, dataset_test=None
) -> tuple[float, float, int]:
    """Train + evaluate one fold; returns (best vid acc@1, acc@5, epoch)."""
    if (
        args.dataset not in NUM_CLASSES
        and args.dataset != "synthetic"  # class count set below
        and not hasattr(args, "num_classes")
    ):
        # reference finetune_video.py:137 KeyErrors here too — a silent
        # 101-class default would train garbage on e.g. vggsound labels
        raise ValueError(
            f"finetune class count unknown for dataset "
            f"'{args.dataset}' (known: {sorted(NUM_CLASSES)}); "
            "pass a dataset with a defined class count"
        )
    cfg = FinetuneConfig(
        num_classes=NUM_CLASSES.get(
            args.dataset, getattr(args, "num_classes", 101)
        ),
        head_lr=args.head_lr,
        base_lr=args.base_lr,
        weight_decay=args.weight_decay,
        wd_base=args.wd_base,
        momentum=args.momentum,
        optim_name=args.optim_name,
        feature_extract=args.feature_extract,
        use_dropout=args.use_dropout,
        use_bn=args.use_bn,
        use_l2_norm=args.use_l2_norm,
        lr_warmup_epochs=args.lr_warmup_epochs,
        lr_milestones=tuple(
            int(m) for m in str(args.lr_milestones).split(",")
        ),
        lr_gamma=args.lr_gamma,
        use_scheduler=args.use_scheduler,
        epochs=args.epochs,
    )

    if dataset is None and args.dataset == "synthetic":
        from selavi_tpu.data.synthetic import SyntheticAVDataset

        n = getattr(args, "num_data_samples", None) or 32
        dataset = SyntheticAVDataset(
            num_samples=n, num_frames=args.clip_len, crop_size=64,
            num_classes=4, mode="train",
        )
        cfg.num_classes = 4
        dataset_test = SyntheticAVDataset(
            num_samples=n, num_frames=args.clip_len, crop_size=64,
            num_classes=4, mode="test", seed=1,
        )
    elif dataset is None:
        from selavi_tpu.data.dataset import AVideoDataset

        crop = 128 if args.augtype == 1 else 224
        dataset = AVideoDataset(
            ds_name=args.dataset, root_dir=args.root_dir, mode="train",
            num_frames=args.clip_len, sample_rate=args.steps_bet_clips,
            num_train_clips=args.train_clips_per_video,
            train_crop_size=crop, fold=fold, colorjitter=args.colorjitter,
            decode_audio=False, path_to_data_dir=args.data_path,
        )
        dataset_test = AVideoDataset(
            ds_name=args.dataset, root_dir=args.root_dir, mode="test",
            num_frames=args.clip_len, sample_rate=args.steps_bet_clips,
            test_crop_size=crop, num_spatial_crops=args.num_spatial_crops,
            num_ensemble_views=args.val_clips_per_video, fold=fold,
            decode_audio=False, path_to_data_dir=args.data_path,
        )

    mesh = make_mesh()
    dsh = data_sharding(mesh)
    model = FinetuneModel(
        num_classes=cfg.num_classes,
        use_dropout=cfg.use_dropout,
        use_bn=cfg.use_bn,
        use_l2_norm=cfg.use_l2_norm,
        midplanes_mode="aligned"
        if getattr(args, "tpu_aligned_midplanes", False) else "parity",
        dtype=jnp.bfloat16
        if getattr(args, "compute_dtype", "float32") == "bfloat16"
        else jnp.float32,
    )

    # pod-sharded loaders (--batch_size is per process): strided subsets
    # per process, globally-assembled device batches, GSPMD grad psum —
    # the reference's DistributedSampler + DDP (finetune_video.py:616-650)
    n_proc = jax.process_count()
    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True, drop_last=True,
        num_workers=args.workers, seed=0,
        rank=jax.process_index(), world_size=n_proc,
    )
    loader_test = DataLoader(
        dataset_test, batch_size=args.batch_size, shuffle=False,
        drop_last=False, num_workers=args.workers,
        rank=jax.process_index(), world_size=n_proc,
    )
    gmesh = mesh if n_proc > 1 else None

    example = dataset.get_example(0, np.random.default_rng(0))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2,) + example["video"].shape, jnp.float32),
        train=False,
    )
    variables = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    if args.weights_path and args.weights_path != "None":
        logger.info("loading pretrained tower from %s", args.weights_path)
        variables = load_pretrained_tower(variables, args.weights_path)

    tx = make_finetune_optimizer(cfg, batches_per_epoch=len(loader))
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    train_step, eval_step = make_finetune_steps(
        model, tx, compute_dtype=model.dtype
    )

    # reference finetune checkpointing (utils.py:191-216): per-epoch
    # checkpoint + periodic archives under output_dir
    ckpt_dir = None
    start_epoch = 0
    if getattr(args, "output_dir", None):
        import os

        ckpt_dir = os.path.join(args.output_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        resume_path = os.path.join(ckpt_dir, f"checkpoint_fold{fold}.pkl")
        if getattr(args, "resume", "") and os.path.isfile(resume_path):
            with open(resume_path, "rb") as f:
                blob = pickle.load(f)
            params = serialization.from_bytes(
                jax.device_get(params), blob["params"]
            )
            batch_stats = serialization.from_bytes(
                jax.device_get(batch_stats), blob["batch_stats"]
            )
            opt_state = serialization.from_bytes(
                jax.device_get(opt_state), blob["opt_state"]
            )
            start_epoch = blob["epoch"]
            logger.info("resumed finetune fold %d at epoch %d", fold,
                        start_epoch)

    if n_proc > 1:
        # commit model/opt state replicated on the global mesh so the
        # jitted steps see one consistent participant set (after resume,
        # which restores host trees)
        from selavi_tpu.parallel.mesh import replicated_sharding

        rep = replicated_sharding(mesh)
        params = jax.device_put(params, rep)
        batch_stats = jax.device_put(batch_stats, rep)
        opt_state = jax.device_put(opt_state, rep)

    if getattr(args, "test_only", False):
        # evaluation-only mode (reference finetune_video.py:283-292)
        _, vid1, vid5 = evaluate(
            eval_step, params, batch_stats,
            device_prefetch(iter(loader_test), sharding=dsh, mesh=gmesh),
            writer=writer, epoch=start_epoch, ds=args.dataset,
        )
        return vid1, vid5, start_epoch

    best1, best5, best_epoch = -1.0, -1.0, 0
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        losses, top1 = AverageMeter(), AverageMeter()
        for it, batch in enumerate(
            device_prefetch(iter(loader), sharding=dsh, mesh=gmesh)
        ):
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state, loss, logits = train_step(
                params, batch_stats, opt_state,
                batch["video"], jnp.asarray(batch["label"]), sub,
            )
            # fetch loss/accuracy only at the logging cadence: a float()
            # per step would serialize host<->device dispatch every
            # iteration (same hygiene as the pretrain loop, train/loop.py)
            if it % 50 == 0:
                from selavi_tpu.parallel.mesh import fetch_to_host

                log_labels = fetch_to_host(batch["label"])
                losses.update(float(loss), len(log_labels))
                acc1, _ = topk_accuracy(
                    fetch_to_host(logits), log_labels, (1, 5)
                )
                top1.update(acc1, len(log_labels))
                logger.info(
                    "Epoch[%d] Iter %d/%d Loss %.4f (%.4f) Prec %.3f",
                    epoch, it, len(loader), losses.val, losses.avg, top1.avg,
                )
        _, vid1, vid5 = evaluate(
            eval_step, params, batch_stats,
            device_prefetch(iter(loader_test), sharding=dsh, mesh=gmesh),
            writer=writer, epoch=epoch, ds=args.dataset,
        )
        if vid1 > best1:
            best1, best5, best_epoch = vid1, vid5, epoch
        if ckpt_dir is not None and jax.process_index() == 0:
            import os

            blob = {
                "params": serialization.to_bytes(jax.device_get(params)),
                "batch_stats": serialization.to_bytes(
                    jax.device_get(batch_stats)
                ),
                "opt_state": serialization.to_bytes(
                    jax.device_get(opt_state)
                ),
                "epoch": epoch + 1,
            }
            path = os.path.join(ckpt_dir, f"checkpoint_fold{fold}.pkl")
            with open(path, "wb") as f:
                pickle.dump(blob, f)
    return best1, best5, best_epoch


def run_folds(args, writer=None, **dataset_kw) -> dict:
    folds = [int(f) for f in str(args.fold).split(",")]
    accs1, accs5, epochs = [], [], []
    for fold in folds:
        a1, a5, be = run_fold(args, fold, writer=writer, **dataset_kw)
        accs1.append(a1)
        accs5.append(a5)
        epochs.append(be)
        logger.info("fold %d: vid acc@1 %.3f acc@5 %.3f", fold, a1, a5)
    result = {
        "folds": folds,
        "acc1": accs1,
        "acc5": accs5,
        "avg_acc1": float(np.mean(accs1)),
        "avg_acc5": float(np.mean(accs5)),
        "best_epochs": epochs,
    }
    logger.info(
        "%d-Fold (%s): Vid Acc@1 %.3f, Vid Acc@5 %.3f",
        len(folds), args.dataset, result["avg_acc1"], result["avg_acc5"],
    )
    return result

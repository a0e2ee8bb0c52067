"""The pretraining loop: SeLaVi end-to-end on a TPU mesh.

Mirrors /root/reference/main.py:49-345 (setup -> BN warmup -> epoch loop
with scheduled Sinkhorn-Knopp re-clustering -> checkpoint each epoch), as a
reusable Trainer so the CLI, tests, and the multichip dryrun share one code
path.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.data.loader import (
    DataLoader,
    coalesced_device_batches,
    decode_wire_batches,
    device_prefetch,
)
from selavi_tpu.models import load_model
from selavi_tpu.models.resnet_audio import AUDIO_ARCHS
from selavi_tpu.parallel.dist import memory_pressure, signal_received
from selavi_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
)
from selavi_tpu.selflabel.engine import SKConfig, cluster
from selavi_tpu.selflabel.schedule import (
    fast_forward_schedule,
    make_sk_schedule,
)
from selavi_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from selavi_tpu.train.optim import make_optimizer
from selavi_tpu.train.state import (
    SelfLabelState,
    TrainState,
    create_train_state,
)
from selavi_tpu.train.step import (
    make_bn_warmup_step,
    make_encode_fn,
    make_head_logits_fn,
    make_train_step,
)
from selavi_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, args, dataset, writer=None):
        self.args = args
        self.dataset = dataset
        self.writer = writer

        self.mesh = make_mesh(model_axis=getattr(args, "model_axis", 1))
        self.n_devices = self.mesh.devices.size
        self.data_sharding = data_sharding(self.mesh)
        self.replicated = replicated_sharding(self.mesh)

        compute_dtype = (
            jnp.bfloat16
            if getattr(args, "compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.model = load_model(
            vid_base_arch=args.vid_base_arch,
            aud_base_arch=args.aud_base_arch,
            use_mlp=args.use_mlp,
            num_classes=args.mlp_dim,
            norm_feat=False,
            headcount=args.headcount,
            dtype=compute_dtype,
            midplanes_mode="aligned"
            if getattr(args, "tpu_aligned_midplanes", False)
            else "parity",
        )

        n_proc = jax.process_count()
        self.loader = DataLoader(
            dataset,
            # per-process batch; global batch = bs/chip * all chips
            batch_size=args.batch_size * self.n_devices // n_proc,
            shuffle=True,
            drop_last=True,
            num_workers=getattr(args, "workers", 0),
            seed=args.seed,
            rank=jax.process_index(),
            world_size=n_proc,
            worker_mode=getattr(args, "worker_mode", "thread"),
        )
        # data echoing (Choi et al., arXiv:1907.05550): each loaded batch
        # trains `data_echo` steps, each with fresh on-device
        # augmentations (flip/jitter/dropout draw from the per-step rng).
        # Opt-in for input-bound hosts; 1 = reference semantics.
        self.data_echo = max(1, int(getattr(args, "data_echo", 1) or 1))
        self.batches_per_epoch = len(self.loader) * self.data_echo
        n = len(dataset)

        self.tx = make_optimizer(
            base_lr=args.base_lr,
            weight_decay=args.wd,
            # reference lr scaling is by world_size = total accelerators
            # (main.py:127); mesh.devices.size is ALREADY the global chip
            # count in multi-process jax — do not multiply by processes
            multiplier=float(self.n_devices),
            warmup_epochs=args.warmup_epochs,
            use_warmup=args.use_warmup_scheduler,
            batches_per_epoch=self.batches_per_epoch,
        )

        rng = jax.random.PRNGKey(args.seed)
        self.np_rng = np.random.default_rng(args.seed)
        from selavi_tpu.data.factory import (
            audio_cfg_from_args,
            example_shapes,
        )

        video_shape, audio_shape = example_shapes(args, dataset)
        self.audio_cfg = audio_cfg_from_args(args)
        with self.mesh:
            self.state = create_train_state(
                self.model, self.tx, rng, video_shape, audio_shape
            )
        # params/opt-state shardings: head stacks over the 'model' axis
        # (independent heads = expert axis), everything else replicated
        from selavi_tpu.parallel.mesh import state_shardings

        self.state_shardings = state_shardings(
            self.mesh, self.state, args.headcount
        )
        self.state = jax.device_put(self.state, self.state_shardings)
        self.sl_state = SelfLabelState.init(n, args.headcount)

        video_clips = 2 if getattr(args, "dual_data", False) else 1
        self.train_step = make_train_step(
            self.model,
            colorjitter=args.colorjitter,
            grayscale=args.use_grayscale,
            compute_dtype=compute_dtype,
            audio_cfg=self.audio_cfg,
            video_clips=video_clips,
        )
        self.bn_warmup_step = make_bn_warmup_step(
            self.model, compute_dtype=compute_dtype,
            audio_cfg=self.audio_cfg,
            video_clips=video_clips,
        )
        # NOTE on conv_impl: the '2d' expression looked 3x faster in a
        # single-conv microbenchmark but is catastrophically slower at SK
        # batch sizes (24 vs 563 clips/s at bs 64 on v5e) — XLA's 2D conv
        # algorithm choice degrades with huge B*T. Both train and eval use
        # '3d'; models/convert.py keeps the expressions interchangeable.
        # SK aggregation sees fresh augmentations (flip + optional
        # colorjitter/grayscale), matching the reference's fully-augmented
        # aggregation pass (sk_utils.py:153-174). --sk_augment false gives
        # the deterministic normalize-only encode.
        self.sk_augment = getattr(args, "sk_augment", True)
        self.encode = make_encode_fn(
            self.model, compute_dtype=compute_dtype,
            audio_cfg=self.audio_cfg,
            augment=self.sk_augment,
            colorjitter=args.colorjitter,
            grayscale=args.use_grayscale,
            video_clips=video_clips,
        )
        self._agg_rng = jax.random.PRNGKey(args.seed + 2)
        self.head_logits = make_head_logits_fn(self.model)

        self.sk_cfg = SKConfig(
            headcount=args.headcount,
            num_clusters=args.mlp_dim,
            lamb=float(args.lamb),
            ind_groups=args.ind_groups,
            match=args.match,
            distribution=args.distribution,
            gauss_sd=args.gauss_sd,
            diff_dist_every=args.diff_dist_every,
            diff_dist_per_head=args.diff_dist_per_head,
            sk_backend=getattr(args, "sk_backend", "auto"),
            sk_m_bf16=getattr(args, "sk_bf16", False),
            cache_group_batches=getattr(args, "sk_cache_batches", False),
            feat_dim_a=AUDIO_ARCHS[
                getattr(args, "aud_base_arch", "resnet9")
            ][2],
        )
        self.sk_schedule = make_sk_schedule(
            args.epochs,
            self.batches_per_epoch,
            args.nopts,
            args.schedulepower,
        )
        self.step_rng = jax.random.PRNGKey(args.seed + 1)
        self.true_labels = getattr(dataset, "labels", None)
        self._history: list[dict] = []

    # ------------------------------------------------------------------
    def resume(self) -> int:
        self.state, self.sl_state, start_epoch = restore_checkpoint(
            self.args.dump_path, self.state, self.sl_state
        )
        # restored leaves are host arrays; re-commit to the mesh layout
        self.state = jax.device_put(self.state, self.state_shardings)
        if start_epoch != 0:
            self.sk_schedule, done = fast_forward_schedule(
                self.sk_schedule, self.batches_per_epoch, start_epoch
            )
            self.sl_state.sk_counter = max(self.sl_state.sk_counter, done)
            logger.info(
                "resumed at epoch %d (%d SK steps done)", start_epoch, done
            )
        return start_epoch

    def warmup_batchnorm(self, batches: Optional[int] = None):
        batches = batches or getattr(self.args, "bn_warmup_batches", 20)
        if batches <= 0:
            return
        logger.info("Warming up batchnorm (%d batches)", batches)
        self.loader.set_epoch(999)
        bs = self.state.batch_stats
        rng = jax.random.PRNGKey(999)
        for i, batch in enumerate(self._device_batches(echo=False)):
            if i >= batches:
                break
            rng, sub = jax.random.split(rng)
            bs = self.bn_warmup_step(
                self.state.params, bs, batch["video"],
                batch.get("audio", batch.get("audio_pcm")), sub,
            )
        self.state = self.state.replace(batch_stats=bs)

    def _device_batches(self, echo: bool = True):
        """``echo=False`` yields each loaded batch once regardless of
        --data_echo (BN warmup wants unique batches, not augmented
        replays of the same data)."""
        batches = decode_wire_batches(self._prefetch(
            iter(self.loader), depth=getattr(self.args, "prefetch", 4),
        ))
        if self.data_echo == 1 or not echo:
            return batches
        return (b for b in batches for _ in range(self.data_echo))

    def _prefetch(self, it, depth):
        mesh = self.mesh if jax.process_count() > 1 else None
        if getattr(self.args, "coalesce_transfers", True):
            return coalesced_device_batches(
                it, sharding=self.data_sharding, depth=depth, mesh=mesh,
            )
        return device_prefetch(
            it, sharding=self.data_sharding, depth=depth, mesh=mesh,
        )

    def _make_eval_iter(self):
        """Fresh sequential full-dataset iterator for SK aggregation. Each
        call gets a new seed so independent head groups see fresh
        augmentations (reference re-reads the dataset per group,
        sk_utils.py:194-196)."""
        self._eval_iter_count = getattr(self, "_eval_iter_count", 0) + 1
        n_proc = jax.process_count()
        eval_loader = DataLoader(
            self.dataset,
            batch_size=min(
                getattr(self.args, "sk_agg_batch", 128)
                * self.n_devices // n_proc,
                max(len(self.dataset), 1),
            ),
            shuffle=False,
            drop_last=False,
            num_workers=getattr(self.args, "workers", 0),
            seed=self.args.seed + 7919 + self._eval_iter_count,
            rank=jax.process_index(),
            world_size=n_proc,
            worker_mode=getattr(self.args, "worker_mode", "thread"),
        )
        return decode_wire_batches(
            self._prefetch(iter(eval_loader), depth=2)
        )

    def maybe_cluster(self, iteration: int) -> bool:
        """Run SK if the schedule says so (reference main.py:272-281)."""
        if iteration < self.sk_schedule[-1]:
            return False
        self.sk_schedule.pop()

        def encode_fn(video, audio):
            if self.sk_augment:
                self._agg_rng, sub = jax.random.split(self._agg_rng)
                return self.encode(
                    self.state.params, self.state.batch_stats, video,
                    audio, sub,
                )
            return self.encode(
                self.state.params, self.state.batch_stats, video, audio
            )

        def head_logits_fn(params, feats, modality):
            return self.head_logits(
                params, self.state.batch_stats, feats, modality
            )

        labels, marginals, metrics, info = cluster(
            encode_fn=encode_fn,
            head_logits_fn=head_logits_fn,
            make_batch_iter=self._make_eval_iter,
            params=self.state.params,
            n=len(self.dataset),
            cfg=self.sk_cfg,
            selflabels=self.sl_state.selflabels,
            marginal_state=self.sl_state.marginals,
            iter_num=self.sl_state.sk_counter,
            np_rng=self.np_rng,
            true_labels=self.true_labels,
            writer=self.writer,
            sk_counter=self.sl_state.sk_counter,
            feature_sharding=self.data_sharding,
        )
        if "params" in info:  # modality alignment permuted audio heads
            params = jax.device_put(
                info["params"], self.state_shardings.params
            )
            self.state = self.state.replace(params=params)
        self.sl_state.selflabels = labels
        self.sl_state.marginals = marginals
        self.sl_state.sk_counter += 1
        self._history.append(metrics)
        return True

    def train_epoch(self, epoch: int) -> float:
        if self.batches_per_epoch == 0:
            raise ValueError(
                f"dataset ({len(self.dataset)} samples) is smaller than "
                f"one global batch ({self.loader.batch_size} per process "
                f"x {jax.process_count()} processes with drop_last) - "
                "reduce --batch_size or add data"
            )
        self.loader.set_epoch(epoch)
        losses = AverageMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        end = time.time()
        batches_thusfar = epoch * self.batches_per_epoch
        selflabels_dev = jax.device_put(
            jnp.asarray(self.sl_state.selflabels), self.replicated
        )

        for it, batch in enumerate(self._device_batches()):
            data_time.update(time.time() - end)
            if self.maybe_cluster(batches_thusfar + it):
                selflabels_dev = jax.device_put(
                    jnp.asarray(self.sl_state.selflabels), self.replicated
                )
            labels = selflabels_dev[batch["index"]]
            self.step_rng, sub = jax.random.split(self.step_rng)
            self.state, metrics = self.train_step(
                self.state, batch, labels, sub
            )
            # no per-step host sync: fetch the loss only at the logging
            # cadence so device dispatch stays async (a float() per step
            # would serialize host<->device every iteration)
            batch_time.update(time.time() - end)
            end = time.time()

            iteration = epoch * self.batches_per_epoch + it
            if it % 50 == 0 and jax.process_index() == 0:
                loss = float(metrics["loss"])
                losses.update(loss, batch["video"].shape[0])
                logger.info(
                    "Epoch: [%d][%d]\tTime %.3f (%.3f)\tData %.3f (%.3f)\t"
                    "Loss %.4f (%.4f)",
                    epoch,
                    it,
                    batch_time.val,
                    batch_time.avg,
                    data_time.val,
                    data_time.avg,
                    losses.val,
                    losses.avg,
                )
                if self.writer:
                    self.writer.add_scalar("loss/iter", loss, iteration)
                    self.writer.add_scalar(
                        "batch_time/iter", batch_time.avg, iteration
                    )
                    self.writer.add_scalar(
                        "data_time/iter", data_time.avg, iteration
                    )
            if signal_received() or memory_pressure():
                # mid-epoch: stamp the CURRENT epoch as the resume point
                # so the interrupted epoch re-runs in full (the reference
                # requeues and restarts from the last completed epoch);
                # stamping epoch+1 would silently skip its remaining
                # batches and mark its scheduled SK steps done
                self.checkpoint(epoch, completed=False)
                from selavi_tpu.train.checkpoint import (
                    wait_for_pending_checkpoint,
                )

                wait_for_pending_checkpoint()  # flush before exiting
                logger.warning("preemption checkpoint written; exiting")
                raise SystemExit(0)
        # final sync so the returned epoch loss reflects the last step
        losses.update(float(metrics["loss"]), 1)
        return losses.avg

    def checkpoint(self, epoch: int, completed: bool = True):
        # single source of truth for the resume point, shared with the
        # persisted blob (a drift between the two re-opens the silent
        # mid-epoch-skip bug this rule fixed)
        resume_epoch = epoch + 1 if completed else epoch
        self.sl_state.epoch = resume_epoch
        save_checkpoint(
            self.args.dump_path,
            self.state,
            self.sl_state,
            epoch,
            checkpoint_freq=getattr(self.args, "checkpoint_freq", 5),
            total_epochs=self.args.epochs,
            dump_checkpoints=getattr(self.args, "dump_checkpoints", None),
            async_write=getattr(self.args, "async_checkpoint", True),
            resume_epoch=resume_epoch,
        )

    def fit(self) -> list[dict]:
        start_epoch = self.resume()
        if start_epoch == 0:
            self.warmup_batchnorm()
        trace_first = getattr(self.args, "trace_profile", False)
        for epoch in range(start_epoch, self.args.epochs):
            logger.info("============ Starting epoch %i ============", epoch)
            if trace_first and epoch == start_epoch:
                from selavi_tpu.utils.profiling import trace_window

                with trace_window(self.args.dump_path):
                    avg_loss = self.train_epoch(epoch)
            else:
                avg_loss = self.train_epoch(epoch)
            self.checkpoint(epoch)
            self._history.append({"epoch": epoch, "loss": avg_loss})
        from selavi_tpu.train.checkpoint import wait_for_pending_checkpoint

        wait_for_pending_checkpoint()  # flush the final async write
        return self._history

"""Jitted training / inference steps.

The reference hot loop (/root/reference/main.py:263-302): forward both
towers + heads, loss = 0.5*CE(video heads) + 0.5*CE(audio heads) each
averaged over heads (utils.py:377-387), SGD step, DDP allreduce. Here the
whole step is one jitted SPMD program: batch sharded over the mesh's data
axis, params replicated, gradient psums and global-BN collectives inserted
by GSPMD. Raw uint8 frames enter the step and the fused augmentation /
normalization (selavi_tpu.ops.preprocess) runs on device, so host->device
traffic is uint8.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from selavi_tpu.ops.preprocess import augment_video_batch


def prepare_audio(audio, compute_dtype, audio_cfg=None):
    """Spec [B,F,T,1] passes through; raw PCM [B,S] is turned into
    spectrograms on device (fused gather+FFT+mel kernel, ops/logmel.py) —
    the TPU-native audio frontend (host ships 1s of PCM instead of a
    computed spectrogram). dual_data PCM [B,2,S] becomes a 2-channel
    spectrogram [B,F,T,2] (the reference stacks dual specs along the
    channel axis, AVideoDataset.py:451)."""
    if audio.ndim in (2, 3) and (
        audio.ndim == 2 or audio.shape[1] <= 4
    ):  # [B, S] or [B, n_clips, S] raw PCM
        from selavi_tpu.ops.logmel import logfbank_batch

        cfg = audio_cfg or {}
        n_clips = None
        if audio.ndim == 3:
            n_clips = audio.shape[1]
            audio = audio.reshape(audio.shape[0] * n_clips, audio.shape[2])
        spec = logfbank_batch(
            audio.astype(jnp.float32),
            samplerate=cfg.get("samplerate", 48000),
            nfilt=cfg.get("nfilt", 257),
            z_normalize=cfg.get("z_normalize", False),
        )
        if n_clips is not None:
            b = spec.shape[0] // n_clips
            spec = spec.reshape(b, n_clips, *spec.shape[1:])
            spec = jnp.moveaxis(spec, 1, -1)  # [B, F, T, n_clips]
            return spec.astype(compute_dtype)
        return spec[..., None].astype(compute_dtype)
    return audio.astype(compute_dtype)


def multihead_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean over heads of CE(logits[h], labels[:, h]).

    logits [H, B, K]; labels [B, H] int.
    """
    h = logits.shape[0]
    per_head = jax.vmap(
        lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
            lg.astype(jnp.float32), lb
        ).mean(),
        in_axes=(0, 1),
    )(logits, labels)
    return per_head.mean()


def make_train_step(
    model,
    colorjitter: bool = False,
    grayscale: bool = False,
    compute_dtype=jnp.float32,
    donate: bool = True,
    audio_cfg: Optional[dict] = None,
    video_clips: int = 1,
) -> Callable:
    """Returns jitted ``step(state, batch, labels, rng) -> (state, metrics)``.

    ``batch['video']`` uint8 [B,T,H,W,3]; ``batch['audio']`` [B,F,T,1]
    float32; ``labels`` [B, H] int32 pseudo-labels. ``video_clips`` > 1
    (dual_data) makes each time-concatenated clip draw independent
    flips/jitters.
    """

    def step(state, batch, labels, rng):
        aug_rng, dropout_rng = jax.random.split(rng)
        video = augment_video_batch(
            batch["video"],
            aug_rng,
            colorjitter=colorjitter,
            grayscale=grayscale,
            flip=True,
            dtype=compute_dtype,
            clips=video_clips,
        )
        audio = prepare_audio(
            batch.get("audio", batch.get("audio_pcm")),
            compute_dtype,
            audio_cfg,
        )

        def loss_fn(params):
            (logits_v, logits_a), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                video,
                audio,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss_v = multihead_ce(logits_v, labels)
            loss_a = multihead_ce(logits_a, labels)
            loss = 0.5 * loss_v + 0.5 * loss_a
            return loss, (loss_v, loss_a, updates["batch_stats"])

        (loss, (loss_v, loss_a, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {"loss": loss, "loss_v": loss_v, "loss_a": loss_a}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_bn_warmup_step(
    model, compute_dtype=jnp.float32, audio_cfg: Optional[dict] = None,
    video_clips: int = 1,
) -> Callable:
    """Forward-only pass updating BN running stats
    (reference ``warmup_batchnorm``, /root/reference/utils.py:389-418)."""

    @jax.jit
    def warmup(params, batch_stats, video_u8, audio, rng):
        video = augment_video_batch(
            video_u8, rng, flip=True, dtype=compute_dtype,
            clips=video_clips,
        )
        # FULL forward including heads: the first SK step (iteration 0)
        # applies head BNs in eval mode, so their running stats must be
        # warmed too (the reference warmup forwards the whole model,
        # utils.py:400-409)
        _, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video,
            prepare_audio(audio, compute_dtype, audio_cfg),
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return updates["batch_stats"]

    return warmup


def _match_audio_channels(spec, audio_channels):
    """Tile a single-channel spectrogram to the stem's channel count.

    A dual_data-trained checkpoint has a 2-channel audio stem, but eval
    datasets (test mode) yield single clips; duplicating the spec across
    both channels lets such checkpoints still be evaluated."""
    if (
        audio_channels
        and spec.shape[-1] == 1
        and spec.shape[-1] != audio_channels
    ):
        reps = (1,) * (spec.ndim - 1) + (int(audio_channels),)
        spec = jnp.tile(spec, reps)
    return spec


def make_encode_fn(
    model,
    compute_dtype=jnp.float32,
    audio_cfg: Optional[dict] = None,
    augment: bool = False,
    colorjitter: bool = False,
    grayscale: bool = False,
    audio_channels: Optional[int] = None,
    video_clips: int = 1,
) -> Callable:
    """Eval-mode GAP features for the SK aggregation pass
    (reference sk_utils.py:196-211; eval mode = running BN stats).

    With ``augment=True`` the returned function takes a trailing ``rng``
    and routes the video through the same fused device augmentation as the
    train step (hflip p=.5 + optional colorjitter/grayscale): the reference
    aggregates features by re-iterating the *fully augmented* train dataset
    (sk_utils.py:153-174; video_transforms.py:137-164), so SK must see
    fresh flips, not just the host-side crop jitter. ``augment=False``
    keeps the deterministic normalize-only path used by eval dumps (the
    reference's get_clusters.py:294-312 builds a no-jitter dataset).
    """
    if augment:

        @jax.jit
        def encode_aug(params, batch_stats, video_u8, audio, rng):
            video = augment_video_batch(
                video_u8,
                rng,
                colorjitter=colorjitter,
                grayscale=grayscale,
                flip=True,
                dtype=compute_dtype,
                clips=video_clips,
            )
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                video,
                _match_audio_channels(
                    prepare_audio(audio, compute_dtype, audio_cfg),
                    audio_channels,
                ),
                train=False,
                return_features=True,
            )

        return encode_aug

    @jax.jit
    def encode(params, batch_stats, video_u8, audio):
        video = (
            (video_u8.astype(jnp.float32) / 255.0 - 0.45) / 0.225
        ).astype(compute_dtype)
        feat_v, feat_a = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video,
            _match_audio_channels(
                prepare_audio(audio, compute_dtype, audio_cfg),
                audio_channels,
            ),
            train=False,
            return_features=True,
        )
        return feat_v, feat_a

    return encode


def make_head_logits_fn(model) -> Callable:
    """``(variables, feats [N,512], modality) -> [H, N, K]`` in eval mode."""

    @functools.partial(jax.jit, static_argnames=("modality",))
    def head_logits(params, batch_stats, feats, modality: str):
        method = (
            model.video_heads if modality == "v" else model.audio_heads
        )
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=False,
            method=method,
        )

    return head_logits

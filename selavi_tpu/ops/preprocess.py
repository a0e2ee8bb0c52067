"""Device-side fused video preprocessing.

The reference normalizes / flips / color-jitters per sample on host CPU
(/root/reference/datasets/video_transforms.py:420-504). TPU-native split:
the host only decodes + resizes + crops to a static shape (variable-size ops
need dynamic shapes XLA can't tile); everything elementwise runs on device
as one fused XLA program feeding straight into the conv stem:

* uint8 -> float normalize ``(x/255 - 0.45) / 0.225``
  (reference video_transforms.py:13-14, 473-480);
* per-sample horizontal flip with probability 0.5;
* color jitter (brightness/contrast/saturation, strength 0.4, applied with
  probability 0.8) and grayscale (probability 0.2). Two documented
  deviations from the reference: (a) torchvision applies the three
  adjustments in random order — here the order is fixed (b, c, s) with the
  same factor distributions (differs only at second order in the jitter
  strength); (b) the reference jitters *already-normalized* frames
  (clip_augmentation normalizes first, video_transforms.py:473-495) —
  here jitter acts in [0,1] space before normalization, the conventional
  torchvision composition. Both only matter when --colorjitter is on
  (off in the pretraining recipe; finetuning uses it).

Batches stay sharded over the mesh's data axis; all ops are elementwise or
per-sample reductions, so GSPMD needs no collectives here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_GRAY = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def normalize_video(frames_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [B, T, H, W, 3] -> normalized float video."""
    x = frames_u8.astype(jnp.float32) / 255.0
    return ((x - 0.45) / 0.225).astype(dtype)


@jax.jit
def yuv420_to_rgb_batch(
    y_u8: jnp.ndarray, uv_u8: jnp.ndarray
) -> jnp.ndarray:
    """YUV 4:2:0 wire format -> RGB uint8 on device.

    ``y`` [B,T,H,W] + ``uv`` [B,T,H/2,W/2,2] uint8 -> [B,T,H,W,3] uint8
    (BT.601 full-range, nearest-neighbor chroma upsample). The wire format
    halves host->device video bytes (1.5 B/px vs 3) — video is natively
    4:2:0, so on a real decode path this is lossless relative to the
    source; conversion is elementwise and fuses into the augmentation.
    """
    y = y_u8.astype(jnp.float32)
    uv = uv_u8.astype(jnp.float32) - 128.0
    uv = jnp.repeat(jnp.repeat(uv, 2, axis=2), 2, axis=3)
    u, v = uv[..., 0], uv[..., 1]
    rgb = jnp.stack(
        [
            y + 1.402 * v,
            y - 0.344136 * u - 0.714136 * v,
            y + 1.772 * u,
        ],
        axis=-1,
    )
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)


def _adjust_brightness(x, factor):
    return x * factor


def _adjust_contrast(x, factor):
    # torchvision: blend with the mean of the grayscale image.
    mean = jnp.mean(
        jnp.tensordot(x, _GRAY, axes=[[-1], [0]]),
        axis=(1, 2, 3),
        keepdims=True,
    )[..., None]
    return x * factor + mean * (1.0 - factor)


def _adjust_saturation(x, factor):
    gray = jnp.tensordot(x, _GRAY, axes=[[-1], [0]])[..., None]
    return x * factor + gray * (1.0 - factor)


@functools.partial(
    jax.jit,
    static_argnames=("colorjitter", "grayscale", "flip", "dtype", "clips"),
)
def augment_video_batch(
    frames_u8: jnp.ndarray,
    rng: jax.Array,
    colorjitter: bool = False,
    grayscale: bool = False,
    flip: bool = True,
    jitter_strength: float = 0.4,
    dtype=jnp.float32,
    clips: int = 1,
) -> jnp.ndarray:
    """Fused flip + color jitter + grayscale + normalize.

    Input uint8 [B, T, H, W, 3]; output normalized ``dtype`` video. Factors
    are drawn per sample (the reference draws per clip too — one factor for
    all frames of a clip, video_transforms.py:273-363). With ``clips`` > 1
    (dual_data: two clips time-concatenated per sample) every clip draws
    its own flip/jitter, matching the reference's per-clip
    ``clip_augmentation`` calls (AVideoDataset.py:431-443).
    """
    b_in, t_in = frames_u8.shape[0], frames_u8.shape[1]
    if clips > 1:
        frames_u8 = frames_u8.reshape(
            (b_in * clips, t_in // clips) + frames_u8.shape[2:]
        )
    b = frames_u8.shape[0]
    x = frames_u8.astype(jnp.float32) / 255.0

    k_flip, k_bj, k_cj, k_sj, k_apply, k_gray = jax.random.split(rng, 6)

    if flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(
            do_flip[:, None, None, None, None], x[:, :, :, ::-1, :], x
        )

    if colorjitter:
        s = jitter_strength
        bf = jax.random.uniform(
            k_bj, (b, 1, 1, 1, 1), minval=1 - s, maxval=1 + s
        )
        cf = jax.random.uniform(
            k_cj, (b, 1, 1, 1, 1), minval=1 - s, maxval=1 + s
        )
        sf = jax.random.uniform(
            k_sj, (b, 1, 1, 1, 1), minval=1 - s, maxval=1 + s
        )
        jit = _adjust_saturation(
            _adjust_contrast(_adjust_brightness(x, bf), cf), sf
        )
        jit = jnp.clip(jit, 0.0, 1.0)
        do_jit = jax.random.bernoulli(k_apply, 0.8, (b,))
        x = jnp.where(do_jit[:, None, None, None, None], jit, x)

    if grayscale:
        gray = jnp.tensordot(x, _GRAY, axes=[[-1], [0]])[..., None]
        gray = jnp.broadcast_to(gray, x.shape[:-1] + (1,)).repeat(3, -1)
        do_gray = jax.random.bernoulli(k_gray, 0.2, (b,))
        x = jnp.where(do_gray[:, None, None, None, None], gray, x)

    out = ((x - 0.45) / 0.225).astype(dtype)
    if clips > 1:
        out = out.reshape((b_in, t_in) + out.shape[2:])
    return out

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
  probability 0.8 to the *already-normalized* frames in a random per-clip
  order — exact reference semantics, video_transforms.py:273-363, 473-495)
  and grayscale (probability 0.2, video_transforms.py:251-270, 498-500).

Exact-parity notes (r5; previously documented deviations, now closed):

* **Random order without control flow.** All three adjustments are linear
  operators on the clip tensor: brightness ``x -> a*x``, saturation
  ``x -> a*x + (1-a)*G(x)``, contrast ``x -> a*x + (1-a)*M(G(x))``, where
  ``G`` projects onto gray and ``M`` is the per-frame spatial mean
  (the reference means over (C,H,W) of TCHW frames — per FRAME, not per
  clip, video_transforms.py:342-344). Because ``G`` and ``M∘G`` are
  idempotent projections (the gray weights sum to 1) any composition
  collapses to ``t1*x + t2*G(x) + t3*M(G(x))``; the coefficient triple for
  each of the 6 orders is cheap scalar math, selected per clip by a
  one-hot — no per-sample branches, one fused pass over pixels.
* **Post-normalization jitter.** Only brightness actually differs across
  the normalize boundary (``G``/``M`` commute with the channel-uniform
  affine normalize); the reference brightness blends toward normalized 0
  (= gray level 0.45), not black. We therefore normalize FIRST and jitter
  after, exactly like clip_augmentation. No [0,1] clamp afterwards —
  the reference never clips.
* **Gray-weight order quirk.** grayscale() documents BGR and puts 0.299 on
  channel index 2, but the decoder feeds RGB (decoder.py:268), so the
  effective weights on (R, G, B) are (0.114, 0.587, 0.299). Replicated
  verbatim (``_GRAY_REF``); both the jitter and the standalone grayscale
  use it, like the reference.

Batches stay sharded over the mesh's data axis; all ops are elementwise or
per-sample reductions, so GSPMD needs no collectives here.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp

# Reference grayscale weights as *effectively applied* to RGB input:
# 0.299 lands on channel 2 (video_transforms.py:262-266 assumes BGR;
# decoder.py:268 feeds RGB). Weights sum to 1, making G idempotent.
_GRAY_REF = jnp.array([0.114, 0.587, 0.299], jnp.float32)

# op ids: 0=brightness, 1=contrast, 2=saturation (the reference's jitter
# list order, video_transforms.py:289-295); all 6 application orders.
_JITTER_PERMS = tuple(itertools.permutations((0, 1, 2)))


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


def jitter_coefficients(bf, cf, sf, perm_idx):
    """Composed-jitter coefficient triple ``(t1, t2, t3)`` per clip.

    For per-clip factors ``bf``/``cf``/``sf`` (brightness/contrast/
    saturation, each ``[b]``) and a permutation index ``perm_idx`` in
    ``[0, 6)`` over ``_JITTER_PERMS``, returns the coefficients of the
    composed linear map ``x -> t1*x + t2*G(x) + t3*M(G(x))`` equal to
    applying the reference's three jitter ops in that order
    (video_transforms.py:296-305). State transitions (derived from the
    projection algebra ``G∘G = G``, ``G∘(M∘G) = M∘G = (M∘G)∘(M∘G)``):

    * brightness a: ``t -> a*t`` (blend with zeros, :308-324)
    * contrast  a: ``(a*t1, a*t2, a*t3 + (1-a)*(t1+t2+t3))`` (:327-345)
    * saturation a: ``(a*t1, a*t2 + (1-a)*(t1+t2), t3)`` (:348-363)
    """
    triples = []
    for perm in _JITTER_PERMS:
        t1 = jnp.ones_like(bf)
        t2 = jnp.zeros_like(bf)
        t3 = jnp.zeros_like(bf)
        for op in perm:
            if op == 0:
                t1, t2, t3 = bf * t1, bf * t2, bf * t3
            elif op == 1:
                t1, t2, t3 = (
                    cf * t1, cf * t2, cf * t3 + (1.0 - cf) * (t1 + t2 + t3)
                )
            else:
                t1, t2, t3 = (
                    sf * t1, sf * t2 + (1.0 - sf) * (t1 + t2), t3
                )
        triples.append(jnp.stack([t1, t2, t3]))
    allc = jnp.stack(triples)  # [6, 3, b]
    onehot = jax.nn.one_hot(perm_idx, len(_JITTER_PERMS), dtype=allc.dtype)
    return jnp.einsum("pcb,bp->cb", allc, onehot)  # [3, b]


def color_jitter_normalized(x, bf, cf, sf, perm_idx):
    """Reference color jitter on normalized [B,T,H,W,3] frames.

    Exact semantics of video_transforms.py::color_jitter applied in the
    order ``_JITTER_PERMS[perm_idx]`` with the given per-clip factors:
    one fused pass computing ``t1*x + t2*G(x) + t3*M(G(x))`` with the
    reference's effective-RGB gray weights and per-frame contrast mean.
    """
    t = jitter_coefficients(bf, cf, sf, perm_idx)
    t1, t2, t3 = (t[c][:, None, None, None, None] for c in range(3))
    gray = jnp.tensordot(x, _GRAY_REF, axes=[[-1], [0]])  # [B,T,H,W]
    frame_mean = jnp.mean(gray, axis=(2, 3), keepdims=True)  # [B,T,1,1]
    return t1 * x + t2 * gray[..., None] + t3 * frame_mean[..., None]


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
    """Fused flip + normalize + color jitter + grayscale.

    Input uint8 [B, T, H, W, 3]; output normalized ``dtype`` video. Exact
    reference pipeline order (clip_augmentation, video_transforms.py:
    473-503): normalize first, then with p=0.8 the three jitter ops in a
    random per-clip order on the normalized frames (no clamp), then with
    p=0.2 grayscale. Factors/order are drawn per clip (one draw for all
    frames of a clip, like the per-call np.random draws :273-363). With
    ``clips`` > 1 (dual_data: two clips time-concatenated per sample)
    every clip draws its own flip/jitter, matching the reference's
    per-clip ``clip_augmentation`` calls (AVideoDataset.py:431-443).
    """
    b_in, t_in = frames_u8.shape[0], frames_u8.shape[1]
    if clips > 1:
        frames_u8 = frames_u8.reshape(
            (b_in * clips, t_in // clips) + frames_u8.shape[2:]
        )
    b = frames_u8.shape[0]
    x = frames_u8.astype(jnp.float32) / 255.0

    k_flip, k_bj, k_cj, k_sj, k_perm, k_apply, k_gray = jax.random.split(
        rng, 7
    )

    if flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(
            do_flip[:, None, None, None, None], x[:, :, :, ::-1, :], x
        )

    # Normalize BEFORE jitter/grayscale — the reference order
    # (clip_augmentation normalizes at :473-476, jitters at :492-495).
    x = (x - 0.45) / 0.225

    if colorjitter:
        s = jitter_strength
        bf = jax.random.uniform(k_bj, (b,), minval=1 - s, maxval=1 + s)
        cf = jax.random.uniform(k_cj, (b,), minval=1 - s, maxval=1 + s)
        sf = jax.random.uniform(k_sj, (b,), minval=1 - s, maxval=1 + s)
        perm_idx = jax.random.randint(k_perm, (b,), 0, len(_JITTER_PERMS))
        jit = color_jitter_normalized(x, bf, cf, sf, perm_idx)
        do_jit = jax.random.bernoulli(k_apply, 0.8, (b,))
        x = jnp.where(do_jit[:, None, None, None, None], jit, x)

    if grayscale:
        gray = jnp.tensordot(x, _GRAY_REF, axes=[[-1], [0]])[..., None]
        gray = jnp.broadcast_to(gray, x.shape[:-1] + (1,)).repeat(3, -1)
        do_gray = jax.random.bernoulli(k_gray, 0.2, (b,))
        x = jnp.where(do_gray[:, None, None, None, None], gray, x)

    out = x.astype(dtype)
    if clips > 1:
        out = out.reshape((b_in, t_in) + out.shape[2:])
    return out

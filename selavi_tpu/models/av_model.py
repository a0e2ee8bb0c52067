"""AVModel: the two-tower audio-visual network with multi-head projections.

Capability parity with /root/reference/model.py:169-275 (``AVModel`` +
``load_model``), restructured for JAX:

* ``__call__(video, audio)`` returns per-head logits stacked ``[H, B, K]``
  for each modality (the reference returns Python lists of head outputs);
* ``return_features`` is an argument, not mutable module state
  (the reference flips ``model.module.return_features`` around the
  self-labeling pass, /root/reference/src/sk_utils.py:185-187,354);
* head application to pre-pooled features is exposed as dedicated methods so
  the Sinkhorn engine can run all heads over the aggregated ``[N, 512]``
  feature matrix in one batched matmul.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from selavi_tpu.models.heads import HeadStack
from selavi_tpu.models.r2plus1d import R2Plus1D18
from selavi_tpu.models.resnet_audio import AudioResNet

Dtype = Any


def _l2_normalize(x, axis=-1, eps=0.0):
    # reference Normalize/F.normalize: x / ||x||_2 (p=2) along features.
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, 1e-12 if eps == 0.0 else eps)


class AVModel(nn.Module):
    vid_base_arch: str = "r2plus1d_18"
    aud_base_arch: str = "resnet9"
    norm_feat: bool = False
    use_mlp: bool = True
    headcount: int = 1
    num_classes: int = 256
    dtype: Dtype = jnp.float32
    conv_impl: str = "3d"  # video tower conv expression (see r2plus1d.py)
    midplanes_mode: str = "parity"  # 'parity' | 'aligned' (MXU-rounded)

    def setup(self):
        if self.vid_base_arch != "r2plus1d_18":
            raise ValueError(
                f"unsupported video arch: {self.vid_base_arch!r}"
            )
        self.video_network = R2Plus1D18(
            dtype=self.dtype,
            conv_impl=self.conv_impl,
            midplanes_mode=self.midplanes_mode,
        )
        self.audio_network = AudioResNet(
            arch=self.aud_base_arch, dtype=self.dtype
        )
        self.heads_v = HeadStack(
            headcount=self.headcount,
            num_classes=self.num_classes,
            n_hidden=512,
            use_mlp=self.use_mlp,
            dtype=self.dtype,
        )
        self.heads_a = HeadStack(
            headcount=self.headcount,
            num_classes=self.num_classes,
            n_hidden=512,
            use_mlp=self.use_mlp,
            dtype=self.dtype,
        )

    def __call__(
        self,
        video,
        audio,
        train: bool = True,
        return_features: bool = False,
    ):
        """video [B,T,H,W,3], audio [B,F,T,1] -> per-head logits or features.

        Returns ``(logits_v, logits_a)`` each ``[H, B, K]``, or
        ``(feat_v, feat_a)`` each ``[B, 512]`` when ``return_features``.
        """
        feat_v = self.video_network(video, train=train)
        feat_a = self.audio_network(audio, train=train)
        if return_features:
            return feat_v, feat_a
        out_v = self.heads_v(feat_v, train=train)
        out_a = self.heads_a(feat_a, train=train)
        if self.norm_feat:
            out_v = _l2_normalize(out_v)
            out_a = _l2_normalize(out_a)
        return out_v, out_a

    def encode(self, video, audio, train: bool = False):
        """Pooled 512-d features for both modalities (self-labeling path)."""
        return self(video, audio, train=train, return_features=True)

    def encode_video(self, video, train: bool = False):
        return self.video_network(video, train=train)

    def video_feature_map(self, video, train: bool = False):
        """Pre-GAP video feature map [B, t, h, w, 512] (retrieval)."""
        return self.video_network(video, train=train, return_map=True)

    def encode_audio(self, audio, train: bool = False):
        return self.audio_network(audio, train=train)

    def video_heads(self, feat_v, train: bool = False):
        """Apply all video heads to pre-pooled features -> [H, B, K]."""
        return self.heads_v(feat_v, train=train)

    def audio_heads(self, feat_a, train: bool = False):
        """Apply all audio heads to pre-pooled features -> [H, B, K]."""
        return self.heads_a(feat_a, train=train)


def load_model(
    vid_base_arch: str = "r2plus1d_18",
    aud_base_arch: str = "resnet9",
    norm_feat: bool = False,
    use_mlp: bool = True,
    headcount: int = 1,
    num_classes: int = 256,
    dtype: Dtype = jnp.float32,
    conv_impl: str = "3d",
    midplanes_mode: str = "parity",
    **_unused,
) -> AVModel:
    """Factory mirroring the reference ``load_model`` surface
    (/root/reference/model.py:255-275)."""
    return AVModel(
        vid_base_arch=vid_base_arch,
        aud_base_arch=aud_base_arch,
        norm_feat=norm_feat,
        use_mlp=use_mlp,
        headcount=headcount,
        num_classes=num_classes,
        dtype=dtype,
        conv_impl=conv_impl,
        midplanes_mode=midplanes_mode,
    )

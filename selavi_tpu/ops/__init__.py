from selavi_tpu.ops.logmel import logfbank_batch
from selavi_tpu.ops.preprocess import (
    normalize_video,
    augment_video_batch,
)
from selavi_tpu.ops.sinkhorn_pallas import fused_sk_iteration

__all__ = [
    "logfbank_batch",
    "normalize_video",
    "augment_video_batch",
    "fused_sk_iteration",
]

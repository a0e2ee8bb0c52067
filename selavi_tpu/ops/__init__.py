from selavi_tpu.ops.logmel import logfbank_batch
from selavi_tpu.ops.preprocess import (
    normalize_video,
    augment_video_batch,
)

__all__ = ["logfbank_batch", "normalize_video", "augment_video_batch"]

from selavi_tpu.models.av_model import AVModel, load_model
from selavi_tpu.models.r2plus1d import R2Plus1D18, VIDEO_FEATURE_DIMS
from selavi_tpu.models.resnet_audio import AudioResNet
from selavi_tpu.models.heads import MLPHead, HeadStack

__all__ = [
    "AVModel",
    "load_model",
    "R2Plus1D18",
    "AudioResNet",
    "MLPHead",
    "HeadStack",
    "VIDEO_FEATURE_DIMS",
]

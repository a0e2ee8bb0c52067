from selavi_tpu.models.av_model import AVModel, load_model
from selavi_tpu.models.r2plus1d import R2Plus1D18, VIDEO_FEATURE_DIMS
from selavi_tpu.models.resnet_audio import AudioResNet
from selavi_tpu.models.heads import MLPHead, HeadStack
from selavi_tpu.models.convert import (
    video_params_2d_to_3d,
    video_params_3d_to_2d,
)

__all__ = [
    "AVModel",
    "load_model",
    "R2Plus1D18",
    "AudioResNet",
    "MLPHead",
    "HeadStack",
    "VIDEO_FEATURE_DIMS",
    "video_params_2d_to_3d",
    "video_params_3d_to_2d",
]

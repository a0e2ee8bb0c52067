from selavi_tpu.utils.logger import create_logger, PDStats
from selavi_tpu.utils.meters import (
    AverageMeter,
    MovingAverage,
    QueueAverage,
    topk_accuracy,
    aggregate_video_accuracy,
)
from selavi_tpu.utils.experiment import initialize_exp, fix_random_seeds

__all__ = [
    "create_logger",
    "PDStats",
    "AverageMeter",
    "MovingAverage",
    "QueueAverage",
    "topk_accuracy",
    "aggregate_video_accuracy",
    "initialize_exp",
    "fix_random_seeds",
]

"""Training meters and accuracy helpers (numpy; no torch).

Capability parity with /root/reference/utils.py:286-374 (``AverageMeter``,
``MovingAverage``, ``QueueAverage``, ``accuracy``,
``aggregrate_video_accuracy``).
"""

from __future__ import annotations

import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class MovingAverage:
    def __init__(self, inertia: float = 0.9):
        self.inertia = inertia
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.val = 0.0

    def update(self, val):
        self.avg = self.inertia * self.avg + (1 - self.inertia) * val
        self.val = val


class QueueAverage:
    """Linear extrapolation from the last two values (reference utils.py:305)."""

    def __init__(self):
        self.queue = []
        self.val = 0.0

    def update(self, val):
        if len(self.queue) == 0:
            self.queue.append(val)
            self.val = val
        elif len(self.queue) == 1:
            self.queue.append(val)
            self.val = 2 * self.queue[1] - self.queue[0]
        else:
            self.queue.pop(0)
            self.queue.append(val)
            self.val = 2 * self.queue[1] - self.queue[0]


def topk_accuracy(output: np.ndarray, target: np.ndarray, topk=(1,)):
    """Precision@k in percent. output [B, K] scores, target [B] labels."""
    maxk = max(topk)
    pred = np.argsort(-output, axis=1)[:, :maxk]  # [B, maxk]
    correct = pred == target[:, None]
    res = []
    for k in topk:
        res.append(100.0 * correct[:, :k].any(axis=1).mean())
    return res


def aggregate_video_accuracy(softmaxes: dict, labels: dict, topk=(1,)):
    """Video-level accuracy from per-clip softmaxes.

    ``softmaxes[video_id]`` is a list of [K] arrays (one per sampled clip);
    clip scores are mean-aggregated per video before top-k
    (reference utils.py:354-374).
    """
    video_ids = list(softmaxes.keys())
    output = np.stack(
        [np.mean(np.stack(softmaxes[v]), axis=0) for v in video_ids]
    )
    target = np.array([labels[v] for v in video_ids])
    return topk_accuracy(output, target, topk)

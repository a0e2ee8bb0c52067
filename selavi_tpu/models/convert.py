"""Parameter conversion between the video tower's conv expressions.

R2Plus1D18 supports two mathematically-identical conv formulations
(``conv_impl='3d'|'2d'``, see r2plus1d.py). Their parameters differ only in
kernel rank:

    spatial  : (1, k, k, Ci, Co)  <->  (k, k, Ci, Co)
    temporal : (k, 1, 1, Ci, Co)  <->  (k, 1, Ci, Co)
    downsample: (1, 1, 1, Ci, Co) <->  (1, 1, Ci, Co)

On TPU v5e the 2D *forward* is ~3x faster while its backward is slower, so
training runs '3d' and forward-only consumers (SK feature aggregation, eval
dumps, retrieval) can convert a '3d' checkpoint to '2d' params with this
module and run the fast path. Conversion is a pure reshape — outputs are
bit-identical.
"""

from __future__ import annotations

import jax
import numpy as np


def _is_kernel(path) -> bool:
    return path and getattr(path[-1], "key", "") == "kernel"


def video_params_3d_to_2d(tree):
    """Squeeze the singleton kernel dims of every video-tower conv kernel.

    Works on the video tower subtree (``params['video_network']`` of an
    AVModel, or FinetuneModel's ``params['base']``). Non-kernel leaves (BN
    scales/biases, running stats) pass through unchanged.
    """

    def convert(path, leaf):
        if not _is_kernel(path):
            return leaf
        arr = np.asarray(leaf)
        if arr.ndim != 5:
            return leaf
        kt, kh, kw = arr.shape[:3]
        if kt == 1:  # spatial (1,k,k) or downsample (1,1,1) -> (k,k)/(1,1)
            return arr[0]
        if kh == 1 and kw == 1:  # temporal (k,1,1) -> (k,1)
            return arr[:, :, 0]
        raise ValueError(f"unexpected 3D kernel shape {arr.shape}")

    return jax.tree_util.tree_map_with_path(convert, tree)


def video_params_2d_to_3d(tree):
    """Inverse of :func:`video_params_3d_to_2d`."""

    def convert(path, leaf):
        if not _is_kernel(path):
            return leaf
        arr = np.asarray(leaf)
        if arr.ndim != 4:
            return leaf
        kh, kw = arr.shape[:2]
        if kw == 1 and kh > 1:  # temporal (k,1) -> (k,1,1)
            return arr[:, :, None]
        return arr[None]  # spatial (k,k) -> (1,k,k)

    return jax.tree_util.tree_map_with_path(convert, tree)

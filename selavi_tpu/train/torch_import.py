"""Import reference PyTorch checkpoints into selavi-tpu parameter trees.

The reference releases ``checkpoint.pth.tar`` files whose ``model`` entry is
a DDP state_dict over torchvision modules (/root/reference/model.py:169-275,
main.py:222-242). This module maps that layout onto our flax trees so the
published models can be evaluated with this framework's eval suite:

* video tower: torchvision ``VideoResNet`` keys
  (``stem.{0,1,3,4}``, ``layer{1-4}.{0,1}.conv{1,2}.0.{0,1,3}``,
  ``.conv{1,2}.1`` block BNs, ``.downsample.{0,1}``) -> r2plus1d.py
  module names;
* audio tower: torchvision ``ResNet`` keys (``conv1/bn1``,
  ``layer{1-4}.{i}.conv{1,2}/bn{1,2}/downsample``) -> resnet_audio.py;
* heads: per-name ``mlp_{v,a}{i}.block_forward.{2,4,8}`` MLPv2 modules ->
  the vmapped head stack (stacked along a leading head axis).

Conv weights transpose ``[O, I, *k] -> [*k, I, O]``; Linear ``[O, I] ->
[I, O]``. BatchNorm {weight,bias} -> {scale,bias} params and
{running_mean,running_var} -> batch_stats.

Reading the .pth requires torch (CPU build is available in this image);
everything else is numpy.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint; returns {key: ndarray} with the
    ``module.`` DDP prefix stripped (reference utils.py:264-274)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    out = {}
    for k, v in state.items():
        k = k.replace("module.", "")
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(sd, key):
    w = sd[key]  # [O, I, *k]
    ndim = w.ndim
    perm = tuple(range(2, ndim)) + (1, 0)
    return {"kernel": np.ascontiguousarray(np.transpose(w, perm))}


def _bn(sd, prefix) -> Tuple[dict, dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def _linear(sd, prefix, bias=True):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def import_video_tower(sd: Dict[str, np.ndarray], prefix="video_network.base."):
    """torchvision VideoResNet -> (params, batch_stats) for R2Plus1D18."""
    p: dict = {}
    bs: dict = {}

    def put_bn(name, tprefix):
        params, stats = _bn(sd, tprefix)
        p[name] = {"bn": params}
        bs[name] = {"bn": stats}

    p["stem_spatial"] = {"conv": _conv(sd, f"{prefix}stem.0.weight")}
    put_bn("stem_bn1", f"{prefix}stem.1")
    p["stem_temporal"] = {"conv": _conv(sd, f"{prefix}stem.3.weight")}
    put_bn("stem_bn2", f"{prefix}stem.4")

    for stage in range(1, 5):
        for block in range(2):
            t = f"{prefix}layer{stage}.{block}."
            name = f"layer{stage}_block{block}"
            entry = {
                "conv1": {
                    "spatial": {"conv": _conv(sd, t + "conv1.0.0.weight")},
                    "temporal": {"conv": _conv(sd, t + "conv1.0.3.weight")},
                },
                "conv2": {
                    "spatial": {"conv": _conv(sd, t + "conv2.0.0.weight")},
                    "temporal": {"conv": _conv(sd, t + "conv2.0.3.weight")},
                },
            }
            entry_bs: dict = {"conv1": {}, "conv2": {}}
            for conv_i in ("conv1", "conv2"):
                params, stats = _bn(sd, t + f"{conv_i}.0.1")
                entry[conv_i]["bn_mid"] = {"bn": params}
                entry_bs[conv_i]["bn_mid"] = {"bn": stats}
            # block BNs live inside the conv Sequentials (conv1.1 /
            # conv2.1) in torchvision VideoResNet — no bare bn1/bn2
            for bn_i, tname in (("bn1", "conv1.1"), ("bn2", "conv2.1")):
                params, stats = _bn(sd, t + tname)
                entry[bn_i] = {"bn": params}
                entry_bs[bn_i] = {"bn": stats}
            if t + "downsample.0.weight" in sd:
                params, stats = _bn(sd, t + "downsample.1")
                entry["downsample"] = {
                    "conv": _conv(sd, t + "downsample.0.weight"),
                    "bn": {"bn": params},
                }
                entry_bs["downsample"] = {"bn": {"bn": stats}}
            p[name] = entry
            bs[name] = entry_bs
    return p, bs


def import_audio_tower(
    sd: Dict[str, np.ndarray],
    prefix="audio_network.base.",
    stage_blocks=None,
):
    """torchvision ResNet -> (params, batch_stats) for AudioResNet.

    Handles BasicBlock (resnet9/18/34) AND Bottleneck (resnet50) layouts;
    both the block kind (``layer1.0.conv3`` present => Bottleneck) and the
    per-stage block counts are auto-detected from the state-dict keys when
    ``stage_blocks`` is None. Flax auto-names unnamed submodules in call
    order: stem ConvBN_0, then per block ConvBN_{i} in order conv1, conv2
    [, conv3][, downsample]."""
    p: dict = {}
    bs: dict = {}
    bottleneck = f"{prefix}layer1.0.conv3.weight" in sd
    if stage_blocks is None:
        stage_blocks = tuple(
            sum(
                1
                for b in range(64)
                if f"{prefix}layer{stage}.{b}.conv1.weight" in sd
            )
            for stage in range(1, 5)
        )

    def convbn(tconv, tbn):
        params, stats = _bn(sd, tbn)
        return (
            {"Conv_0": _conv(sd, tconv + ".weight"),
             "BatchNorm_0": params},
            {"BatchNorm_0": stats},
        )

    idx = 0

    def put(tconv, tbn):
        nonlocal idx
        name = f"ConvBN_{idx}"
        # ConvBN submodules are auto-named Conv_0 / BatchNorm_0 inside
        params, stats = convbn(tconv, tbn)
        p[name] = params
        bs[name] = stats
        idx += 1

    put(f"{prefix}conv1", f"{prefix}bn1")
    pairs = (("conv1", "bn1"), ("conv2", "bn2"))
    if bottleneck:
        pairs = pairs + (("conv3", "bn3"),)
    block_cls = "Bottleneck2D" if bottleneck else "BasicBlock2D"
    block_idx = 0
    for stage, nblocks in enumerate(stage_blocks, 1):
        for b in range(nblocks):
            t = f"{prefix}layer{stage}.{b}."
            # flax call order inside the block: ConvBN per conv/bn pair,
            # then the optional ConvBN(downsample)
            bname = f"{block_cls}_{block_idx}"
            inner_p: dict = {}
            inner_bs: dict = {}
            j = 0
            for conv_i, bn_i in pairs:
                params, stats = convbn(t + conv_i, t + bn_i)
                inner_p[f"ConvBN_{j}"] = params
                inner_bs[f"ConvBN_{j}"] = stats
                j += 1
            if t + "downsample.0.weight" in sd:
                params, stats = convbn(t + "downsample.0", t + "downsample.1")
                inner_p[f"ConvBN_{j}"] = params
                inner_bs[f"ConvBN_{j}"] = stats
            p[bname] = inner_p
            bs[bname] = inner_bs
            block_idx += 1
    return p, bs


def import_heads(
    sd: Dict[str, np.ndarray], modality: str, headcount: int, use_mlp=True
):
    """Per-name mlp_{v,a}{i} MLPv2 modules -> stacked head params.

    MLPv2 Sequential indices (reference model.py:76-87): 2=hidden Linear
    (no bias), 4=BatchNorm1d, 8=final Linear. headcount==1 uses the bare
    ``mlp_v``/``mlp_a`` name (reference model.py:201-208).
    """
    tag = "v" if modality == "v" else "a"

    def head_prefix(i):
        if headcount == 1:
            return f"mlp_{tag}."
        return f"mlp_{tag}{i}."

    hidden_k, hidden_bn_s, hidden_bn_b = [], [], []
    bn_mean, bn_var = [], []
    proj_k, proj_b = [], []
    for i in range(headcount):
        hp = head_prefix(i)
        if use_mlp:
            hidden_k.append(sd[f"{hp}block_forward.2.weight"].T)
            hidden_bn_s.append(sd[f"{hp}block_forward.4.weight"])
            hidden_bn_b.append(sd[f"{hp}block_forward.4.bias"])
            bn_mean.append(sd[f"{hp}block_forward.4.running_mean"])
            bn_var.append(sd[f"{hp}block_forward.4.running_var"])
            proj_k.append(sd[f"{hp}block_forward.8.weight"].T)
            proj_b.append(sd[f"{hp}block_forward.8.bias"])
        else:
            proj_k.append(sd[f"{hp}weight"].T)
            proj_b.append(sd[f"{hp}bias"])

    if use_mlp:
        params = {
            "heads": {
                "hidden": {"kernel": np.stack(hidden_k)},
                "bn": {
                    "scale": np.stack(hidden_bn_s),
                    "bias": np.stack(hidden_bn_b),
                },
                "proj": {
                    "kernel": np.stack(proj_k),
                    "bias": np.stack(proj_b),
                },
            }
        }
        stats = {
            "heads": {
                "bn": {
                    "mean": np.stack(bn_mean),
                    "var": np.stack(bn_var),
                }
            }
        }
    else:
        params = {
            "heads": {
                "proj": {
                    "kernel": np.stack(proj_k),
                    "bias": np.stack(proj_b),
                }
            }
        }
        stats = {}
    return params, stats


def import_reference_checkpoint(
    path: str, headcount: int = 10, use_mlp: bool = True,
    audio_stage_blocks=None,
):
    """Full AVModel import: returns (params, batch_stats) numpy trees
    matching ``selavi_tpu.models.AVModel`` (conv_impl='3d')."""
    sd = load_torch_state_dict(path)
    vp, vbs = import_video_tower(sd)
    ap, abs_ = import_audio_tower(sd, stage_blocks=audio_stage_blocks)
    hv_p, hv_bs = import_heads(sd, "v", headcount, use_mlp)
    ha_p, ha_bs = import_heads(sd, "a", headcount, use_mlp)
    params = {
        "video_network": vp,
        "audio_network": ap,
        "heads_v": hv_p,
        "heads_a": ha_p,
    }
    batch_stats = {
        "video_network": vbs,
        "audio_network": abs_,
        "heads_v": hv_bs,
        "heads_a": ha_bs,
    }
    return params, batch_stats

"""Export selavi-tpu parameter trees to the reference PyTorch layout.

Inverse of :mod:`selavi_tpu.train.torch_import`: writes a
``checkpoint.pth.tar``-style file whose ``model`` entry is a DDP-prefixed
state_dict in the reference's torchvision naming
(/root/reference/model.py:169-275, main.py:222-242), so checkpoints trained
here can be evaluated (or finetuned) with the reference's own tools via its
``load_model_parameters`` (/root/reference/utils.py:264-274).

Key layout transforms (each the exact inverse of torch_import):

* conv kernels ``[*k, I, O] -> [O, I, *k]``; Linear ``[I, O] -> [O, I]``;
* BatchNorm {scale,bias} -> {weight,bias}, batch_stats {mean,var} ->
  {running_mean,running_var}; a zero ``num_batches_tracked`` is emitted so
  strict ``load_state_dict`` calls see the full torchvision key set;
* the vmapped head stacks ``[H, ...]`` unstack to per-name
  ``mlp_{v,a}{i}.block_forward.{2,4,8}`` MLPv2 modules.

Only applies to reference-parity architectures: video towers built with
``--tpu_aligned_midplanes`` have intentionally different kernel shapes and
cannot load into torchvision's r2plus1d_18 (the exporter warns but still
writes). Video-tower params in the '2d' conv expression are converted to
'3d' layout first (pure reshape, bit-identical — models/convert.py).

The checkpoint schema mirrors the reference's
``{epoch, dist, model, selflabels}`` (optimizer state is not exported:
cross-framework *resume* is out of scope, see docs/DEVIATIONS.md; the
reference's eval tools only read ``model``).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _conv_out(kernel) -> np.ndarray:
    """[*k, I, O] -> [O, I, *k] (inverse of torch_import._conv)."""
    k = np.asarray(kernel)
    nd = k.ndim
    perm = (nd - 1, nd - 2) + tuple(range(nd - 2))
    return np.ascontiguousarray(np.transpose(k, perm).astype(np.float32))


def _put_bn(sd: dict, tprefix: str, params: dict, stats: dict):
    sd[f"{tprefix}.weight"] = np.asarray(params["scale"], np.float32)
    sd[f"{tprefix}.bias"] = np.asarray(params["bias"], np.float32)
    sd[f"{tprefix}.running_mean"] = np.asarray(stats["mean"], np.float32)
    sd[f"{tprefix}.running_var"] = np.asarray(stats["var"], np.float32)
    sd[f"{tprefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_video_tower(
    params: dict, batch_stats: dict, prefix: str = "video_network.base."
) -> Dict[str, np.ndarray]:
    """R2Plus1D18 trees ('3d' conv layout) -> torchvision VideoResNet keys."""
    sd: Dict[str, np.ndarray] = {}
    sd[f"{prefix}stem.0.weight"] = _conv_out(
        params["stem_spatial"]["conv"]["kernel"]
    )
    _put_bn(sd, f"{prefix}stem.1", params["stem_bn1"]["bn"],
            batch_stats["stem_bn1"]["bn"])
    sd[f"{prefix}stem.3.weight"] = _conv_out(
        params["stem_temporal"]["conv"]["kernel"]
    )
    _put_bn(sd, f"{prefix}stem.4", params["stem_bn2"]["bn"],
            batch_stats["stem_bn2"]["bn"])

    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_block{block}"
            t = f"{prefix}layer{stage}.{block}."
            entry, entry_bs = params[name], batch_stats[name]
            for conv_i in ("conv1", "conv2"):
                sd[t + f"{conv_i}.0.0.weight"] = _conv_out(
                    entry[conv_i]["spatial"]["conv"]["kernel"]
                )
                _put_bn(sd, t + f"{conv_i}.0.1",
                        entry[conv_i]["bn_mid"]["bn"],
                        entry_bs[conv_i]["bn_mid"]["bn"])
                sd[t + f"{conv_i}.0.3.weight"] = _conv_out(
                    entry[conv_i]["temporal"]["conv"]["kernel"]
                )
            # torchvision wraps each factorized conv in a Sequential
            # (Conv2Plus1D, BN, ReLU) so the block BNs live at
            # conv1.1 / conv2.1 — there are no bare bn1/bn2 keys
            for bn_i, tname in (("bn1", "conv1.1"), ("bn2", "conv2.1")):
                _put_bn(sd, t + tname, entry[bn_i]["bn"],
                        entry_bs[bn_i]["bn"])
            if "downsample" in entry:
                sd[t + "downsample.0.weight"] = _conv_out(
                    entry["downsample"]["conv"]["kernel"]
                )
                _put_bn(sd, t + "downsample.1",
                        entry["downsample"]["bn"]["bn"],
                        entry_bs["downsample"]["bn"]["bn"])
    return sd


def export_audio_tower(
    params: dict,
    batch_stats: dict,
    prefix: str = "audio_network.base.",
    stage_blocks: Tuple[int, ...] = (1, 1, 1, 1),
) -> Dict[str, np.ndarray]:
    """AudioResNet trees -> torchvision ResNet keys.

    Handles BasicBlock (resnet9/18/34: conv1/bn1, conv2/bn2
    [, downsample]) and Bottleneck (resnet50: conv1..3/bn1..3
    [, downsample]) block layouts; the kind is detected from the flax
    block names."""
    sd: Dict[str, np.ndarray] = {}
    bottleneck = any(k.startswith("Bottleneck2D_") for k in params)
    block_cls = "Bottleneck2D" if bottleneck else "BasicBlock2D"
    pairs = [("conv1", "bn1"), ("conv2", "bn2")]
    if bottleneck:
        pairs.append(("conv3", "bn3"))

    def put_convbn(tree_p: dict, tree_bs: dict, tconv: str, tbn: str):
        sd[f"{tconv}.weight"] = _conv_out(tree_p["Conv_0"]["kernel"])
        _put_bn(sd, tbn, tree_p["BatchNorm_0"], tree_bs["BatchNorm_0"])

    put_convbn(params["ConvBN_0"], batch_stats["ConvBN_0"],
               f"{prefix}conv1", f"{prefix}bn1")
    block_idx = 0
    for stage, nblocks in enumerate(stage_blocks, 1):
        for b in range(nblocks):
            t = f"{prefix}layer{stage}.{b}."
            bname = f"{block_cls}_{block_idx}"
            inner_p, inner_bs = params[bname], batch_stats[bname]
            for j, (conv_i, bn_i) in enumerate(pairs):
                put_convbn(inner_p[f"ConvBN_{j}"], inner_bs[f"ConvBN_{j}"],
                           t + conv_i, t + bn_i)
            ds = f"ConvBN_{len(pairs)}"
            if ds in inner_p:
                put_convbn(inner_p[ds], inner_bs[ds],
                           t + "downsample.0", t + "downsample.1")
            block_idx += 1
    return sd


def export_heads(
    params: dict,
    batch_stats: dict,
    modality: str,
    headcount: int,
    use_mlp: bool = True,
) -> Dict[str, np.ndarray]:
    """Stacked head params [H, ...] -> per-name mlp_{v,a}{i} modules.

    MLPv2 Sequential indices per reference model.py:76-87: 2 = hidden
    Linear (no bias), 4 = BatchNorm1d, 8 = final Linear; headcount==1
    drops the index suffix (reference model.py:201-208).
    """
    tag = "v" if modality == "v" else "a"
    heads = params["heads"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(headcount):
        hp = f"mlp_{tag}{i}." if headcount > 1 else f"mlp_{tag}."
        if use_mlp:
            sd[f"{hp}block_forward.2.weight"] = np.ascontiguousarray(
                np.asarray(heads["hidden"]["kernel"][i], np.float32).T
            )
            sd[f"{hp}block_forward.4.weight"] = np.asarray(
                heads["bn"]["scale"][i], np.float32
            )
            sd[f"{hp}block_forward.4.bias"] = np.asarray(
                heads["bn"]["bias"][i], np.float32
            )
            bn_stats = batch_stats["heads"]["bn"]
            sd[f"{hp}block_forward.4.running_mean"] = np.asarray(
                bn_stats["mean"][i], np.float32
            )
            sd[f"{hp}block_forward.4.running_var"] = np.asarray(
                bn_stats["var"][i], np.float32
            )
            sd[f"{hp}block_forward.4.num_batches_tracked"] = np.asarray(
                0, np.int64
            )
            sd[f"{hp}block_forward.8.weight"] = np.ascontiguousarray(
                np.asarray(heads["proj"]["kernel"][i], np.float32).T
            )
            sd[f"{hp}block_forward.8.bias"] = np.asarray(
                heads["proj"]["bias"][i], np.float32
            )
        else:
            sd[f"{hp}weight"] = np.ascontiguousarray(
                np.asarray(heads["proj"]["kernel"][i], np.float32).T
            )
            sd[f"{hp}bias"] = np.asarray(heads["proj"]["bias"][i],
                                         np.float32)
    return sd


def _video_tower_is_2d(video_params: dict) -> bool:
    k = np.asarray(video_params["stem_spatial"]["conv"]["kernel"])
    return k.ndim == 4


def export_reference_state_dict(
    params: dict,
    batch_stats: dict,
    headcount: int,
    use_mlp: bool = True,
    audio_stage_blocks: Tuple[int, ...] = (1, 1, 1, 1),
    ddp_prefix: str = "module.",
) -> Dict[str, np.ndarray]:
    """Full AVModel trees -> a reference ``model`` state_dict (numpy)."""
    vp, vbs = params["video_network"], batch_stats["video_network"]
    if _video_tower_is_2d(vp):
        from selavi_tpu.models.convert import video_params_2d_to_3d

        vp = video_params_2d_to_3d(vp)
    stem = np.asarray(vp["stem_spatial"]["conv"]["kernel"])
    if stem.shape[-1] != 45:
        logger.warning(
            "video tower midplanes deviate from torchvision r2plus1d_18 "
            "(stem midplanes %d != 45; --tpu_aligned_midplanes?); the "
            "exported file will not load into the reference model",
            stem.shape[-1],
        )
    sd: Dict[str, np.ndarray] = {}
    sd.update(export_video_tower(vp, vbs))
    sd.update(export_audio_tower(
        params["audio_network"], batch_stats["audio_network"],
        stage_blocks=audio_stage_blocks,
    ))
    # linear heads (use_mlp=False) have no BN, so flax's batch_stats
    # collection carries no heads_v/heads_a entries
    sd.update(export_heads(params["heads_v"], batch_stats.get("heads_v", {}),
                           "v", headcount, use_mlp))
    sd.update(export_heads(params["heads_a"], batch_stats.get("heads_a", {}),
                           "a", headcount, use_mlp))
    if ddp_prefix:
        sd = {ddp_prefix + k: v for k, v in sd.items()}
    return sd


def save_reference_checkpoint(
    path: str,
    params: dict,
    batch_stats: dict,
    headcount: int,
    use_mlp: bool = True,
    audio_stage_blocks: Tuple[int, ...] = (1, 1, 1, 1),
    epoch: int = 0,
    selflabels: Optional[np.ndarray] = None,
    marginal_dists: Optional[np.ndarray] = None,
):
    """torch.save a reference-schema checkpoint.

    ``marginal_dists`` is our ``MarginalState.dists`` ``[H, K]`` cache;
    the reference stores it as a per-head list of ``[K, 1]`` fp64 cuda
    tensors (sk_utils.py:372-379) — exported as CPU tensors in that shape.
    """
    import torch

    sd = export_reference_state_dict(
        params, batch_stats, headcount, use_mlp, audio_stage_blocks
    )
    # np.array(copy=True): msgpack-restored arrays are non-writable views,
    # which torch.from_numpy rejects with a warning
    model_sd = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in
                sd.items()}
    dist = None
    if marginal_dists is not None:
        dist = [
            torch.from_numpy(
                np.ascontiguousarray(d, np.float64).reshape(-1, 1)
            )
            for d in np.asarray(marginal_dists)
        ]
    blob = {"epoch": int(epoch), "dist": dist, "model": model_sd}
    if selflabels is not None:
        blob["selflabels"] = torch.from_numpy(
            np.asarray(selflabels, np.int64)
        )
    torch.save(blob, path)


def _infer_audio_stage_blocks(audio_params: dict) -> Tuple[int, ...]:
    """Recover the audio ResNet's stage structure from its param keys.

    The flax tower names blocks flatly (``BasicBlock2D_{i}`` /
    ``Bottleneck2D_{i}``, models/resnet_audio.py:134-139); the
    reference's torchvision layout needs them regrouped into
    ``layer{1..4}.{b}``. Total block count identifies the arch
    (AUDIO_ARCHS: resnet9 (1,1,1,1), resnet18 (2,2,2,2), resnet34 AND
    resnet50 (3,4,6,3) — the 16-block counts coincide; the block kind is
    detected separately in export_audio_tower)."""
    if any(k.startswith("Bottleneck2D_", 0) for k in audio_params):
        nblocks = sum(
            1 for k in audio_params if k.startswith("Bottleneck2D_")
        )
        if nblocks != 16:
            raise ValueError(
                f"unrecognized bottleneck audio tower: {nblocks} blocks"
            )
        return (3, 4, 6, 3)
    nblocks = sum(
        1 for k in audio_params if k.startswith("BasicBlock2D_")
    )
    by_count = {4: (1, 1, 1, 1), 8: (2, 2, 2, 2), 16: (3, 4, 6, 3)}
    if nblocks not in by_count:
        raise ValueError(
            f"unrecognized audio tower: {nblocks} basic blocks"
        )
    return by_count[nblocks]


def export_our_checkpoint(ckpt_path: str, out_path: str):
    """Convert one of our ``checkpoint.msgpack`` files to reference .pth.

    Reads the raw pickled payload (train/checkpoint.py schema) without
    needing a model template: ``flax.serialization.msgpack_restore``
    rebuilds the device tree as plain nested dicts. Head count / MLP-ness
    are inferred from the head-stack shapes.
    """
    import pickle

    from flax import serialization

    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    device = serialization.msgpack_restore(payload["device"])
    params, batch_stats = device["params"], device["batch_stats"]
    heads_v = params["heads_v"]["heads"]
    headcount = int(np.asarray(heads_v["proj"]["kernel"]).shape[0])
    use_mlp = "hidden" in heads_v
    dists = (payload.get("dist") or {}).get("dists")
    audio_stage_blocks = _infer_audio_stage_blocks(
        params["audio_network"]
    )
    save_reference_checkpoint(
        out_path,
        params,
        batch_stats,
        headcount,
        use_mlp=use_mlp,
        audio_stage_blocks=audio_stage_blocks,
        epoch=int(payload.get("epoch", 0)),
        selflabels=payload.get("selflabels"),
        marginal_dists=dists,
    )
    logger.info("exported %s -> %s (headcount=%d, use_mlp=%s)",
                ckpt_path, out_path, headcount, use_mlp)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Export a selavi-tpu checkpoint to the reference's "
        "PyTorch .pth.tar layout (model/selflabels/dist/epoch)."
    )
    p.add_argument("checkpoint", help="path to checkpoint.msgpack")
    p.add_argument("output", help="output .pth.tar path")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    export_our_checkpoint(args.checkpoint, args.output)


if __name__ == "__main__":
    main()

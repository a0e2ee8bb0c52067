#!/usr/bin/env python
"""Nearest-neighbor video retrieval CLI (reference
/root/reference/video_retrieval.py + src/retrieval_utils.py:446-519 surface).
Runs the v-v task: truncated video tower features, 10 clips/video,
per-video averaging, Recall@{1,5,10,20,50}."""

from __future__ import annotations

import argparse
import pickle

import jax
import numpy as np

from selavi_tpu.config import bool_flag
from selavi_tpu.data.loader import DataLoader, device_prefetch
from selavi_tpu.eval.retrieval import (
    average_features,
    collect_features,
    make_retrieval_encode_fn,
    retrieval,
)
from selavi_tpu.models import load_model
from selavi_tpu.parallel.mesh import data_sharding, make_mesh
from selavi_tpu.train.checkpoint import load_model_parameters
from selavi_tpu.train.optim import make_optimizer
from selavi_tpu.train.state import create_train_state


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Video retrieval")
    parser.register("type", "bool", bool_flag)
    parser.add_argument("--dataset", default="ucf101", type=str)
    parser.add_argument("--root_dir", type=str, default="/path/to/dataset")
    parser.add_argument("--data_path", type=str, default="datasets/data")
    parser.add_argument("--fold", default=1, type=int)
    parser.add_argument("--weights_path", default="", type=str)
    parser.add_argument("--clip_len", default=32, type=int)
    parser.add_argument("--steps_bet_clips", default=1, type=int)
    parser.add_argument("--train_clips_per_video", default=10, type=int)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--workers", default=8, type=int)
    parser.add_argument("--headcount", default=10, type=int)
    parser.add_argument("--num_clusters", default=309, type=int)
    parser.add_argument("--pool_op", default="max", choices=["max", "avg"])
    parser.add_argument("--norm_feats", default="True", type="bool")
    parser.add_argument("--task", default="v-v", type=str)
    parser.add_argument("--feature_cache", default=None, type=str,
                        help="optional pickle cache path for features")
    parser.add_argument("--num_data_samples", default=None, type=int)
    parser.add_argument("--tpu_aligned_midplanes", type="bool",
                        default="False")
    # audio-frontend config for PCM-emitting datasets (must match the
    # flags the checkpoint was trained with; defaults mirror get_clusters)
    parser.add_argument("--aud_sample_rate", type=int, default=48000)
    parser.add_argument("--aud_spec_type", type=int, default=2)
    parser.add_argument("--z_normalize", type="bool", default="True")
    parser.add_argument("--dual_data", type="bool", default="False",
                        help="checkpoint was trained with --dual_data "
                             "(2-channel audio stem); eval specs are "
                             "duplicated across both channels")
    return parser.parse_args(argv)


def build_datasets(args):
    need_audio = args.task != "v-v"
    if args.dataset == "synthetic":
        from selavi_tpu.data.synthetic import SyntheticAVDataset

        train = SyntheticAVDataset(
            num_samples=args.num_data_samples or 64,
            num_frames=args.clip_len, mode="train",
        )
        test = SyntheticAVDataset(
            num_samples=args.num_data_samples or 64,
            num_frames=args.clip_len, mode="test", seed=1,
        )
        return train, test
    from selavi_tpu.data.dataset import AVideoDataset

    train = AVideoDataset(
        ds_name=args.dataset, root_dir=args.root_dir, mode="train",
        num_frames=args.clip_len, sample_rate=args.steps_bet_clips,
        num_train_clips=args.train_clips_per_video, train_crop_size=112,
        fold=args.fold, decode_audio=need_audio,
        path_to_data_dir=args.data_path,
    )
    test = AVideoDataset(
        ds_name=args.dataset, root_dir=args.root_dir, mode="test",
        num_frames=args.clip_len, sample_rate=args.steps_bet_clips,
        num_spatial_crops=1, num_ensemble_views=args.train_clips_per_video,
        test_crop_size=112, fold=args.fold, decode_audio=need_audio,
        path_to_data_dir=args.data_path,
    )
    return train, test


def main(argv=None):
    args = parse_args(argv)

    # feature cache first (reference retrieval_utils.py:260-315
    # load_or_get_features): a hit skips dataset scanning, model build,
    # and checkpoint load entirely — the cache exists so re-runs work on
    # machines without the raw video tree
    need_audio = args.task != "v-v"
    # cached features are CONFIG-DEPENDENT: audio tasks use 512-d GAP
    # (dimension-compatible with audio features), v-v the pooled
    # truncated tower, and --norm_feats is baked into the cached values
    # by average_features — a cache from another config must not be
    # silently reused
    feature_kind = (
        ("gap" if need_audio else f"pooled:{args.pool_op}")
        + f"|norm:{bool(args.norm_feats)}"
    )
    feats = None
    if args.feature_cache:
        import os

        if os.path.isfile(args.feature_cache):
            with open(args.feature_cache, "rb") as fh:
                feats = pickle.load(fh)
            cached_kind = feats.pop("_video_feature_kind", None)
            if cached_kind != feature_kind:
                print(
                    f"cache holds '{cached_kind}' video features but task "
                    f"{args.task} needs '{feature_kind}'; recomputing"
                )
                feats = None
            else:
                print(f"loaded cached features from {args.feature_cache}")
    if feats is not None:
        return _retrieval_report(args, feats)

    train_ds, test_ds = build_datasets(args)

    model = load_model(
        headcount=args.headcount, num_classes=args.num_clusters,
        midplanes_mode="aligned" if args.tpu_aligned_midplanes else "parity",
    )
    example = train_ds.get_example(0, np.random.default_rng(0))
    spec_shape = example.get("audio", np.zeros((40, 99), np.float32)).shape
    # dual_data checkpoints have a 2-channel audio stem; eval datasets
    # yield single clips, so init with 2 channels and tile at encode time
    # (mirrors get_clusters.py)
    audio_channels = 2 if args.dual_data else 1
    state = create_train_state(
        model, make_optimizer(0.01, 0.0), jax.random.PRNGKey(0),
        (2,) + example["video"].shape,
        (2,) + spec_shape + (audio_channels,),
    )
    if args.weights_path and args.weights_path != "None":
        state = load_model_parameters(state, args.weights_path)

    mesh = make_mesh()
    dsh = data_sharding(mesh)
    encode_fn = joint_encode = None
    if need_audio:
        # audio-involving tasks compare video and audio features, so both
        # come from the full model's 512-d GAP features in ONE apply
        # (reference get_features with get_audio=True calls
        # model(video, audio)); the truncated pooled tower is the
        # video-only v-v path
        from selavi_tpu.data.factory import audio_cfg_from_args
        from selavi_tpu.train.step import make_encode_fn

        enc = make_encode_fn(
            model, audio_cfg=audio_cfg_from_args(args),
            audio_channels=2 if args.dual_data else None,
        )
        joint_encode = lambda v, a: enc(
            state.params, state.batch_stats, v, a
        )
    else:
        encode = make_retrieval_encode_fn(model, pool_op=args.pool_op)
        encode_fn = lambda v: encode(state.params, state.batch_stats, v)

    # pod-sharded feature extraction: each process encodes a strided
    # subset (reference get_features sharding, retrieval_utils.py:150-197);
    # collect_features gathers + dedups, so every process ends with the
    # identical full feature table
    n_proc = jax.process_count()
    feats = {}
    for split, ds in (("train", train_ds), ("val", test_ds)):
        loader = DataLoader(ds, batch_size=args.batch_size,
                            shuffle=False, drop_last=False,
                            num_workers=args.workers,
                            rank=jax.process_index(), world_size=n_proc)
        from selavi_tpu.data.loader import decode_wire_batches

        out = collect_features(
            encode_fn,
            decode_wire_batches(
                device_prefetch(iter(loader), sharding=dsh,
                                mesh=mesh if n_proc > 1 else None)
            ),
            joint_encode_fn=joint_encode,
        )
        f, v, l = out[:3]
        feats[split] = average_features(
            f, v, l, norm_feats=args.norm_feats
        )
        if need_audio:
            af, av, al = average_features(
                out[3], v, l, norm_feats=args.norm_feats
            )
            feats[split + "_audio"] = (af, av, al)
    if args.feature_cache and jax.process_index() == 0:
        # one dump of the FULL dict (incl. *_audio entries and the
        # feature kind) — a second trimmed dump here would strip the
        # audio features a later a-v run needs
        with open(args.feature_cache, "wb") as fh:
            pickle.dump(
                dict(feats, _video_feature_kind=feature_kind), fh
            )
    return _retrieval_report(args, feats)


def _retrieval_report(args, feats):
    from selavi_tpu.eval.retrieval import select_task_features

    tf, _, tl = feats["train"]
    vf, _, vl = feats["val"]
    ta = feats.get("train_audio", (None,))[0]
    va = feats.get("val_audio", (None,))[0]
    feat_train, feat_val = select_task_features(args.task, tf, ta, vf, va)
    recalls = retrieval(feat_train, tl, feat_val, vl)
    print({f"R@{k}": round(v, 2) for k, v in recalls.items()})
    return recalls


if __name__ == "__main__":
    main()

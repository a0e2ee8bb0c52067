#!/usr/bin/env python
"""Cluster-assignment dump CLI (reference /root/reference/get_clusters.py
surface): load a checkpoint, run center-crop inference over the dataset,
dump [PS_v_heads, labels, PS_a_heads]."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from selavi_tpu.config import bool_flag
from selavi_tpu.data.dataset import NUM_CLUSTERS
from selavi_tpu.data.loader import (
    DataLoader,
    decode_wire_batches,
    device_prefetch,
)
from selavi_tpu.eval.get_clusters import dump_cluster_matrices
from selavi_tpu.models.resnet_audio import AUDIO_ARCHS
from selavi_tpu.models import load_model
from selavi_tpu.parallel.mesh import data_sharding, make_mesh
from selavi_tpu.train.checkpoint import load_model_parameters
from selavi_tpu.train.optim import make_optimizer
from selavi_tpu.train.state import create_train_state
from selavi_tpu.train.step import make_encode_fn, make_head_logits_fn


def parse_args(argv=None):
    from selavi_tpu.data.factory import add_dataset_flags

    parser = argparse.ArgumentParser(description="Get cluster assignments")
    parser.register("type", "bool", bool_flag)
    add_dataset_flags(parser)
    parser.add_argument("--weights_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, default="ps_matrices.pkl")
    parser.add_argument("--headcount", type=int, default=10)
    parser.add_argument("--aud_base_arch", type=str, default="resnet9",
                        help="audio tower arch the checkpoint was trained "
                             "with (reference get_clusters.py:224)")
    parser.add_argument("--use_mlp", type="bool", default="True")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--tpu_aligned_midplanes", type="bool",
                        default="False",
                        help="set to true for checkpoints trained with "
                             "MXU-aligned midplane widths")
    parser.add_argument("--dual_data", type="bool", default="False",
                        help="checkpoint was trained with --dual_data "
                             "(2-channel audio stem); eval specs are "
                             "duplicated across both channels")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    k = args.mlp_dim or NUM_CLUSTERS.get(args.ds_name, 309)

    from selavi_tpu.data.factory import (
        audio_cfg_from_args,
        build_dataset,
        example_shapes,
    )

    dataset = build_dataset(args, mode=args.mode, eval_mode=True)

    model = load_model(
        headcount=args.headcount, num_classes=k, use_mlp=args.use_mlp,
        aud_base_arch=args.aud_base_arch,
        midplanes_mode="aligned" if args.tpu_aligned_midplanes else "parity",
    )
    video_shape, audio_shape = example_shapes(args, dataset)
    if args.dual_data:
        # eval datasets yield single clips; the dual-trained stem still
        # needs its 2-channel init shape (specs are tiled at encode time)
        audio_shape = audio_shape[:-1] + (2,)
    tx = make_optimizer(0.01, 0.0)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), video_shape, audio_shape,
    )
    if args.weights_path.endswith((".pth", ".pth.tar")):
        # reference PyTorch checkpoint -> flax trees
        from selavi_tpu.train.torch_import import import_reference_checkpoint

        params, batch_stats = import_reference_checkpoint(
            args.weights_path, headcount=args.headcount,
            use_mlp=args.use_mlp,
        )
        import jax.numpy as jnp

        state = state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        )
    elif args.weights_path and args.weights_path != "None":
        state = load_model_parameters(state, args.weights_path)
    # else: random init (smoke/regression runs without a checkpoint)

    mesh = make_mesh()
    dsh = data_sharding(mesh)
    encode = make_encode_fn(
        model, audio_cfg=audio_cfg_from_args(args),
        audio_channels=2 if args.dual_data else None,
    )
    head_logits = make_head_logits_fn(model)

    # pod-sharded inference (reference get_clusters.py:98-147,257-265):
    # each process decodes a strided subset (--batch_size is per process),
    # batches assemble into globally-sharded arrays, features stay
    # row-sharded, process 0 writes the pickle
    n_proc = jax.process_count()
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        drop_last=False, num_workers=args.workers,
                        rank=jax.process_index(), world_size=n_proc)
    batches = decode_wire_batches(
        device_prefetch(iter(loader), sharding=dsh,
                        mesh=mesh if n_proc > 1 else None)
    )

    with mesh:
        dump_cluster_matrices(
            lambda v, a: encode(state.params, state.batch_stats, v, a),
            lambda f, m: head_logits(state.params, state.batch_stats, f, m),
            batches,
            len(dataset),
            args.output_path,
            sharding=dsh if n_proc > 1 else None,
            feat_dim_a=AUDIO_ARCHS[args.aud_base_arch][2],
        )
    if jax.process_index() == 0:
        print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()

"""End-to-end smoke: the full SeLaVi loop (BN warmup -> train -> scheduled
SK re-clustering -> checkpoint -> resume) on a synthetic AV dataset over an
8-device CPU mesh — the JAX-native stand-in for multi-node validation
(SURVEY.md §4)."""

import numpy as np
import pytest

from selavi_tpu.config import parse_arguments
from selavi_tpu.data.synthetic import SyntheticAVDataset
from selavi_tpu.train.loop import Trainer

# full fit() loops on the 8-device mesh — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


def make_args(tmp_path, **over):
    argv = [
        "--ds_name", "synthetic",
        "--num_data_samples", "32",
        "--num_frames", "4",
        "--train_crop_size", "32",
        "--num_sec_aud", "1",
        "--aud_sample_rate", "24000",
        "--aud_spec_type", "1",
        "--epochs", "1",
        "--batch_size", "1",  # per device; global = 8 on the CPU mesh
        "--base_lr", "0.01",
        "--warmup_epochs", "2",
        "--nopts", "2",
        "--headcount", "2",
        "--mlp_dim", "8",
        "--ind_groups", "1",
        "--match", "true",
        "--distribution", "gauss",
        "--workers", "0",
        "--compute_dtype", "float32",
        "--bn_warmup_batches", "2",
        "--dump_path", str(tmp_path),
    ]
    for k, v in over.items():
        argv += [f"--{k}", str(v)]
    args = parse_arguments().parse_args(argv)
    return args


def make_dataset(args):
    return SyntheticAVDataset(
        num_samples=args.num_data_samples,
        num_classes=4,
        num_frames=args.num_frames,
        crop_size=args.train_crop_size,
        num_sec=args.num_sec_aud,
        aud_sample_rate=args.aud_sample_rate,
        aud_spec_type=args.aud_spec_type,
        seed=args.seed,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("smoke")
    args = make_args(tmp_path)
    dataset = make_dataset(args)
    trainer = Trainer(args, dataset)
    history = trainer.fit()
    return args, dataset, trainer, history, tmp_path


def test_full_loop_runs_and_labels_assigned(trained):
    args, dataset, trainer, history, _ = trained
    # SK ran at least once: labels no longer all-zero
    assert trainer.sl_state.sk_counter >= 1
    labels = trainer.sl_state.selflabels
    assert labels.shape == (32, 2)
    assert labels.max() > 0
    # loss was recorded and finite
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses and np.isfinite(losses).all()


def test_gauss_marginals_created_and_cached(trained):
    _, _, trainer, _, _ = trained
    dists = trainer.sl_state.marginals.dists
    assert dists is not None
    assert dists.shape == (2, 8)


def test_checkpoint_resume_round_trip(trained):
    args, dataset, trainer, _, tmp_path = trained
    import os

    assert os.path.isfile(os.path.join(str(tmp_path), "checkpoint.msgpack"))
    # a fresh trainer resumes: epoch advances past 0, selflabels restored
    args2 = make_args(tmp_path, epochs=1)
    trainer2 = Trainer(args2, dataset)
    start = trainer2.resume()
    assert start == 1
    np.testing.assert_array_equal(
        trainer2.sl_state.selflabels, trainer.sl_state.selflabels
    )
    d1 = trainer.sl_state.marginals.dists
    d2 = trainer2.sl_state.marginals.dists
    np.testing.assert_allclose(d1, d2)
    # params restored bit-exact
    import jax

    p1 = jax.device_get(trainer.state.params)
    p2 = jax.device_get(trainer2.state.params)
    leaves1, leaves2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_sharded_over_mesh(trained):
    _, _, trainer, _, _ = trained
    import jax

    assert trainer.mesh.devices.size == len(jax.devices())
    batch = next(iter(trainer._device_batches()))
    shard_counts = {
        d.device for d in batch["video"].addressable_shards
    }
    assert len(shard_counts) == trainer.mesh.devices.size


def test_model_axis_head_sharding(tmp_path):
    """2D ('data','model') mesh: head stacks shard over the model axis
    (independent heads = expert axis), tower stays replicated, training
    and SK still run."""
    import jax

    args = make_args(tmp_path, model_axis=2, headcount=2, epochs=1)
    dataset = make_dataset(args)
    trainer = Trainer(args, dataset)
    assert dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)) \
        == {"data": 4, "model": 2}

    proj = trainer.state.params["heads_v"]["heads"]["proj"]["kernel"]
    assert proj.shape[0] == 2  # [H, ...]
    # sharded over 'model': each shard holds 1 head
    shard_shapes = {s.data.shape for s in proj.addressable_shards}
    assert shard_shapes == {(1,) + proj.shape[1:]}
    # tower params replicated: every shard is the full array
    stem = trainer.state.params["video_network"]["stem_spatial"]["conv"]["kernel"]
    assert {s.data.shape for s in stem.addressable_shards} == {stem.shape}

    history = trainer.fit()
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses and np.isfinite(losses).all()
    assert trainer.sl_state.sk_counter >= 1


def test_async_checkpoint_roundtrip(tmp_path):
    """Async background checkpoint write produces a resumable file,
    flushed by wait_for_pending_checkpoint / restore."""
    import jax

    from selavi_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from selavi_tpu.train.optim import make_optimizer
    from selavi_tpu.train.state import (
        SelfLabelState,
        create_train_state,
    )
    from selavi_tpu.models import load_model

    model = load_model(headcount=2, num_classes=4)
    tx = make_optimizer(0.01, 0.0)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (2, 2, 32, 32, 3),
        (2, 40, 51, 1),
    )
    sl = SelfLabelState.init(8, 2)
    sl.selflabels[:] = 3
    sl.sk_counter = 7
    save_checkpoint(str(tmp_path), state, sl, epoch=1, async_write=True)

    state2 = create_train_state(
        model, tx, jax.random.PRNGKey(1), (2, 2, 32, 32, 3),
        (2, 40, 51, 1),
    )
    state2, sl2, start = restore_checkpoint(
        str(tmp_path), state2, SelfLabelState.init(8, 2)
    )
    assert start == 2 and sl2.sk_counter == 7
    np.testing.assert_array_equal(sl2.selflabels, sl.selflabels)
    a = jax.tree.leaves(jax.device_get(state.params))
    b = jax.tree.leaves(jax.device_get(state2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_data_echoing(tmp_path):
    """--data_echo N: each loaded batch yields N train steps (data echoing,
    arXiv:1907.05550), schedules scale with the echoed batches_per_epoch,
    and echoed steps reuse the same sample indices."""
    import numpy as np

    args = make_args(tmp_path, data_echo=3)
    dataset = make_dataset(args)
    trainer = Trainer(args, dataset)
    assert trainer.batches_per_epoch == len(trainer.loader) * 3

    trainer.loader.set_epoch(0)
    seen = [np.asarray(b["index"]) for b in trainer._device_batches()]
    assert len(seen) == len(trainer.loader) * 3
    for k in range(0, len(seen), 3):
        np.testing.assert_array_equal(seen[k], seen[k + 1])
        np.testing.assert_array_equal(seen[k], seen[k + 2])
    # distinct loaded batches still differ
    assert not np.array_equal(seen[0], seen[3])

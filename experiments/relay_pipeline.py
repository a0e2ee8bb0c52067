#!/usr/bin/env python
"""Isolate the end-to-end input-pipeline bottleneck on this dev environment.

Round-1 finding: with packed shards, Data ~0.54 s/step vs device ~0.09
s/step — end-to-end runs at a fraction of the step rate. Hypothesis: the
~19 MB/global-batch H2D transfer through the axon socket relay is the
irreducible cause (real TPU hosts feed chips over PCIe at GB/s).

This experiment measures, on the real chip:
  1. raw relay H2D bandwidth vs transfer size (device_put + forced
     materialization);
  2. whether H2D transfer overlaps device compute (put concurrent with a
     running step: wall ~= max(transfer, compute) vs sum);
  3. end-to-end clips/s over a packed shard at several prefetch depths and
     worker counts, against the device-resident step rate.

Run (default env, ONE process): python experiments/relay_pipeline.py
"""

import json
import sys
import time

import numpy as np


def main():
    pack_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_paper.pack"
    e2e_only = "--e2e-only" in sys.argv
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from selavi_tpu.data.loader import DataLoader, device_prefetch
    from selavi_tpu.data.packed import PackedAVDataset
    from selavi_tpu.models import load_model
    from selavi_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated_sharding,
    )
    from selavi_tpu.train.optim import make_optimizer
    from selavi_tpu.train.state import create_train_state
    from selavi_tpu.train.step import make_train_step

    from selavi_tpu.data.loader import (
        coalesced_device_batches,
        decode_wire_batches,
    )

    results = {}
    mesh = make_mesh()
    dsh, rep = data_sharding(mesh), replicated_sharding(mesh)

    def fence(x):
        # block_until_ready does not fence through the axon relay; a
        # device->host transfer of a dependent value does
        return float(jnp.sum(x[..., 0].astype(jnp.float32)[:1, :1]))

    # ---- 1. raw H2D bandwidth --------------------------------------
    sum1 = jax.jit(lambda x: x.astype(jnp.float32).sum())
    for mb in () if e2e_only else (1, 4, 18, 72):
        arr = np.random.randint(0, 255, (mb * 1024 * 1024,), np.uint8)
        x = jax.device_put(jnp.asarray(arr), dsh)
        float(sum1(x))  # warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            x = jax.device_put(jnp.asarray(arr), dsh)
            float(sum1(x))
        dt = (time.perf_counter() - t0) / reps
        results[f"h2d_{mb}MB_s"] = round(dt, 4)
        results[f"h2d_{mb}MB_MBps"] = round(mb / dt, 1)

    # ---- 2. transfer/compute overlap --------------------------------
    bs, t, c, h, k = 16, 30, 112, 10, 309
    model = load_model(headcount=h, num_classes=k, dtype=jnp.bfloat16,
                       midplanes_mode="aligned")
    tx = make_optimizer(0.01, 1e-5, multiplier=1.0, warmup_epochs=10,
                        batches_per_epoch=100)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (2, t, c, c, 3), (2, 257, 99, 1)
    )
    state = jax.device_put(state, rep)
    step = make_train_step(model, compute_dtype=jnp.bfloat16,
                           audio_cfg={"samplerate": 24000, "nfilt": 257})
    video_np = np.random.randint(0, 255, (bs, t, c, c, 3), np.uint8)
    pcm_np = (np.random.randn(bs, 24000) * 8000).astype(np.float32)
    labels = jax.device_put(
        jnp.zeros((bs, h), jnp.int32), dsh
    )
    batch_dev = {
        "video": jax.device_put(jnp.asarray(video_np), dsh),
        "audio_pcm": jax.device_put(jnp.asarray(pcm_np), dsh),
    }
    rng = jax.random.PRNGKey(1)
    with mesh:
        for _ in range(3):
            state, m = step(state, batch_dev, labels, rng)
        float(m["loss"])

    if not e2e_only:
      with mesh:
        # compute alone
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, batch_dev, labels, rng)
        float(m["loss"])
        step_s = (time.perf_counter() - t0) / 10
        results["step_s"] = round(step_s, 4)
        results["step_clips_s"] = round(bs / step_s, 1)

        # transfer alone (one global batch: video + pcm)
        t0 = time.perf_counter()
        for _ in range(5):
            nb = {
                "video": jax.device_put(jnp.asarray(video_np), dsh),
                "audio_pcm": jax.device_put(jnp.asarray(pcm_np), dsh),
            }
            fence(nb["video"])
        put_s = (time.perf_counter() - t0) / 5
        results["batch_put_s"] = round(put_s, 4)

        # interleaved: issue the put while the step runs on resident data
        t0 = time.perf_counter()
        for _ in range(5):
            state, m = step(state, batch_dev, labels, rng)  # async dispatch
            nb = {
                "video": jax.device_put(jnp.asarray(video_np), dsh),
                "audio_pcm": jax.device_put(jnp.asarray(pcm_np), dsh),
            }
            float(m["loss"])
            fence(nb["video"])
        both_s = (time.perf_counter() - t0) / 5
        results["step_plus_put_s"] = round(both_s, 4)
        results["overlap_efficiency"] = round(
            (step_s + put_s - both_s) / min(step_s, put_s), 3
        )

    # ---- 3. end-to-end over a packed shard ---------------------------
    ds = PackedAVDataset(pack_path, crop_size=112,
                         num_sec=1, sample_rate=24000)
    for coalesce in (False, True):
      for workers, depth in ((8, 2), (8, 4), (8, 8)):
        loader = DataLoader(ds, batch_size=bs, shuffle=True,
                            drop_last=True, num_workers=workers, seed=1)
        loader.set_epoch(depth)  # vary content across configs
        if coalesce:
            it = decode_wire_batches(coalesced_device_batches(
                iter(loader), sharding=dsh, depth=depth
            ))
        else:
            it = decode_wire_batches(
                device_prefetch(iter(loader), sharding=dsh, depth=depth)
            )
        with mesh:
            n_clips = 0
            t0 = time.perf_counter()
            for b in it:
                lb = labels[: b["video"].shape[0]]
                state, m = step(state, b, lb, rng)
                n_clips += int(b["video"].shape[0])
            float(m["loss"])
            dt = time.perf_counter() - t0
        tag = "co_" if coalesce else ""
        results[f"e2e_{tag}w{workers}_d{depth}_clips_s"] = round(
            n_clips / dt, 1
        )

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

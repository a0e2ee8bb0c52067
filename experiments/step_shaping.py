#!/usr/bin/env python
"""Gradient-accumulation batch shaping + remat on the flagship train step.

The r2 verdict noted two unexplored perf angles at the ~70 TFLOP/s conv
ceiling: (1) does splitting the per-chip batch into accumulated
micro-batches change XLA's conv tiling/fusion economics (smaller
activations, same effective batch), and (2) does rematerialization buy a
larger (and maybe better-tiled) per-step batch. This measures both
directly against the monolithic bs24/bs32 steps from bench.py's harness.

Effective throughput is reported as EFFECTIVE clips/s/chip: micro-steps
per wall second x micro-batch x micro-count. BN stats in the accumulated
variants update per micro-batch sequentially (the scan carries them),
which is what a real accumulation implementation would do.

Run (default env, ONE process; compiles through the relay are slow):
    python experiments/step_shaping.py
"""

import json
import time

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass
    import jax.numpy as jnp

    from selavi_tpu.models import load_model
    from selavi_tpu.train.optim import make_optimizer
    from selavi_tpu.train.state import create_train_state
    from selavi_tpu.train.step import (
        make_train_step,
        multihead_ce,
        prepare_audio,
    )
    from selavi_tpu.ops.preprocess import augment_video_batch

    import os

    H, K = 10, 309
    T = int(os.environ.get("SHAPING_T", 30))
    C = int(os.environ.get("SHAPING_C", 112))
    dtype = jnp.bfloat16
    model = load_model(
        headcount=H, num_classes=K, dtype=dtype, midplanes_mode="aligned"
    )
    tx = make_optimizer(0.01, 1e-5, multiplier=1.0, warmup_epochs=10,
                        batches_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    state0 = create_train_state(
        model, tx, rng, (2, T, C, C, 3), (2, 257, 99, 1)
    )

    def data(b):
        return (
            jnp.asarray(np.random.randint(0, 255, (b, T, C, C, 3), np.uint8)),
            jnp.asarray(np.random.randn(b, 257, 99, 1).astype(np.float32)),
            jnp.asarray(
                np.random.randint(0, K, (b, H)).astype(np.int32)
            ),
        )

    def make_accum_step(micro: int, remat: bool = False):
        """One optimizer update from `micro` sequential micro-batches.
        Input batch is [micro*mb, ...]; scan carries (grads sum, BN)."""

        def fwd(variables, vv, aa, dropout_rng):
            return model.apply(
                variables, vv, aa, train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )

        apply = jax.checkpoint(fwd) if remat else fwd

        def step(state, video_u8, audio, labels, rng):
            mb = video_u8.shape[0] // micro
            vids = video_u8.reshape((micro, mb) + video_u8.shape[1:])
            auds = audio.reshape((micro, mb) + audio.shape[1:])
            labs = labels.reshape((micro, mb) + labels.shape[1:])
            rngs = jax.random.split(rng, micro)

            def loss_fn(params, bstats, v, a, lb, r):
                aug_rng, dropout_rng = jax.random.split(r)
                vv = augment_video_batch(
                    v, aug_rng, flip=True, dtype=dtype
                )
                aa = prepare_audio(a, dtype)
                (lv, la), updates = apply(
                    {"params": params, "batch_stats": bstats},
                    vv, aa, dropout_rng,
                )
                loss = 0.5 * multihead_ce(lv, lb) + 0.5 * multihead_ce(
                    la, lb
                )
                return loss, updates["batch_stats"]

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(carry, xs):
                gsum, bstats, lsum = carry
                v, a, lb, r = xs
                (loss, new_bs), g = grad_fn(
                    state.params, bstats, v, a, lb, r
                )
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (gsum, new_bs, lsum + loss), None

            zero = jax.tree.map(
                lambda p: jnp.zeros_like(p, jnp.float32), state.params
            )
            (gsum, new_bs, lsum), _ = jax.lax.scan(
                body, (zero, state.batch_stats, jnp.float32(0.0)),
                (vids, auds, labs, rngs),
            )
            grads = jax.tree.map(lambda g: g / micro, gsum)
            new_state = state.apply_gradients(grads, new_bs)
            return new_state, {"loss": lsum / micro}

        return jax.jit(step, donate_argnums=(0,))

    def fresh_state():
        # each bench donates its state buffers; hand out a private copy
        return jax.tree.map(
            lambda x: jnp.array(x) if hasattr(x, "dtype") else x, state0
        )

    def bench_mono(b, steps=12, warmup=3):
        video, audio, labels = data(b)
        step = make_train_step(model, compute_dtype=dtype)
        state = fresh_state()
        batch = {"video": video, "audio": audio}
        try:
            for _ in range(warmup):
                state, m = step(state, batch, labels, rng)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step(state, batch, labels, rng)
            float(m["loss"])
            return steps * b / (time.perf_counter() - t0)
        except Exception as e:
            print(f"   failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None

    def bench_accum(micro, mb, steps=12, warmup=3, remat=False):
        video, audio, labels = data(micro * mb)
        step = make_accum_step(micro, remat=remat)
        state = fresh_state()
        try:
            for _ in range(warmup):
                state, m = step(state, video, audio, labels, rng)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step(state, video, audio, labels, rng)
            float(m["loss"])
            return steps * micro * mb / (time.perf_counter() - t0)
        except Exception as e:
            print(f"   failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None

    def bench_encode(b, steps=8, warmup=2):
        """SK-aggregation encode rate (eval-mode fwd, augmented) — the
        sk_phase bench showed this is 99.8% of the self-labeling phase;
        probes whether a larger aggregation batch beats the bs64 recipe."""
        from selavi_tpu.train.step import make_encode_fn

        video = jnp.asarray(
            np.random.randint(0, 255, (b, T, C, C, 3), np.uint8)
        )
        audio = jnp.asarray(
            np.random.randn(b, 257, 99, 1).astype(np.float32)
        )
        encode = make_encode_fn(model, compute_dtype=dtype, augment=True)
        st = fresh_state()
        try:
            for _ in range(warmup):
                fv, fa = encode(st.params, st.batch_stats, video, audio, rng)
            float(jnp.sum(fv))
            t0 = time.perf_counter()
            for _ in range(steps):
                fv, fa = encode(st.params, st.batch_stats, video, audio, rng)
            float(jnp.sum(fv))
            return steps * b / (time.perf_counter() - t0)
        except Exception as e:
            print(f"   failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None

    results = {}
    runs = [
        ("encode_bs64", lambda: bench_encode(64)),
        ("encode_bs128", lambda: bench_encode(128)),
        ("encode_bs256", lambda: bench_encode(256)),
        ("mono_bs24", lambda: bench_mono(24)),
        ("mono_bs32", lambda: bench_mono(32)),
        ("mono_bs48", lambda: bench_mono(48)),
        ("accum2_bs12", lambda: bench_accum(2, 12)),
        ("accum3_bs8", lambda: bench_accum(3, 8)),
        ("accum2_bs16", lambda: bench_accum(2, 16)),
        ("accum2_bs24", lambda: bench_accum(2, 24)),
        ("remat2_bs32", lambda: bench_accum(2, 32, remat=True)),
        ("remat_mono_bs64", lambda: bench_accum(1, 64, remat=True)),
    ]
    for tag, fn in runs:
        print(f"== {tag}", flush=True)
        v = fn()
        results[tag] = round(v, 1) if v else None
        print(f"   {tag}: {results[tag]} eff clips/s/chip", flush=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()

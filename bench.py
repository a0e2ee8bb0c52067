#!/usr/bin/env python
"""Throughput benchmark: SeLaVi train step clips/sec/chip on real hardware.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (SURVEY.md §6), so
the recorded baseline is this framework's own round-1 measurement on a
single TPU v5e chip (BASELINE.md). Flags allow probing other shapes.

Measured config (reference VGG-Sound recipe, scripts/master.sh:80-106):
R(2+1)D-18 + ResNet-9, 10 heads, 309 clusters, 30x112x112 video,
257x99 audio spectrograms, bf16 compute, per-chip batch 24 (the r2 flag
sweep measured bs24 +1.5% over bs16 — compute-saturated, and per-chip
batch must stay a multiple of 8: bs20 costs -16% to misaligned tiling).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Round-1 recorded single-chip (TPU v5e) throughput for the measured config
# (bs 16/chip, 30x112x112, 10 heads, K=309, bf16, MXU-aligned midplanes —
# the TPU-first flagship architecture; the reference-parity widths measure
# 136.4): measured 2026-08-16. Later rounds compare against this.
BASELINE_CLIPS_PER_SEC_PER_CHIP = 185.6

# Analytic fwd+bwd train-step FLOPs per clip at the flagship config
# (30x112x112 video, 257x99 audio, 10 heads, K=309), from XLA
# compiled-HLO cost analysis differenced over two batch sizes so
# batch-independent work drops out (experiments/step_flops.py, r4).
# Re-generate with that script if the architecture changes.
ANALYTIC_STEP_FLOPS_PER_CLIP = {
    "aligned": 423.02e9,  # MXU-aligned midplanes (flagship)
    "parity": 451.05e9,   # reference-parity widths
}
# TPU v5e bf16 peak per chip (public spec: 197 TFLOP/s bf16)
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--num_frames", type=int, default=30)
    p.add_argument("--crop", type=int, default=112)
    p.add_argument("--headcount", type=int, default=10)
    p.add_argument("--clusters", type=int, default=309)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--aligned_midplanes", type=lambda s: s.lower() in
                   ("1", "true", "yes"), default=True,
                   help="bench the MXU-aligned midplanes variant (the "
                        "TPU-first flagship architecture; pass false for "
                        "the reference-parity widths)")
    p.add_argument("--device_spec", action="store_true",
                   help="feed raw PCM and compute spectrograms on device")
    p.add_argument("--metric", type=str, default="train",
                   choices=["train", "sk", "sk_phase"],
                   help="train: clips/s/chip; sk: Sinkhorn iters/s at "
                        "VGG-Sound scale; sk_phase: amortized "
                        "self-labeling phase cost per SK step at paper "
                        "scale (ind_groups x full-dataset aggregation + "
                        "per-head solves)")
    args = p.parse_args()

    if args.metric == "sk":
        _bench_sk(args)
        return
    if args.metric == "sk_phase":
        _bench_sk_phase(args)
        return

    import jax

    # persistent compile cache: repeat bench runs skip XLA recompiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from selavi_tpu.models import load_model
    from selavi_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated_sharding,
    )
    from selavi_tpu.train.optim import make_optimizer
    from selavi_tpu.train.state import create_train_state
    from selavi_tpu.train.step import make_train_step

    n_chips = len(jax.devices())
    mesh = make_mesh()
    dsh, rep = data_sharding(mesh), replicated_sharding(mesh)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    model = load_model(
        headcount=args.headcount, num_classes=args.clusters, dtype=dtype,
        midplanes_mode="aligned" if args.aligned_midplanes else "parity",
    )
    b = args.batch_size * n_chips
    video = np.random.randint(
        0, 255, (b, args.num_frames, args.crop, args.crop, 3), np.uint8
    )
    if args.device_spec:
        audio = (np.random.randn(b, 24000) * 8000).astype(np.float32)
    else:
        audio = np.random.randn(b, 257, 99, 1).astype(np.float32)
    labels = np.random.randint(
        0, args.clusters, (b, args.headcount)
    ).astype(np.int32)

    tx = make_optimizer(0.01, 1e-5, multiplier=float(n_chips),
                        warmup_epochs=10, batches_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    # model init always sees the spectrogram shape (PCM is converted
    # inside the step)
    init_audio_shape = (2, 257, 99, 1)
    state = create_train_state(
        model, tx, rng, (2,) + video.shape[1:], init_audio_shape
    )
    state = jax.device_put(state, rep)
    batch = {
        "video": jax.device_put(jnp.asarray(video), dsh),
        "audio": jax.device_put(jnp.asarray(audio), dsh),
    }
    labels_d = jax.device_put(jnp.asarray(labels), dsh)
    step = make_train_step(
        model, compute_dtype=dtype,
        audio_cfg={"samplerate": 24000, "nfilt": 257} if args.device_spec
        else None,
    )

    with mesh:
        for _ in range(args.warmup):
            state, metrics = step(state, batch, labels_d, rng)
        # NOTE: block_until_ready does not synchronize through the axon
        # remote-TPU relay; a device->host transfer is the reliable fence.
        float(metrics["loss"])

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch, labels_d, rng)
        float(metrics["loss"])
        dt = time.perf_counter() - t0

    clips_per_sec = args.steps * b / dt
    per_chip = clips_per_sec / n_chips
    vs_baseline = (
        per_chip / BASELINE_CLIPS_PER_SEC_PER_CHIP
        if BASELINE_CLIPS_PER_SEC_PER_CHIP
        else 1.0
    )
    out = {
        "metric": "train_clips_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    out.update(efficiency_fields(
        per_chip, args.aligned_midplanes,
        (args.num_frames, args.crop, args.headcount, args.clusters),
    ))
    print(json.dumps(out))


def efficiency_fields(per_chip_clips_per_sec, aligned, shape_key):
    """Absolute efficiency (VERDICT r3 #4): effective TFLOP/s and MFU
    from the analytic per-clip step FLOPs. Only the flagship shape has a
    recorded constant — other shapes report clips/s alone."""
    if tuple(shape_key) != (30, 112, 10, 309):
        return {}
    key = "aligned" if aligned else "parity"
    tflops = (
        per_chip_clips_per_sec * ANALYTIC_STEP_FLOPS_PER_CLIP[key] / 1e12
    )
    return {
        "tflops_effective": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
    }


BASELINE_SK_ITERS_PER_SEC = 524.6  # XLA solver, r1 measurement


def _bench_sk(args):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from selavi_tpu.selflabel.sinkhorn import sinkhorn_knopp

    n, k = 170752, args.clusters
    rng = np.random.default_rng(0)
    log_ps = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((n, k)), jnp.float32), 1
    ) + jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((n, k)), jnp.float32), 1
    )
    log_r = jnp.full((k,), -jnp.log(jnp.float32(k)))
    use_pallas = jax.default_backend() == "tpu"
    res = sinkhorn_knopp(log_ps, log_r, use_pallas=use_pallas,
                         m_bf16=use_pallas)
    int(res.iters)
    t0 = time.perf_counter()
    res = sinkhorn_knopp(log_ps, log_r, use_pallas=use_pallas,
                         m_bf16=use_pallas)
    iters = int(res.iters)
    dt = time.perf_counter() - t0
    value = iters / dt
    print(
        json.dumps(
            {
                "metric": "sk_iters_per_sec",
                "value": round(value, 1),
                "unit": "iters/s",
                "vs_baseline": round(value / BASELINE_SK_ITERS_PER_SEC, 3),
            }
        )
    )


def _bench_sk_phase(args):
    """Amortized self-labeling phase cost at paper scale: a full SK step
    is ind_groups(2) x whole-dataset augmented aggregation + [H,N,K] head
    logits + headcount(10) per-head solves over [170752, K]. Reports
    seconds per SK step plus (in stderr detail) the share of total
    training time under the paper schedule (nopts=100 over 200 epochs =
    one SK step every 2 epochs; reference sk_utils.py:137-356)."""
    import sys

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from selavi_tpu.models import load_model
    from selavi_tpu.train.step import make_encode_fn, make_head_logits_fn
    from selavi_tpu.selflabel.sinkhorn import sinkhorn_knopp

    n_paper, k, h, ind_groups = 170752, args.clusters, args.headcount, 2
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = load_model(
        headcount=h, num_classes=k, dtype=dtype,
        midplanes_mode="aligned" if args.aligned_midplanes else "parity",
    )
    rng = jax.random.PRNGKey(0)
    # --sk_agg_batch recipe default: the fwd-only encode saturates later
    # than the train step (128 measured +16% over 64; step_shaping.py)
    bs = 128
    video = jnp.asarray(np.random.randint(
        0, 255, (bs, args.num_frames, args.crop, args.crop, 3), np.uint8
    ))
    audio = jnp.asarray(
        np.random.randn(bs, 257, 99, 1).astype(np.float32)
    )
    video0 = jnp.zeros((2,) + video.shape[1:], jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": rng}, video0,
        jnp.zeros((2, 257, 99, 1)), train=False,
    )
    params, bstats = variables["params"], variables["batch_stats"]

    # 1. aggregation encode rate (augmented eval-mode forward, the SK
    # aggregation workload)
    encode = make_encode_fn(model, compute_dtype=dtype, augment=True)
    fv, fa = encode(params, bstats, video, audio, rng)
    float(jnp.sum(fv))  # fence (see NOTE above about the axon relay)
    steps = max(args.steps // 2, 5)
    t0 = time.perf_counter()
    for _ in range(steps):
        fv, fa = encode(params, bstats, video, audio, rng)
    float(jnp.sum(fv))
    encode_rate = steps * bs / (time.perf_counter() - t0)

    # 2. head logits over the aggregated [N, 512] features, both
    # modalities (one [H, N, K] einsum each)
    head_logits = make_head_logits_fn(model)
    feats = jnp.asarray(
        np.random.randn(n_paper, 512).astype(np.float32)
    )
    lv = head_logits(params, bstats, feats, "v")
    float(jnp.sum(lv[0, 0]))
    t0 = time.perf_counter()
    lv = head_logits(params, bstats, feats, "v")
    la = head_logits(params, bstats, feats, "a")
    float(jnp.sum(lv[0, 0]) + jnp.sum(la[0, 0]))
    logits_sec = time.perf_counter() - t0

    # 3. one per-head solve at converged-instance iteration counts (~11
    # iters on real sharp instances, BASELINE.md r1): time a real solve
    # and scale to 11 iters
    nrng = np.random.default_rng(0)
    log_ps = jax.nn.log_softmax(
        jnp.asarray(nrng.standard_normal((n_paper, k)), jnp.float32), 1
    )
    log_r = jnp.full((k,), -jnp.log(jnp.float32(k)))
    use_pallas = jax.default_backend() == "tpu"
    res = sinkhorn_knopp(log_ps, log_r, use_pallas=use_pallas)
    int(res.iters)
    t0 = time.perf_counter()
    res = sinkhorn_knopp(log_ps, log_r, use_pallas=use_pallas)
    iters = max(int(res.iters), 1)
    solve_sec_11 = (time.perf_counter() - t0) / iters * 11.0

    sk_phase_sec = (
        ind_groups * (n_paper / encode_rate)
        + ind_groups * logits_sec
        + h * solve_sec_11
    )
    # share of wall time under the paper schedule: one SK step / 2 epochs
    epoch_sec = n_paper / BASELINE_CLIPS_PER_SEC_PER_CHIP
    overhead = sk_phase_sec / (sk_phase_sec + 2 * epoch_sec)
    print(
        f"sk_phase detail: encode {encode_rate:.1f} clips/s, "
        f"logits {logits_sec:.2f}s, solve(11 iters) {solve_sec_11:.2f}s, "
        f"overhead vs train {overhead:.1%} (paper schedule)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sk_phase_sec_per_step",
                "value": round(sk_phase_sec, 1),
                "unit": "s (N=170752, ind_groups=2, 10 heads)",
                "vs_baseline": round(overhead, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

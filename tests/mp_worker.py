"""Worker for the real multi-process regression test (test_multiprocess.py).

Run as: python mp_worker.py <process_id> <num_processes> <port> <n_samples>

Exercises, under a genuine 2-process jax.distributed CPU mesh, what the
8-device single-process tests cannot: per-process loader striding with
equal batch counts (a skew deadlocks SPMD), global batch assembly from
process-local shards (parallel/mesh.py::global_batch_from_local), and the
row-sharded Sinkhorn solve spanning processes.
"""

import os
import sys


def main():
    pid, nproc, port, n_samples = map(int, sys.argv[1:5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    # raised in-process collective timeouts: see mp_eval_worker.py
    # (1-core hosts starve the rendezvous; Gloo init needs _warm_gloo)
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )

    import jax

    # persistent compile cache: the second parametrized case (and reruns)
    # skip the expensive CPU model compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    from mp_eval_worker import _warm_gloo

    _warm_gloo()  # see mp_eval_worker: Gloo init at lockstep, not post-compile
    import jax.numpy as jnp
    import numpy as np

    from selavi_tpu.data.loader import DataLoader
    from selavi_tpu.parallel.mesh import (
        data_sharding,
        global_batch_from_local,
        make_mesh,
    )

    assert jax.process_count() == nproc
    mesh = make_mesh()
    n_dev = mesh.devices.size

    class Stub:
        def __len__(self):
            return n_samples

        def get_example(self, idx, rng):
            return {
                "video": np.full((2, 4, 4, 3), idx, np.uint8),
                "audio": np.zeros((4, 4), np.float32),
                "label": idx % 3,
                "index": idx,
                "vid_idx": idx,
            }

    # per-process batch = global batch / nproc; global batch = n_dev
    loader = DataLoader(
        Stub(), batch_size=n_dev // nproc, shuffle=True, drop_last=True,
        seed=5, rank=pid, world_size=nproc,
    )
    loader.set_epoch(2)
    batches = list(loader)
    assert len(batches) == len(loader), (len(batches), len(loader))

    # every batch becomes one globally-sharded array; a count skew between
    # processes deadlocks here (the r1 desync bug)
    total = jnp.zeros((), jnp.float32)
    sum_fn = jax.jit(lambda x: x.sum())
    for b in batches:
        g = global_batch_from_local(mesh, {"index": b["index"]})
        total = total + sum_fn(g["index"].astype(jnp.float32))
    # expected: reconstruct from the loader's own order logic (drop_last
    # truncates the permutation to floor(N/W)*W before striding)
    rng = np.random.default_rng((5, 2))
    order = rng.permutation(n_samples)
    order = order[: (n_samples // nproc) * nproc]
    per_rank = len(order) // nproc
    bs = n_dev // nproc
    n_batches = per_rank // bs
    used = np.concatenate(
        [order[r::nproc][: n_batches * bs] for r in range(nproc)]
    )
    assert float(total) == float(used.sum()), (float(total), used.sum())

    # row-sharded Sinkhorn across the 2-process mesh
    from selavi_tpu.selflabel.sinkhorn import sinkhorn_assign

    dsh = data_sharding(mesh)
    k = 8
    rows = 16 * n_dev
    lv = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (rows, k), jnp.float32),
        dsh,
    )
    la = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (rows, k), jnp.float32),
        dsh,
    )
    from selavi_tpu.parallel.mesh import fetch_to_host

    res = sinkhorn_assign(lv, la)
    labels = fetch_to_host(res.labels)
    assert labels.shape == (rows,)
    assert np.isfinite(float(res.cost))

    # full self-labeling engine across processes: sharded aggregation,
    # modality matching, gauss marginals, sharded SK, label gather
    from selavi_tpu.selflabel.engine import SKConfig, cluster
    from selavi_tpu.selflabel.marginals import MarginalState

    n, d, h, k2 = 32, 8, 2, 4
    rng_np = np.random.default_rng(3)
    true = rng_np.integers(0, k2, n)
    centers = rng_np.standard_normal((k2, d)) * 3.0
    fv = (centers[true] + rng_np.standard_normal((n, d)) * 0.1).astype(
        np.float32
    )
    fa = (centers[true] + rng_np.standard_normal((n, d)) * 0.1).astype(
        np.float32
    )
    params = {
        "wv": rng_np.standard_normal((h, d, k2)).astype(np.float32),
        "wa": rng_np.standard_normal((h, d, k2)).astype(np.float32),
    }

    def make_batch_iter():
        per = n // nproc
        lo = pid * per
        for s in range(lo, lo + per, per // 2):
            idx = np.arange(s, s + per // 2)
            yield global_batch_from_local(
                mesh,
                {"video": fv[idx], "audio": fa[idx], "index": idx},
            )

    cfg = SKConfig(
        headcount=h, num_clusters=k2, match=False, distribution="gauss",
        sk_backend="xla", feat_dim=d,
    )
    labels2, _, metrics, _ = cluster(
        encode_fn=lambda v, a: (v, a),
        head_logits_fn=lambda p, f, m: jnp.einsum(
            "nd,hdk->hnk", f, jnp.asarray(p["wv" if m == "v" else "wa"])
        ),
        make_batch_iter=make_batch_iter,
        params=params,
        n=n,
        cfg=cfg,
        selflabels=np.zeros((n, h), np.int32),
        marginal_state=MarginalState(),
        iter_num=0,
        np_rng=np.random.default_rng(11),
        true_labels=true,
        feature_sharding=dsh,
    )
    assert labels2.shape == (n, h)
    assert metrics["nmi_vs_gt"] > 0.5, metrics
    digest = int(np.asarray(labels2, np.int64).sum())

    # the full jitted train step across the 2-process mesh: replicated
    # params, process-assembled global batch, GSPMD grad psum spanning
    # hosts — the multi-process analog of dryrun_multichip. Run once (the
    # even-N case); the odd-N case exercises only the loader/SK paths.
    if n_samples % 2:
        print(f"MP_OK pid={pid} batches={len(batches)} "
              f"sk_iters={int(res.iters)} nmi={metrics['nmi_vs_gt']:.3f} "
              f"loss=skipped wsum=skipped digest={digest}", flush=True)
        return

    from selavi_tpu.models import load_model
    from selavi_tpu.parallel.mesh import replicated_sharding
    from selavi_tpu.train.optim import make_optimizer
    from selavi_tpu.train.state import create_train_state
    from selavi_tpu.train.step import make_train_step

    model = load_model(headcount=2, num_classes=4)
    tx = make_optimizer(0.01, 1e-6, multiplier=float(n_dev),
                        warmup_epochs=1, batches_per_epoch=2)
    rng_j = jax.random.PRNGKey(0)
    state = create_train_state(
        model, tx, rng_j, (2, 4, 32, 32, 3), (2, 40, 51, 1)
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    local_bs = n_dev // nproc
    tb = global_batch_from_local(mesh, {
        "video": np.full((local_bs, 4, 32, 32, 3), 30, np.uint8),
        "audio": np.zeros((local_bs, 40, 51, 1), np.float32),
        "labels": np.zeros((local_bs, 2), np.int32),
    })
    step = make_train_step(model, donate=False)
    with mesh:
        state2, m2 = step(
            state, {"video": tb["video"], "audio": tb["audio"]},
            tb["labels"], rng_j,
        )
    train_loss = float(m2["loss"])
    assert np.isfinite(train_loss), m2
    # one replicated param leaf, reduced to a digest every process must
    # agree on (GSPMD keeps replicas bit-identical)
    w = jax.tree.leaves(state2.params)[0]
    wsum = float(jnp.sum(jnp.abs(w.astype(jnp.float32))))

    print(f"MP_OK pid={pid} batches={len(batches)} "
          f"sk_iters={int(res.iters)} nmi={metrics['nmi_vs_gt']:.3f} "
          f"loss={train_loss:.6f} wsum={wsum:.6f} "
          f"digest={digest}", flush=True)


if __name__ == "__main__":
    main()

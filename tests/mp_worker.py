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
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
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

    print(f"MP_OK pid={pid} batches={len(batches)} "
          f"sk_iters={int(res.iters)} nmi={metrics['nmi_vs_gt']:.3f} "
          f"digest={digest}", flush=True)


if __name__ == "__main__":
    main()

"""Self-labeling engine: full-dataset inference + Sinkhorn-Knopp assignment.

Orchestrates the reference's ``cluster`` / ``get_cluster_assignments_gpu``
(/root/reference/src/sk_utils.py:23-356):

1. run the model in eval mode over the whole training set (with training
   augmentations — the reference feeds the augmented train dataset) and
   aggregate per-sample features: per-head softmaxes when ``headcount == 1``
   (fp64 there; log-space fp32 here), pooled 512-d GAP features otherwise;
2. optionally (first SK step, ``match``) align audio head columns to video
   via the greedy permutation search;
3. for each head (shuffled order; ``ind_groups`` independent groups each
   re-aggregating with fresh augmentations), run Sinkhorn-Knopp on
   ``softmax_v * softmax_a`` under the configured cluster marginal and write
   the row-argmax into ``selflabels[:, head]``;
4. report NMI vs. the previous labels and vs. ground truth.

TPU-native: features stay on device, sharded over the mesh's data axis; the
SK solve is the sharded log-domain solver (sinkhorn.py) rather than a
single-host fp64 loop; there are no explicit barriers (SPMD) and no
all_gather-to-rank-0 — the [N, D] matrix lives distributed.

Unlike the reference, the ``N % world_size`` tail samples are *not* silently
dropped from re-labeling (reference sk_utils.py:157-161 integer shard math);
every sample is assigned.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.selflabel.marginals import MarginalState, get_marginal
from selavi_tpu.selflabel.matching import match_order
from selavi_tpu.selflabel.sinkhorn import sinkhorn_knopp

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SKConfig:
    headcount: int = 1
    num_clusters: int = 256
    lamb: float = 20.0
    ind_groups: int = 1
    match: bool = True
    distribution: str = "default"  # 'default' | 'gauss'
    gauss_sd: float = 0.1
    diff_dist_every: bool = False
    diff_dist_per_head: bool = True
    sk_tol: float = 1e-1
    sk_max_iters: int = 2000
    # 'auto': fused Pallas iteration on TPU, XLA elsewhere
    sk_backend: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # bf16 storage of the scaled log-prob matrix in the Pallas path:
    # 1030 vs 639 iters/s at VGG-Sound scale, but it trades label parity
    # (~97% agreement on random instances) — fp32 is the default; opt in
    # with --sk_bf16 when the SK phase is a measured bottleneck.
    sk_m_bf16: bool = False
    # cache the decoded batches ON DEVICE across independent head groups:
    # ONE decode + host->device transfer per SK step instead of
    # ind_groups of them; groups still differ by their device-side
    # augmentations (fresh rng per encode call). The reference re-reads
    # the dataset per group because its augmentations are host-side
    # (sk_utils.py:194-196); with device augmentation the re-read only
    # re-decodes identical pixels. Opt-in: the cache must fit in HBM
    # (N * bytes/sample), so it is for small/medium datasets or
    # row-sharded multi-chip aggregation.
    cache_group_batches: bool = False
    feat_dim: int = 512  # video encoder GAP feature width
    # audio GAP width; None -> feat_dim. Differs for bottleneck audio
    # towers (resnet50 -> 2048, models/resnet_audio.py::AUDIO_ARCHS) — a
    # config the reference cannot actually run (its AVModel hardcodes
    # encoder_dim_a=512, model.py:199-201, so 2048-d features crash its
    # heads; here the flax heads shape-infer their input width).
    feat_dim_a: Optional[int] = None


import functools


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_features(ps_v, ps_a, feat_v, feat_a, idx):
    # donated buffers -> true in-place dynamic-update-scatter on device
    return (
        ps_v.at[idx].set(feat_v.astype(jnp.float32)),
        ps_a.at[idx].set(feat_a.astype(jnp.float32)),
    )


def aggregate_features(
    encode_fn: Callable,
    batch_iter: Iterator[dict],
    n: int,
    feat_dim: int,
    sharding=None,
    feat_dim_a: Optional[int] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward the whole dataset, scatter features into [N, D] by index.

    ``encode_fn(video, audio) -> (feat_v, feat_a)`` must be jitted eval-mode
    GAP features. Batches carry an ``index`` array (dataset positions).
    The [N, D] accumulators are donated back to the scatter each step, so
    aggregation is in-place on device (no per-batch [N, D] copies). Pass a
    row ``sharding`` to keep the accumulators distributed over the mesh —
    the reference materializes the full matrix on rank 0's GPU
    (sk_utils.py:232-233); here it never has to fit on one chip.
    """
    ps_v = jnp.zeros((n, feat_dim), jnp.float32)
    ps_a = jnp.zeros((n, feat_dim_a or feat_dim), jnp.float32)
    if sharding is not None:
        ps_v = jax.device_put(ps_v, sharding)
        ps_a = jax.device_put(ps_a, sharding)
    for batch in batch_iter:
        feat_v, feat_a = encode_fn(
            batch["video"], batch.get("audio", batch.get("audio_pcm"))
        )
        ps_v, ps_a = _scatter_features(
            ps_v, ps_a, feat_v, feat_a, jnp.asarray(batch["index"])
        )
    return ps_v, ps_a


def cluster(
    *,
    encode_fn: Callable,
    head_logits_fn: Callable,
    make_batch_iter: Callable[[], Iterator[dict]],
    params: dict,
    n: int,
    cfg: SKConfig,
    selflabels: np.ndarray,
    marginal_state: MarginalState,
    iter_num: int,
    np_rng: np.random.Generator,
    true_labels: Optional[np.ndarray] = None,
    writer=None,
    sk_counter: int = 0,
    feature_sharding=None,
) -> tuple[np.ndarray, MarginalState, dict, dict]:
    """One full re-clustering step.

    Args:
      encode_fn: jitted ``(video, audio) -> (feat_v [B,512], feat_a)`` in
        eval mode (running BN stats, no dropout).
      head_logits_fn: jitted ``(params, feats, modality) -> [H, N, K]`` —
        applies every head to pooled features (modality in {'v', 'a'}).
      make_batch_iter: factory for a fresh full-dataset iterator (fresh
        augmentations per independent head group).
      params: current model params (heads may be permuted by matching; the
        possibly-updated params are returned via the info dict).
      selflabels: [N, H] int32 current labels (host).
      true_labels: optional [N] ground-truth labels for NMI diagnostics.

    Returns (new_selflabels, marginal_state, metrics, info) where info may
    contain ``params`` (updated by modality alignment).
    """
    t_start = time.time()
    old_labels = selflabels.copy()
    new_labels = selflabels.copy()
    info: dict = {}
    costs = []

    order_heads = list(range(cfg.headcount))
    np_rng.shuffle(order_heads)
    assert cfg.ind_groups <= cfg.headcount

    cached_batches = None
    for grp in range(cfg.ind_groups):
        heads_in_group = order_heads[grp :: cfg.ind_groups]

        # 1. full-dataset eval-mode feature aggregation (fresh augs per
        # group; with cache_group_batches the pixels are decoded and
        # transferred once and only the device augmentations differ)
        if cfg.cache_group_batches:
            if cached_batches is None:
                cached_batches = list(make_batch_iter())
            batch_iter = iter(cached_batches)
        else:
            batch_iter = make_batch_iter()
        ps_v, ps_a = aggregate_features(
            encode_fn, batch_iter, n, feat_dim=cfg.feat_dim,
            sharding=feature_sharding, feat_dim_a=cfg.feat_dim_a,
        )

        # 2. modality alignment at the very first SK step. Both [H,N,K]
        # stacks are computed ONCE: a head's perm only permutes that
        # head's own audio classifier, so the pre-permutation logits of
        # every other head stay valid (heads are independent).
        if cfg.match and iter_num == 0:
            logits_v_all = head_logits_fn(params, ps_v, "v")
            logits_a_all = head_logits_fn(params, ps_a, "a")
            for head in heads_in_group:
                logits_v = logits_v_all[head]
                logits_a = logits_a_all[head]
                perm = match_order(logits_v, logits_a, rng=np_rng)
                params = _apply_audio_perm(params, head, perm)
                logger.info(
                    "matched head %d (perm fixed points: %d/%d)",
                    head,
                    int((perm == np.arange(len(perm))).sum()),
                    len(perm),
                )
            info["params"] = params

        # 3. per-head Sinkhorn-Knopp
        all_logits_v = head_logits_fn(params, ps_v, "v")
        all_logits_a = head_logits_fn(params, ps_a, "a")
        for head in heads_in_group:
            log_ps = jax.nn.log_softmax(
                all_logits_v[head].astype(jnp.float32), axis=1
            ) + jax.nn.log_softmax(
                all_logits_a[head].astype(jnp.float32), axis=1
            )
            colsum = None
            if cfg.distribution != "default":
                from selavi_tpu.parallel.mesh import fetch_to_host

                colsum = fetch_to_host(
                    jax.scipy.special.logsumexp(log_ps, axis=0)
                )
            log_r, marginal_state = get_marginal(
                marginal_state,
                colsum,
                head,
                cfg.headcount,
                n,
                cfg.num_clusters,
                distribution=cfg.distribution,
                gauss_sd=cfg.gauss_sd,
                diff_dist_every=cfg.diff_dist_every,
                diff_dist_per_head=cfg.diff_dist_per_head,
                rng=np_rng,
            )
            t0 = time.time()
            # the fused Pallas kernel is a single-core program (plain
            # pallas_call, no shard_map): auto-select it only when the
            # [N,K] matrix lives on one device. Row-sharded multi-chip
            # aggregation stays on the GSPMD-partitioned XLA solver —
            # otherwise XLA would gather the full matrix to every chip
            # each iteration (or fail to partition the custom call).
            single_device = (
                not hasattr(log_ps, "sharding")
                or len(log_ps.sharding.device_set) == 1
            )
            use_pallas = cfg.sk_backend == "pallas" or (
                cfg.sk_backend == "auto"
                and jax.default_backend() == "tpu"
                and single_device
            )
            res = sinkhorn_knopp(
                log_ps,
                jnp.asarray(log_r),
                lamb=cfg.lamb,
                tol=cfg.sk_tol,
                max_iters=cfg.sk_max_iters,
                use_pallas=use_pallas,
                # bf16 M storage pays off on BOTH backends (measured
                # 1052 it/s XLA vs 1029 Pallas vs 677 fp32 at VGG-Sound
                # scale) — in particular the row-sharded multi-chip path
                m_bf16=cfg.sk_m_bf16,
            )
            from selavi_tpu.parallel.mesh import fetch_to_host

            # labels are row-sharded over the mesh; every process gathers
            # the full vector (multi-host: an all-gather, then local read)
            head_labels = fetch_to_host(res.labels)
            new_labels[:, head] = head_labels
            costs.append(float(res.cost))
            # degeneracy watchdog: once head logits saturate to identical
            # one-hot rows (toy-scale memorization), NO transport solver
            # can balance the argmax (the reference's fp64 power-domain
            # iteration hits 0*inf on the same instances). Surface it
            # loudly instead of silently training into the death spiral.
            # thresholds are relative to the TARGET marginals: with
            # --distribution gauss the marginals deliberately give some
            # clusters far more than n/K, so uniform n/K cutoffs would
            # misfire on healthy runs.
            expected = n * np.exp(np.asarray(log_r, np.float64))
            supported = int((expected >= 1.0).sum())
            used = np.unique(head_labels).size
            counts = np.bincount(head_labels, minlength=cfg.num_clusters)
            overfill = counts / np.maximum(expected, 1.0)
            worst = int(np.argmax(overfill))
            if used < supported // 2 or overfill[worst] > 3.0:
                logger.warning(
                    "degenerate SK assignment on head %d: %d/%d "
                    "supported clusters used, cluster %d has %d samples "
                    "(%.1fx its marginal target %.0f) — head logits are "
                    "likely saturated (over-memorization); consider more "
                    "data, fewer epochs between SK steps, or a lower "
                    "lamb",
                    head, used, supported, worst, int(counts[worst]),
                    float(overfill[worst]), float(expected[worst]),
                )
            logger.info(
                "head %d: SK cost %.3f, err %.3g, %d iters, %.2fs",
                head,
                float(res.cost),
                float(res.err),
                int(res.iters),
                time.time() - t0,
            )

    # 4. diagnostics (reference sk_utils.py:44-122: NMI vs old/gt scalars,
    # per-cluster entropy/purity HISTOGRAMS every 10th SK). We additionally
    # report NMI per head (the reference only looks at head 0).
    metrics = {"sk_cost": float(np.mean(costs)), "sk_time": time.time() - t_start}
    histograms: dict = {}
    try:
        from sklearn.metrics.cluster import (
            adjusted_mutual_info_score,
            normalized_mutual_info_score,
        )

        metrics["nmi_vs_old"] = normalized_mutual_info_score(
            new_labels[:, 0], old_labels[:, 0], average_method="arithmetic"
        )
        if true_labels is not None:
            metrics["nmi_vs_gt"] = normalized_mutual_info_score(
                new_labels[:, 0], true_labels, average_method="arithmetic"
            )
            metrics["anmi_vs_gt"] = adjusted_mutual_info_score(
                new_labels[:, 0], true_labels, average_method="arithmetic"
            )
            for head in range(1, cfg.headcount):
                metrics[f"nmi_vs_gt_head{head}"] = (
                    normalized_mutual_info_score(
                        new_labels[:, head],
                        true_labels,
                        average_method="arithmetic",
                    )
                )
            if (sk_counter + 1) % 10 == 0:
                ents, purs = cluster_entropy_purity(
                    new_labels[:, 0], true_labels
                )
                metrics["avg_entropy"] = float(np.mean(ents))
                metrics["avg_purity"] = float(np.mean(purs))
                histograms["entropies"] = ents
                histograms["purities"] = purs
    except ImportError:  # pragma: no cover - sklearn is baked in
        pass

    if writer is not None:
        for k, v in metrics.items():
            writer.add_scalar(f"train/{k}", v, iter_num)
        for k, v in histograms.items():
            writer.add_histogram(f"train/{k}", v, iter_num)
    logger.info(
        "SK step @ iter %d: %s",
        iter_num,
        {k: round(v, 4) for k, v in metrics.items()},
    )
    return new_labels, marginal_state, metrics, info


def cluster_entropy_purity(pred: np.ndarray, truth: np.ndarray):
    """Per-cluster gt-label entropy / purity arrays (sk_utils.py:89-122;
    the reference histograms the full arrays and logs their means)."""
    from scipy.stats import entropy as scipy_entropy

    entropies, purities = [], []
    for c in np.unique(pred):
        mask = pred == c
        if mask.sum() == 0:
            continue
        _, counts = np.unique(truth[mask], return_counts=True)
        frac = counts / counts.sum()
        purities.append(frac.max())
        entropies.append(scipy_entropy(frac))
    return np.asarray(entropies), np.asarray(purities)


def _apply_audio_perm(params: dict, head: int, perm: np.ndarray) -> dict:
    """Permute the final Dense of audio head ``head`` inside the vmapped
    head-stack params (leading head axis). Device placement is preserved:
    leaves come back on their original shardings, so downstream jitted
    consumers (head_logits over row-sharded features) keep a consistent
    participant set — feeding host arrays into a mesh computation can
    wedge the collective runtime."""
    from selavi_tpu.parallel.mesh import fetch_to_host

    shardings = jax.tree.map(
        lambda a: getattr(a, "sharding", None), params
    )
    # params may be sharded (head stacks over 'model', possibly across
    # hosts) — gather every leaf to host rather than raw device_get
    params = jax.tree.map(fetch_to_host, params)
    proj = params["heads_a"]["heads"]["proj"]
    kernel = np.array(proj["kernel"])  # np.asarray views are read-only
    bias = np.array(proj["bias"])
    kernel[head] = kernel[head][:, perm]
    bias[head] = bias[head][perm]
    proj["kernel"] = kernel
    proj["bias"] = bias
    return jax.tree.map(
        lambda a, s: a if s is None else jax.device_put(a, s),
        params, shardings,
    )

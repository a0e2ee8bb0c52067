"""Cluster browser data export.

Capability parity with /root/reference/cluster_vis/ (get_clusters_
{vggsounds,kinetics}.py + preprocess.py): turn a checkpoint's
``selflabels[:, 0]`` plus the dataset path list into per-cluster sample
lists, then emit the ``data/clusters.js`` payload the static browser page
(cluster_vis/index.html) renders. Sample entries are
``(video_id, start_sec, end_sec, gt_class)`` — for YouTube-derived datasets
the video id embeds as an iframe; for others the id is the relative path.
"""

from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from typing import Optional

import numpy as np


# datasets whose files are named '{youtube_id}_{start}_{end}.mp4' under a
# gt-class directory (kinetics_sound files are kinetics files)
YOUTUBE_FILENAME_DATASETS = ("vggsound", "kinetics", "kinetics_sound")


def parse_youtube_filename(path: str):
    """``.../{gt_class}/{youtube_id}_{start}_{end}.mp4`` ->
    ``(youtube_id, start_sec, end_sec)`` — the id may itself contain
    underscores, so the LAST two fields are the integer clip window
    (reference get_clusters_vggsounds.py:40-46 and
    get_clusters_kinetics.py:41-47 split identically). Returns None when
    the name doesn't end in two integer fields."""
    name = os.path.splitext(os.path.basename(path))[0]
    parts = name.split("_")
    if len(parts) >= 3:
        try:
            return "_".join(parts[:-2]), int(parts[-2]), int(parts[-1])
        except ValueError:
            pass
    return None


def load_meta_classes(path: str) -> dict:
    """meta-classes.json with the reference's key normalization: class
    names are stored with spaces but gt-class directories use
    underscores (preprocess.py:26-32)."""
    with open(path) as f:
        meta = json.load(f)
    return {k.replace(" ", "_"): v for k, v in meta.items()}


def extract_clusters(
    selflabels: np.ndarray,
    video_ids: list[str],
    gt_classes: list[str],
    starts: Optional[list[float]] = None,
    ends: Optional[list[float]] = None,
    head: int = 0,
) -> dict[int, list[tuple]]:
    """cluster id -> [(video_id, start, end, gt_class), ...]
    (reference get_clusters_vggsounds.py:14-52)."""
    labels = np.asarray(selflabels)
    if labels.ndim == 2:
        labels = labels[:, head]
    n = len(labels)
    starts = starts or [0.0] * n
    ends = ends or [10.0] * n
    clusters = defaultdict(list)
    for i in range(n):
        clusters[int(labels[i])].append(
            (video_ids[i], float(starts[i]), float(ends[i]), gt_classes[i])
        )
    return dict(clusters)


def write_clusters_js(
    clusters: dict[int, list[tuple]],
    out_path: str,
    shuffle_seed: int = 0,
    max_per_cluster: int = 30,
    meta_classes: Optional[dict] = None,
):
    """Emit ``clusters.js`` (reference preprocess.py:14-52): shuffled,
    truncated per-cluster sample lists with purity stats."""
    rng = np.random.default_rng(shuffle_seed)
    payload = []
    for cid in sorted(clusters):
        samples = list(clusters[cid])
        rng.shuffle(samples)
        gt = [s[3] for s in samples]
        uniq, counts = np.unique(gt, return_counts=True)
        order = np.argsort(-counts)
        purity = float(counts.max() / counts.sum()) if len(gt) else 0.0
        entry = {
            "cluster": cid,
            "size": len(samples),
            "purity": round(purity, 4),
            "top_classes": [
                {"name": str(uniq[i]), "count": int(counts[i])}
                for i in order[:5]
            ],
            "samples": [
                {
                    "id": s[0],
                    "start": s[1],
                    "end": s[2],
                    "gt": s[3],
                    "meta": (meta_classes or {}).get(s[3], s[3]),
                }
                for s in samples[:max_per_cluster]
            ],
        }
        payload.append(entry)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("var clusters = ")
        json.dump(payload, f)
        f.write(";\n")
    return payload


def export_from_checkpoint(
    ckpt_path: str,
    dataset,
    out_dir: str = "cluster_vis/data",
    head: int = 0,
    meta_classes_path: Optional[str] = None,
):
    """One-call export: checkpoint + dataset -> cluster_vis/data/clusters.js."""
    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    selflabels = np.asarray(payload["selflabels"])
    if len(selflabels) != len(dataset):
        raise ValueError(
            f"checkpoint has {len(selflabels)} selflabel rows but the "
            f"rebuilt dataset has {len(dataset)} samples — the dataset "
            "flags (--ds_name/--num_data_samples/--mlp_dim/--seed/...) "
            "must match the training run"
        )

    idx_to_class = {v: k for k, v in getattr(
        dataset, "class_to_idx", {}
    ).items()}
    labels = getattr(dataset, "labels", np.zeros(len(dataset), np.int64))
    gt_classes = [idx_to_class.get(int(l), str(int(l))) for l in labels]
    starts = ends = None
    if hasattr(dataset, "_path_to_videos"):
        valid = list(getattr(dataset, "valid_indices"))
        paths = [dataset._path_to_videos[i] for i in valid]
        if getattr(dataset, "ds_name", "") in YOUTUBE_FILENAME_DATASETS:
            # real timestamps + youtube ids so browser embeds point at
            # the actual clip window (reference
            # get_clusters_vggsounds.py:40-46); gt class is the parent
            # directory, exactly as the reference reads it
            video_ids, starts, ends, gt_classes = [], [], [], []
            for p in paths:
                parsed = parse_youtube_filename(p)
                if parsed is None:
                    vid = os.path.splitext(os.path.basename(p))[0]
                    s, e = 0.0, 10.0
                else:
                    vid, s, e = parsed
                video_ids.append(vid)
                starts.append(float(s))
                ends.append(float(e))
                gt_classes.append(os.path.basename(os.path.dirname(p)))
        else:
            video_ids = [
                os.path.splitext(os.path.basename(p))[0] for p in paths
            ]
    else:
        video_ids = [f"sample_{i}" for i in range(len(dataset))]

    meta = None
    if meta_classes_path and os.path.exists(meta_classes_path):
        meta = load_meta_classes(meta_classes_path)

    clusters = extract_clusters(
        selflabels, video_ids, gt_classes, starts=starts, ends=ends,
        head=head,
    )
    return write_clusters_js(
        clusters, os.path.join(out_dir, "clusters.js"), meta_classes=meta
    )


def main(argv=None):
    """CLI analog of the reference's cluster_vis scripts
    (get_clusters_{vggsounds,kinetics}.py): checkpoint + dataset flags ->
    ``{out_dir}/clusters.js`` for the static browser page."""
    import argparse

    from selavi_tpu.config import bool_flag

    from selavi_tpu.data.factory import add_dataset_flags

    p = argparse.ArgumentParser(
        description="Export cluster-browser data from a checkpoint"
    )
    p.register("type", "bool", bool_flag)
    add_dataset_flags(p)  # incl. --mlp_dim (synthetic class count)
    p.add_argument("--weights_path", required=True)
    p.add_argument("--head", type=int, default=0)
    p.add_argument("--out_dir", default="cluster_vis/data")
    p.add_argument("--meta_classes", default=None,
                   help="optional meta-classes.json path")
    args = p.parse_args(argv)

    from selavi_tpu.data.factory import build_dataset

    dataset = build_dataset(args, mode=args.mode, eval_mode=True)
    clusters = export_from_checkpoint(
        args.weights_path, dataset, out_dir=args.out_dir,
        head=args.head, meta_classes_path=args.meta_classes,
    )
    print(
        f"wrote {os.path.join(args.out_dir, 'clusters.js')} "
        f"({len(clusters)} clusters)"
    )
    return clusters


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Cluster-size distribution plots (reference
/root/reference/plot_distributions.py:12-39): sorted cluster-size histograms
of the self-labels from one or more checkpoints, vs. the Gaussian target
marginals stored in the checkpoint."""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def load_selflabels(ckpt_path: str):
    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    return np.asarray(payload["selflabels"]), payload.get("dist")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Plot self-label cluster-size distributions"
    )
    parser.add_argument("--checkpoints", nargs="+", required=True,
                        help="checkpoint.msgpack paths")
    parser.add_argument("--names", nargs="+", default=None)
    parser.add_argument("--head", type=int, default=0)
    parser.add_argument("--output", default="distributions.png")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = args.names or [f"ckpt{i}" for i in range(len(args.checkpoints))]
    plt.figure(figsize=(8, 5))
    for path, name in zip(args.checkpoints, names):
        labels, dist = load_selflabels(path)
        counts = np.bincount(labels[:, args.head])
        plt.plot(np.sort(counts)[::-1], label=name)
        if dist is not None and dist.get("dists") is not None:
            target = np.sort(np.asarray(dist["dists"])[args.head])[::-1]
            plt.plot(target, "--", label=f"{name} target")
    plt.xlabel("cluster (sorted by size)")
    plt.ylabel("size")
    plt.legend()
    plt.tight_layout()
    plt.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

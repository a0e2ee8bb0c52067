#!/usr/bin/env python
"""Clustering-quality CLI over a get_clusters dump (reference-compatible:
same flags and pickle schema as /root/reference/clustering_metrics.py)."""
import argparse

from selavi_tpu.config import bool_flag
from selavi_tpu.eval.get_clusters import evaluate_dump

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Clustering quality metrics"
    )
    parser.register("type", "bool", bool_flag)
    parser.add_argument(
        "--path",
        default="cluster_fit_PS_matrices_scratch_vgg_sound_train.pkl",
        help="path to the get_clusters dump",
    )
    parser.add_argument("--ncentroids", default=309, type=int)
    parser.add_argument("--use_all_heads", default="True", type="bool")
    args = parser.parse_args()
    evaluate_dump(args.path, args.ncentroids, args.use_all_heads)

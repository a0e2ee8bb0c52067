from selavi_tpu.eval.clustering import (
    clustering_report,
    cluster_accuracy,
    hungarian_match,
    best_head_labels,
    entropy_purity,
)
from selavi_tpu.eval.get_clusters import dump_cluster_matrices, evaluate_dump
from selavi_tpu.eval.retrieval import (
    average_features,
    collect_features,
    retrieval,
)
from selavi_tpu.eval.finetune import FinetuneModel, FinetuneConfig
from selavi_tpu.eval.cluster_vis import export_from_checkpoint

__all__ = [
    "clustering_report",
    "cluster_accuracy",
    "hungarian_match",
    "best_head_labels",
    "entropy_purity",
    "dump_cluster_matrices",
    "evaluate_dump",
    "average_features",
    "collect_features",
    "retrieval",
    "FinetuneModel",
    "FinetuneConfig",
    "export_from_checkpoint",
]

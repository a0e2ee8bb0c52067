from selavi_tpu.eval.clustering import (
    clustering_report,
    cluster_accuracy,
    hungarian_match,
)

__all__ = ["clustering_report", "cluster_accuracy", "hungarian_match"]

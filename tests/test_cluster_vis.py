"""Cluster-vis export: structure and purity math."""

import json
import os

import numpy as np

from selavi_tpu.eval.cluster_vis import extract_clusters, write_clusters_js


def test_extract_and_write(tmp_path):
    labels = np.array([[0], [0], [1], [1], [1]])
    vids = [f"v{i}" for i in range(5)]
    gts = ["cat", "cat", "dog", "dog", "cat"]
    clusters = extract_clusters(labels, vids, gts)
    assert set(clusters) == {0, 1}
    assert len(clusters[1]) == 3

    out = str(tmp_path / "data" / "clusters.js")
    payload = write_clusters_js(clusters, out)
    assert os.path.isfile(out)
    by_id = {c["cluster"]: c for c in payload}
    assert by_id[0]["purity"] == 1.0
    assert abs(by_id[1]["purity"] - 2 / 3) < 1e-4  # stored rounded to 4dp
    assert by_id[1]["top_classes"][0]["name"] == "dog"
    # the file is valid "var clusters = <json>;"
    body = open(out).read()
    assert body.startswith("var clusters = ")
    json.loads(body[len("var clusters = "):].rstrip(";\n"))

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


def test_parse_youtube_filename_windows():
    """Reference filename contract: '{ytid}_{start}_{end}.mp4' where the
    id itself may contain underscores (get_clusters_vggsounds.py:40-46)."""
    from selavi_tpu.eval.cluster_vis import parse_youtube_filename

    assert parse_youtube_filename(
        "/d/train/dog_barking/aB-c_9xK_10_20.mp4"
    ) == ("aB-c_9xK", 10, 20)
    assert parse_youtube_filename("/d/train/x/vid_0_10.avi") == (
        "vid", 0, 10
    )
    # no integer window -> None (caller falls back to generic ids)
    assert parse_youtube_filename("/d/train/x/clip_one.mp4") is None
    assert parse_youtube_filename("/d/train/x/short.mp4") is None


def test_export_vggsound_shaped_paths(tmp_path):
    """End-to-end over a synthetic path list shaped like the reference's:
    youtube ids + real clip windows + meta-classes with space keys."""
    import pickle
    from types import SimpleNamespace

    from selavi_tpu.eval.cluster_vis import export_from_checkpoint

    paths = [
        "/data/train/dog_barking/ytA_-x_10_20.mp4",
        "/data/train/dog_barking/ytB_30_40.mp4",
        "/data/train/car_horn/ytC_5_15.mp4",
        "/data/train/car_horn/oddname.mp4",  # no window -> generic
    ]
    class DS(SimpleNamespace):
        def __len__(self):
            return len(self._path_to_videos)

    ds = DS(
        ds_name="vggsound",
        _path_to_videos=paths,
        valid_indices=[0, 1, 2, 3],
        labels=np.array([0, 0, 1, 1]),
        class_to_idx={"dog_barking": 0, "car_horn": 1},
    )
    ckpt = tmp_path / "ckpt.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"selflabels": np.array([[0], [0], [1], [1]])}, f)
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps({"dog barking": "animals",
                                "car horn": "vehicle"}))
    out = export_from_checkpoint(
        str(ckpt), ds, out_dir=str(tmp_path / "out"),
        meta_classes_path=str(meta),
    )
    by_cluster = {e["cluster"]: e for e in out}
    s0 = {s["id"]: s for s in by_cluster[0]["samples"]}
    assert s0["ytA_-x"]["start"] == 10.0 and s0["ytA_-x"]["end"] == 20.0
    assert s0["ytA_-x"]["gt"] == "dog_barking"
    # meta-classes keys were space->underscore normalized
    assert s0["ytA_-x"]["meta"] == "animals"
    s1 = {s["id"]: s for s in by_cluster[1]["samples"]}
    assert s1["ytC"]["start"] == 5.0
    assert s1["oddname"]["start"] == 0.0  # graceful generic fallback
    assert s1["oddname"]["meta"] == "vehicle"


def test_index_html_payload_contract(tmp_path):
    """DOM-free render check (no browser exists in this env): every data
    field the static page dereferences must exist in the generated
    payload, at the level the page reads it from, and the payload file
    must define the global the page's <script src> loads. Mirrors the
    reference page's field usage (cluster_vis/data/clustervis.js)."""
    import re

    page = open(
        os.path.join(os.path.dirname(__file__), "..",
                     "cluster_vis", "index.html")
    ).read()

    # the page loads the payload as a global from data/clusters.js
    assert re.search(r'<script\s+src="data/clusters\.js">', page)
    assert "clusters" in page  # global name written by write_clusters_js

    # inline script = the page's own logic (drop the src= include)
    scripts = re.findall(r"<script(?![^>]*src=)[^>]*>(.*?)</script>",
                         page, flags=re.S)
    assert scripts, "page has no inline script"
    js = "\n".join(scripts)

    # generate a real payload
    labels = np.array([[0], [0], [1], [1], [1]])
    clusters = extract_clusters(
        labels, [f"v{i}" for i in range(5)],
        ["cat", "cat", "dog", "dog", "cat"],
        starts=[1.0] * 5, ends=[11.0] * 5,
    )
    out = str(tmp_path / "data" / "clusters.js")
    payload = write_clusters_js(clusters, out,
                                meta_classes={"cat": "animals"})
    body = open(out).read()
    assert body.startswith("var clusters = ")  # matches the global read

    entry = payload[0]
    entry_fields = set(entry)
    sample_fields = set(entry["samples"][0])
    topclass_fields = set(entry["top_classes"][0])

    # every property the page dereferences on its data-loop variables
    # (render(cluster)'s `cluster.`, top_classes map + drawList `c.`,
    # samples loop `s.`, sort comparator `a.`/`b.`) must be a payload
    # field at SOME level; then pin the critical per-level sets below.
    reads = set(re.findall(r"\b(?:cluster|c|s|a|b)\.([A-Za-z_]\w*)", js))
    known = entry_fields | sample_fields | topclass_fields
    assert reads <= known, f"page reads unknown fields: {reads - known}"

    # per-level contracts the page depends on
    assert {"cluster", "size", "purity", "top_classes",
            "samples"} <= entry_fields
    assert {"id", "start", "end", "gt", "meta"} <= sample_fields
    assert {"name", "count"} <= topclass_fields

    # sort dropdown values must be numeric entry fields (b[key] access)
    options = set(re.findall(r'<option value="(\w+)"', page))
    assert options, "sort <select> has no options"
    for key in options:
        assert key in entry_fields, f"sort key {key!r} not in payload"
        assert isinstance(entry[key], (int, float))

    # Math.floor(s.start/end) in the embed URL needs numeric seconds
    assert isinstance(entry["samples"][0]["start"], float)
    assert isinstance(entry["samples"][0]["end"], float)
    # purity is rendered as a percentage width -> must be in [0, 1]
    assert all(0.0 <= e["purity"] <= 1.0 for e in payload)

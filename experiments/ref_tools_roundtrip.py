"""Validate the checkpoint EXPORT direction through the reference's own code.

VERDICT r4 next-step #7: our ``torch_export`` blobs were schema- and
oracle-verified (tests/test_torch_export.py against tests/_torch_ref.py),
but had never been consumed by the reference's *actual* model/eval code.
This harness closes that gap within the env's limits:

* The reference's ``model.py`` and ``utils.py`` run **unmodified** from
  ``/root/reference`` (read-only import). torchvision is absent in this
  image, so a minimal in-memory ``torchvision`` shim routes the three
  factory entry points the reference uses (``models.video.r2plus1d_18``,
  ``models.resnet._resnet``, ``models.resnet.BasicBlock`` —
  model.py:95,106,114) to the from-spec re-implementations in
  ``tests/_torch_ref.py`` (torchvision key names, strict-load verified).
* The DataLoader/PyAV half of ``get_clusters.py`` cannot run here (no av/
  ffmpeg); the harness feeds both chains the SAME in-memory batches and
  replicates the head-application + pickle schema of
  get_clusters.py:150-162 verbatim on the reference side.
* ``clustering_metrics.py`` runs **unmodified from /root/reference** as a
  subprocess over both dumps.

Checks (all hard assertions):
  1. flagship-shape layout identity: a parity-width K=309/10-head export
     strict-loads (``strict=True``) into the reference-constructed AVModel,
     and the reference's own loose ``utils.load_model_parameters`` loads it
     with zero "didnt load" complaints;
  2. numeric agreement: per-head logits of our JAX chain vs the reference
     torch model on identical inputs (trained verify checkpoint);
  3. protocol agreement: raw-argmax labels of softmax_v*softmax_a match
     across chains, and the reference clustering_metrics.py prints
     identical metrics for both dumps.

Run (CPU): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python experiments/ref_tools_roundtrip.py [--ckpt /tmp/selavi_verify/checkpoint.msgpack]
"""

from __future__ import annotations

import argparse
import io
import contextlib
import os
import pickle
import subprocess
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def install_torchvision_shim():
    """Register a ``torchvision`` module tree backed by tests/_torch_ref.

    Only the entry points reference model.py touches are provided
    (model.py:95,106,114); anything else raises loudly.
    """
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _torch_ref as tr

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    video = types.ModuleType("torchvision.models.video")
    resnet = types.ModuleType("torchvision.models.resnet")

    def r2plus1d_18(pretrained=False, **kw):
        assert not pretrained, "shim has no pretrained weights"
        return tr.VideoResNetR2Plus1D18()

    def _resnet(arch, block, layers, pretrained=False, progress=False, **kw):
        assert not pretrained, "shim has no pretrained weights"
        return tr.AudioResNet(tuple(layers))

    video.r2plus1d_18 = r2plus1d_18
    resnet._resnet = _resnet
    resnet.BasicBlock = tr.AudioBasicBlock
    models.video = video
    models.resnet = resnet
    for name in ("resnet18", "resnet34", "resnet50"):
        def _missing(*a, _n=name, **kw):
            raise NotImplementedError(
                f"torchvision shim: {_n} not provided (resnet9 only)"
            )
        setattr(models, name, _missing)
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.video"] = video
    sys.modules["torchvision.models.resnet"] = resnet


def import_reference():
    sys.path.insert(0, REFERENCE)
    import model as ref_model_lib  # /root/reference/model.py, unmodified
    import utils as ref_utils  # /root/reference/utils.py, unmodified

    return ref_model_lib, ref_utils


def leg_a_flagship_layout(ref_model_lib, ref_utils):
    """Parity-width K=309/10-head export strict-loads into the reference
    model (fresh init; layout is what is under test)."""
    import jax
    import jax.numpy as jnp
    import torch

    from selavi_tpu.models import load_model
    from selavi_tpu.train.torch_export import export_reference_state_dict

    model = load_model(headcount=10, num_classes=309)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 40, 51, 1), jnp.float32),
        train=False,
    )
    sd = export_reference_state_dict(
        variables["params"], variables["batch_stats"], headcount=10,
        use_mlp=True, ddp_prefix="",
    )
    ref_net = ref_model_lib.load_model(
        use_mlp=True, headcount=10, num_classes=309, norm_feat=False,
    )
    missing = ref_net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True,
    )
    assert not missing.missing_keys and not missing.unexpected_keys

    # the reference's own loose loader must also consume it silently
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref_utils.load_model_parameters(
            ref_net,
            {("module." + k): torch.from_numpy(np.asarray(v).copy())
             for k, v in sd.items()},
        )
    complaints = [ln for ln in buf.getvalue().splitlines() if "didnt" in ln]
    assert not complaints, complaints
    n_params = sum(p.numel() for p in ref_net.parameters())
    print(f"[leg A] flagship layout OK: strict load into reference "
          f"AVModel (K=309, 10 heads, {n_params / 1e6:.1f} M params)")


def _batches(ds, n, batch_size):
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        ex = [ds.get_example(int(i), np.random.default_rng(1000 + i))
              for i in idx]
        yield {
            "video": np.stack([e["video"] for e in ex]),  # [B,T,H,W,3] u8
            # dataset examples are [F,T]; the loader's collate adds the
            # trailing channel dim the conv stem expects
            "audio": np.stack([e["audio"] for e in ex])[..., None],
            "label": np.array([e["label"] for e in ex], np.int64),
            "index": idx,
        }


def load_ckpt_trees(ckpt_path):
    from flax import serialization

    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    device = serialization.msgpack_restore(payload["device"])
    return device["params"], device["batch_stats"]


def leg_b_roundtrip(ref_model_lib, params, batch_stats, out_dir, tag):
    """Dual-chain dump: our chain vs the reference model+protocol on
    identical inputs. Returns (ours_pkl, ref_pkl, k)."""
    import jax.numpy as jnp
    import torch

    from selavi_tpu.data.synthetic import SyntheticAVDataset
    from selavi_tpu.eval.get_clusters import dump_cluster_matrices
    from selavi_tpu.models import load_model
    from selavi_tpu.train.step import make_encode_fn, make_head_logits_fn
    from selavi_tpu.train.torch_export import export_reference_state_dict

    heads_v = params["heads_v"]["heads"]
    headcount, _, k = np.asarray(heads_v["proj"]["kernel"]).shape

    # identical in-memory batches for both chains (no loader in the loop)
    n, bs = 32, 8
    ds = SyntheticAVDataset(
        num_samples=n, num_classes=max(2, k // 2), num_frames=4,
        crop_size=32, aud_sample_rate=24000, aud_spec_type=1, seed=31,
        mode="test",
    )
    batches = list(_batches(ds, n, bs))
    labels_np = np.concatenate([b["label"] for b in batches])

    # ---- our chain: the real dump path (eval/get_clusters.py) ----
    model = load_model(headcount=int(headcount), num_classes=int(k))
    encode = make_encode_fn(model, augment=False)
    head_logits = make_head_logits_fn(model)
    ours_pkl = os.path.join(out_dir, f"ps_ours_{tag}.pkl")
    ps_v, _, ps_a = dump_cluster_matrices(
        encode_fn=lambda v, a: encode(params, batch_stats, v, a),
        head_logits_fn=lambda f, m: head_logits(params, batch_stats, f, m),
        batch_iter=iter(
            [{**b, "video": jnp.asarray(b["video"]),
              "audio": jnp.asarray(b["audio"])} for b in batches]
        ),
        n=n,
        out_path=ours_pkl,
    )

    # ---- reference chain: exported blob -> reference model.py ----
    sd = export_reference_state_dict(
        params, batch_stats, headcount=int(headcount), use_mlp=True,
    )
    ref_net = ref_model_lib.load_model(
        use_mlp=True, headcount=int(headcount), num_classes=int(k),
        norm_feat=False,
    )
    ref_net.load_state_dict(
        {k_.replace("module.", ""): torch.from_numpy(np.asarray(v).copy())
         for k_, v in sd.items()},
        strict=True,
    )
    ref_net.eval()
    ref_net.return_features = True
    fv, fa = [], []
    with torch.no_grad():
        for b in batches:
            video = (
                torch.from_numpy(b["video"]).float() / 255.0 - 0.45
            ) / 0.225
            video = video.permute(0, 4, 1, 2, 3)  # BTHWC -> BCTHW
            spec = torch.from_numpy(b["audio"]).permute(0, 3, 1, 2)
            out_v, out_a = ref_net(video, spec)
            fv.append(out_v)
            fa.append(out_a)
    pv_t, pa_t = torch.cat(fv), torch.cat(fa)
    # head application + pickle schema: get_clusters.py:150-162 verbatim
    ps_v_heads, ps_a_heads = [], []
    with torch.no_grad():
        for h in range(int(headcount)):
            head_a = getattr(ref_net, f"mlp_a{h}")
            head_v = getattr(ref_net, f"mlp_v{h}")
            ps_v_heads.append(head_v.forward(pv_t))
            ps_a_heads.append(head_a.forward(pa_t))
    ref_pkl = os.path.join(out_dir, f"ps_ref_{tag}.pkl")
    with open(ref_pkl, "wb") as fh:
        pickle.dump(
            [ps_v_heads, torch.from_numpy(labels_np), ps_a_heads], fh,
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    # numeric agreement of per-head logits across frameworks
    ref_v = np.stack([t.numpy() for t in ps_v_heads])
    ref_a = np.stack([t.numpy() for t in ps_a_heads])
    dv = np.abs(ref_v - np.asarray(ps_v)).max()
    da = np.abs(ref_a - np.asarray(ps_a)).max()
    scale = max(np.abs(ref_v).max(), np.abs(ref_a).max())
    assert dv / scale < 2e-3 and da / scale < 2e-3, (dv, da, scale)

    # protocol labels (clustering_metrics.py:104-125 semantics)
    def argmax_labels(v, a):
        sv = np.exp(v - v.max(-1, keepdims=True))
        sv /= sv.sum(-1, keepdims=True)
        sa = np.exp(a - a.max(-1, keepdims=True))
        sa /= sa.sum(-1, keepdims=True)
        return (sv * sa).argmax(-1)  # [H, N]

    ours_lab = argmax_labels(np.asarray(ps_v), np.asarray(ps_a))
    ref_lab = argmax_labels(ref_v, ref_a)
    agree = (ours_lab == ref_lab).mean()
    assert agree == 1.0, f"cross-framework label agreement {agree:.4f}"
    print(f"[leg B:{tag}] roundtrip OK: max logit delta "
          f"{max(dv, da):.2e} (scale {scale:.1f}), labels identical "
          f"({headcount} heads x {n} samples)")
    return ours_pkl, ref_pkl, int(k)


def reference_metrics(pkl_path, k):
    """Run /root/reference/clustering_metrics.py unmodified; return its
    printed metric lines."""
    out = subprocess.run(
        [sys.executable, "clustering_metrics.py", "--path", pkl_path,
         "--ncentroids", str(k), "--use_all_heads", "true"],
        cwd=REFERENCE, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    keep = [ln.strip() for ln in out.stdout.splitlines()
            if any(m in ln.lower() for m in
                   ("nmi", "ari", "entropy", "purity", "acc"))]
    return keep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/selavi_verify/checkpoint.msgpack")
    ap.add_argument("--out_dir", default="/tmp/ref_roundtrip")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    install_torchvision_shim()
    ref_model_lib, ref_utils = import_reference()
    leg_a_flagship_layout(ref_model_lib, ref_utils)

    # trained checkpoint: numeric + label agreement (leg B)
    params, batch_stats = load_ckpt_trees(args.ckpt)
    ours_pkl, ref_pkl, k = leg_b_roundtrip(
        ref_model_lib, params, batch_stats, args.out_dir, "trained"
    )
    # leg C through the unmodified reference clustering_metrics.py. A
    # fully-collapsed dump (all-head NMI exactly 0 — 1-epoch toy ckpts)
    # crashes the REFERENCE tool itself (best_self_labels stays None,
    # clustering_metrics.py:110-124); detect that and fall back to the
    # random-init leg below, whose labels are always spread.
    try:
        m_ours = reference_metrics(ours_pkl, k)
        m_ref = reference_metrics(ref_pkl, k)
        print("[leg C:trained] reference tool on OUR dump:", m_ours)
        print("[leg C:trained] reference tool on REF dump:", m_ref)
        assert m_ours == m_ref, (m_ours, m_ref)
    except AssertionError as e:
        collapsed = (
            "Got None instead" in str(e)
            or "best_self_labels" in str(e)
            or "NoneType" in str(e)
        )
        if not collapsed:
            raise
        print("[leg C:trained] dump is fully collapsed (all-head NMI 0) — "
              "the reference tool's own None-guard crash; covered by the "
              "init leg instead")

    # random-init model (K=16, 2 heads) with WARMED batch stats: at cold
    # init the default BN running stats (mean 0 / var 1) leave head
    # logits bias-dominated and the argmax constant — which is exactly
    # the degenerate case that crashes the reference tool. A few
    # train-mode forward passes (the reference's own BN-warmup trick,
    # utils.py:389-418) give real running stats, spreading the labels.
    import jax

    from selavi_tpu.data.synthetic import SyntheticAVDataset
    from selavi_tpu.models import load_model

    model = load_model(headcount=2, num_classes=16)
    rng = jax.random.PRNGKey(7)
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((1, 2, 32, 32, 3), np.float32),
        np.zeros((1, 40, 51, 1), np.float32),
        train=False,
    )
    params2, bstats2 = variables["params"], variables["batch_stats"]
    warm_ds = SyntheticAVDataset(
        num_samples=32, num_classes=8, num_frames=4, crop_size=32,
        aud_sample_rate=24000, aud_spec_type=1, seed=31, mode="test",
    )
    for b in _batches(warm_ds, 32, 8):
        video = (b["video"].astype(np.float32) / 255.0 - 0.45) / 0.225
        _, upd = model.apply(
            {"params": params2, "batch_stats": bstats2},
            video, b["audio"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        bstats2 = upd["batch_stats"]
    ours2, ref2, k2 = leg_b_roundtrip(
        ref_model_lib, params2, bstats2, args.out_dir, "init",
    )
    m_ours2 = reference_metrics(ours2, k2)
    m_ref2 = reference_metrics(ref2, k2)
    print("[leg C:init] reference tool on OUR dump:", m_ours2)
    print("[leg C:init] reference tool on REF dump:", m_ref2)
    assert m_ours2 == m_ref2, (m_ours2, m_ref2)
    print("ref_tools_roundtrip: ALL LEGS OK")


if __name__ == "__main__":
    main()

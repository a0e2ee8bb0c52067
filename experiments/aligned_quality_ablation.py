#!/usr/bin/env python
"""Aligned-midplanes quality ablation (ROADMAP round-2 item 6).

The MXU-aligned midplane widths (models/r2plus1d.py, opt-in via
--tpu_aligned_midplanes) buy +36% step throughput with slightly FEWER
params/FLOPs than the reference-parity widths — but they change the
architecture, so the recommendation to use them hinges on label quality
being unaffected. This runs the round-2 self-labeling ablation config
(512-sample packed synthetic, 8 true classes, K=32, 4 heads, ind_groups=2,
match + gauss marginals, bf16 compute, fp32 SK) twice — parity vs aligned —
with identical seeds/data, and reports the nmi_vs_gt trajectory of each.

Run on TPU (default env, ONE process at a time; ~30-60 min/run through the
relay):
    python experiments/aligned_quality_ablation.py --epochs 40
The packing step runs first in a scrubbed CPU subprocess.
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def ensure_pack(path: str, n: int):
    if os.path.exists(path):
        return
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/pack_dataset.py"),
         "--ds_name", "synthetic", "--num_data_samples", str(n),
         "--train_crop_size", "160", "--num_frames", "30",
         "--aud_sample_rate", "24000", "--aud_spec_type", "2",
         "--output", path],
        env=cpu_env(), cwd=REPO, check=True,
    )


def run_variant(tag: str, aligned: bool, pack: str, epochs: int,
                dump_root: str, nopts: int = 8):
    dump = os.path.join(dump_root, tag)
    os.makedirs(dump, exist_ok=True)
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--ds_name", "packed", "--root_dir", pack,
        "--num_data_samples", "512", "--mlp_dim", "32",
        "--headcount", "4", "--ind_groups", "2",
        "--match", "true", "--distribution", "gauss",
        "--epochs", str(epochs), "--batch_size", "16",
        "--num_frames", "30", "--train_crop_size", "112",
        "--aud_sample_rate", "24000", "--aud_spec_type", "2",
        "--device_spectrogram", "true",
        "--compute_dtype", "bfloat16",
        "--tpu_aligned_midplanes", "true" if aligned else "false",
        "--nopts", str(nopts), "--workers", "4",
        "--dump_path", dump,
    ]
    print(f"== {tag}: {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)
    return parse_nmi(os.path.join(dump, "train.log"))


def parse_nmi(log_path: str):
    """Collect nmi_vs_gt per SK step from the train log."""
    traj = []
    pat = re.compile(r"SK step @ iter (\d+).*?'nmi_vs_gt': ([0-9.]+)")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                traj.append((int(m.group(1)), float(m.group(2))))
    return traj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--nopts", type=int, default=8)
    p.add_argument("--pack", type=str, default="/tmp/ablation_512.pack")
    p.add_argument("--dump_root", type=str,
                   default="/tmp/aligned_ablation")
    args = p.parse_args()

    ensure_pack(args.pack, 512)
    results = {}
    for tag, aligned in (("parity", False), ("aligned", True)):
        results[tag] = run_variant(tag, aligned, args.pack, args.epochs,
                                   args.dump_root, nopts=args.nopts)
    print(json.dumps({
        "config": "512-sample packed synthetic, K=32, 4 heads, "
                  "ind_groups=2, match+gauss, fp32 SK, bf16 compute, "
                  f"{args.epochs} epochs, nopts={args.nopts}",
        "nmi_vs_gt": results,
    }))


if __name__ == "__main__":
    main()

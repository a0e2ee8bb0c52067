#!/bin/bash
# --data_echo QUALITY leg (ROADMAP round-5 candidate #3): paired NMI
# trajectories at echo=1 vs echo=2, identical config/seed/data.
#
# Design: echo=N trains N steps per loaded batch with fresh on-device
# augmentations (train/loop.py::_device_batches), so with equal --epochs
# both legs consume the SAME unique clips and fire the SAME nopts SK
# steps; echo=2 simply takes 2x optimizer steps on echoed pixels. The
# quality question is whether the reused-pixels / fresh-augmentation
# distribution degrades the label trajectory vs reference semantics
# (echo=1). Scaled to 4096 live-synthetic samples so a paired run fits a
# single chip window; live generation regenerates pixels every epoch
# (CLAUDE.md), so this sits above the packed-shard memorization wall.
#
# Usage: bash scripts/measure_echo_quality.sh <out_dir>

set -u
OUT=${1:?output dir}
mkdir -p "$OUT"

for ECHO in 1 2; do
  DUMP="$OUT/echo$ECHO"
  rm -rf "$DUMP"; mkdir -p "$DUMP"
  echo "=== quality leg data_echo=$ECHO $(date -u +%FT%TZ)"
  start=$(date +%s)
  env PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python /root/repo/main.py \
    --ds_name synthetic --num_data_samples 4096 --mlp_dim 256 \
    --headcount 10 --ind_groups 2 --match true --distribution gauss \
    --compute_dtype bfloat16 --tpu_aligned_midplanes true \
    --batch_size 32 --num_frames 8 --train_crop_size 64 \
    --aud_spec_type 1 --epochs 10 --nopts 10 --base_lr 0.01 \
    --wd 0.00001 --use_warmup_scheduler true --warmup_epochs 2 \
    --workers 8 --prefetch 4 --seed 31 \
    --data_echo "$ECHO" \
    --dump_path "$DUMP" > "$DUMP/out.log" 2>&1
  rc=$?
  wall=$(( $(date +%s) - start ))
  echo "echo=$ECHO rc=$rc wall=${wall}s" | tee -a "$OUT/summary.txt"
  python3 /root/repo/scripts/extract_sk_trajectory.py "$DUMP/train.log" \
    | tee -a "$OUT/summary.txt"
done
cat "$OUT/summary.txt"

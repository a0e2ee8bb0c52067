#!/bin/bash
# TPU-pod launcher for the paper-scale VGG-Sound pretraining recipe —
# capability parity with the reference's SLURM launcher
# (/root/reference/scripts/master.sh: 64 GPUs, global batch 1024, 200
# epochs, lr 1e-2, wd 1e-5, audio 24 kHz spec-type 2, volume jitter).
#
# On a TPU pod slice, run this same command on every host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all --command="..."`);
# jax.distributed.initialize() discovers the slice topology, and the
# per-host DataLoader feeds that host's shard of the mesh. Preemption is
# handled by SIGUSR1 -> checkpoint-and-exit; resume is automatic from
# --dump_path.

set -euo pipefail

DUMP_PATH=${DUMP_PATH:-/checkpoints/selavi_vggsound}
ROOT_DIR=${ROOT_DIR:-/data/vggsound}
BATCH_PER_CHIP=${BATCH_PER_CHIP:-16}   # 64 chips x 16 = global 1024

python main.py \
  --ds_name vggsound \
  --root_dir "$ROOT_DIR" \
  --dump_path "$DUMP_PATH" \
  --mlp_dim 309 \
  --headcount 10 \
  --ind_groups 2 \
  --match true \
  --distribution gauss \
  --gauss_sd 0.1 \
  --diff_dist_per_head true \
  --epochs 201 \
  --batch_size "$BATCH_PER_CHIP" \
  --base_lr 1e-2 \
  --wd 1e-5 \
  --warmup_epochs 10 \
  --use_warmup_scheduler true \
  --nopts 100 \
  --schedulepower 1.5 \
  --lamb 20 \
  --num_frames 30 \
  --target_fps 30 \
  --train_crop_size 112 \
  --colorjitter false \
  --num_sec_aud 1 \
  --aud_sample_rate 24000 \
  --aud_spec_type 2 \
  --use_volume_jittering true \
  --z_normalize false \
  --workers 10 \
  --compute_dtype bfloat16 \
  --tpu_aligned_midplanes true \
  --checkpoint_freq 5 \
  --seed 31

#!/bin/bash
# Full eval chain over a campaign checkpoint (VERDICT r3 #3/#6): the
# reference's post-training protocol (README.md:34-36, call stacks
# SURVEY.md §3.3-3.5) driven end-to-end on the real CLIs:
#   get_clusters.py -> clustering_metrics.py -> video_retrieval.py
#   -> finetune_video.py (toy UCF-layout real-media set).
#
# Runs on the TPU via the axon relay — ONE process at a time; do not run
# while a campaign holds the chip.
#
# Usage: bash scripts/run_eval_chain.sh <dump_path> <K> <out_dir> [finetune]
#   dump_path: campaign dir containing checkpoint.msgpack (synthetic,
#              16384 samples, 10 heads, num_frames 8, crop 64, seed 31,
#              aligned midplanes — the r3/r4 campaign shape)
#   K:         --mlp_dim the campaign trained with (256 or 309)
#   finetune:  pass "finetune" to include the finetune_video.py leg
#              (generates a toy UCF-layout real-media set first)

set -u
DUMP=${1:?campaign dump path}
K=${2:?cluster count (mlp_dim)}
OUT=${3:?output dir}
DO_FT=${4:-}
mkdir -p "$OUT"
ENV="PYTHONPATH=/root/repo:/root/.axon_site"

echo "=== [1/4] get_clusters.py -> $OUT/ps.pkl"
env $ENV python /root/repo/get_clusters.py \
  --ds_name synthetic --num_data_samples 16384 --seed 31 \
  --weights_path "$DUMP/checkpoint.msgpack" \
  --output_path "$OUT/ps.pkl" \
  --headcount 10 --mlp_dim "$K" --num_frames 8 --train_crop_size 64 \
  --aud_sample_rate 24000 --aud_spec_type 1 \
  --tpu_aligned_midplanes true --batch_size 128 --workers 8 \
  2>&1 | tail -5

echo "=== [2/4] clustering_metrics.py"
env $ENV JAX_PLATFORMS=cpu python /root/repo/clustering_metrics.py \
  --path "$OUT/ps.pkl" --ncentroids "$K" --use_all_heads true \
  2>&1 | tee "$OUT/metrics.txt" | tail -8

echo "=== [3/4] video_retrieval.py (v-v, synthetic)"
env $ENV python /root/repo/video_retrieval.py \
  --dataset synthetic --num_data_samples 512 \
  --weights_path "$DUMP/checkpoint.msgpack" \
  --headcount 10 --num_clusters "$K" --clip_len 16 \
  --tpu_aligned_midplanes true --batch_size 16 --workers 4 \
  --aud_sample_rate 24000 --aud_spec_type 1 --task v-v \
  2>&1 | tee "$OUT/retrieval.txt" | tail -6

if [ "$DO_FT" = "finetune" ]; then
  echo "=== [4/4] finetune_video.py (toy UCF-layout real media, 3 folds)"
  # regenerate if absent OR if the corpus predates the 3-fold lists
  if [ ! -f /tmp/rm_ucf/ucfTrainTestlist/trainlist03.txt ]; then
    rm -rf /tmp/rm_ucf
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      /root/repo/scripts/make_real_media.py --output /tmp/rm_ucf \
      --num_videos 48 --num_classes 4 --frame_size 64 --duration 1.5 \
      --layout ucf
  fi
  env $ENV python /root/repo/finetune_video.py \
    --dataset ucf101 --root_dir /tmp/rm_ucf/videos \
    --data_path /tmp/rm_ucf/ucfTrainTestlist --fold 1,2,3 \
    --weights_path "$DUMP/checkpoint.msgpack" \
    --headcount 10 --num_clusters "$K" --clip_len 8 \
    --tpu_aligned_midplanes true --batch_size 8 --epochs 2 \
    --train_clips_per_video 2 --val_clips_per_video 2 \
    --num_spatial_crops 1 --workers 4 \
    --output_dir "$OUT/finetune" \
    2>&1 | tee "$OUT/finetune.txt" | tail -6
else
  echo "=== [4/4] finetune skipped (pass 'finetune' to include)"
fi
echo "=== eval chain complete; artifacts in $OUT"

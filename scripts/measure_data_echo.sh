#!/bin/bash
# --data_echo throughput measurement (VERDICT r3 #5): e2e training
# clips/s at the campaign shapes for echo in {1,2,4}, one short run
# each. Uses the same shapes as the quality campaigns so the XLA
# compile cache is already warm (jax_cache, enabled in cli/main.py).
#
# The dev-box pipeline is input-bound (axon relay H2D + 1-core host;
# CLAUDE.md "Input pipeline measurements"), which is exactly the regime
# data echoing targets (arXiv:1907.05550) — real TPU hosts with PCIe
# and many cores are less input-bound, so gains here are an upper bound.
#
# Usage: bash scripts/measure_data_echo.sh <out_dir>

set -u
OUT=${1:?output dir}
mkdir -p "$OUT"

for ECHO in 1 2 4; do
  DUMP="$OUT/echo$ECHO"
  rm -rf "$DUMP"; mkdir -p "$DUMP"
  echo "=== data_echo=$ECHO"
  start=$(date +%s)
  env PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
    python /root/repo/main.py \
    --ds_name synthetic --num_data_samples 4096 --mlp_dim 256 \
    --headcount 10 --ind_groups 2 --match false --distribution gauss \
    --compute_dtype bfloat16 --tpu_aligned_midplanes true \
    --batch_size 32 --num_frames 8 --train_crop_size 64 \
    --aud_spec_type 1 --epochs 1 --nopts 0 --base_lr 0.01 \
    --bn_warmup_batches 0 --workers 8 --prefetch 4 --seed 31 \
    --data_echo "$ECHO" \
    --dump_path "$DUMP" > "$DUMP/out.log" 2>&1
  rc=$?
  wall=$(( $(date +%s) - start ))
  # steady-state clips/s from the per-50-iter meters (drop iter 0 = the
  # compile step); e2e wall is also recorded for context
  python3 - "$DUMP/train.log" "$ECHO" "$rc" "$wall" <<'EOF' | tee -a "$OUT/summary.txt"
import re, sys
log, echo, rc, wall = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
times = []
try:
    for line in open(log, errors="replace"):
        m = re.search(r"Epoch: \[\d+\]\[(\d+)\]\s+Time ([\d.]+)", line)
        if m and int(m.group(1)) > 0:
            times.append(float(m.group(2)))
except FileNotFoundError:
    pass
if times:
    avg = sum(times) / len(times)
    print(f"echo={echo} rc={rc} wall={wall}s steady Time/iter {avg:.3f}s "
          f"-> {32/avg:.1f} clips/s device-side ({len(times)} meter points)")
else:
    print(f"echo={echo} rc={rc} wall={wall}s NO meter points (run too short?)")
EOF
done
cat "$OUT/summary.txt"

#!/bin/bash
# Flagship-configuration quality campaign (VERDICT r3 #3): the paper's
# SK/label shape — K=309, 10 heads, ind_groups=2, match+gauss, fp32 SK —
# over 16384 live-synthetic samples (77 true classes via the factory's
# mlp_dim//4 rule: the reference's ~4x over-clustering regime,
# README.md:28 VGG-Sound 309 clusters / ~310 classes), clip shapes sized
# for the dev relay (8x64x64; the label machinery under test is
# shape-independent).
#
# Same env-failure handling as run_skbf16_campaign.sh (relay host-memory
# leak -> --max_host_mem_gb checkpoint-and-exit + requeue; relay wedge ->
# CPU-progress watchdog SIGKILL + requeue from the per-epoch checkpoint).
#
# Usage: bash scripts/run_flagship_campaign.sh <dump_path> <log_path> [deadline_s]

set -u
DUMP=${1:?dump path}
LOG=${2:?log path}
DEADLINE=${3:-0}   # unix seconds; 0 = no deadline
mkdir -p "$DUMP"

run_once() {
  env PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/main.py \
    --ds_name synthetic --num_data_samples 16384 --mlp_dim 309 \
    --headcount 10 --ind_groups 2 --match true --distribution gauss \
    --compute_dtype bfloat16 --tpu_aligned_midplanes true \
    --batch_size 32 --num_frames 8 --train_crop_size 64 --aud_spec_type 1 \
    --epochs 30 --nopts 27 --base_lr 0.01 --wd 0.00001 \
    --use_warmup_scheduler true --warmup_epochs 2 \
    --workers 8 --prefetch 4 --seed 31 \
    --max_host_mem_gb 95 --resume true \
    --dump_path "$DUMP" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/flagship.pid
  stuck=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ "$DEADLINE" -gt 0 ] && [ "$now" -gt "$DEADLINE" ]; then
      echo "[requeue] deadline reached; killing $PID" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      return 99
    fi
    # wedge detection by CPU time, not log mtime (SK aggregation is
    # legitimately silent for minutes on contended 1-core hosts)
    cpu=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null || echo 0)
    # require REAL progress (>2 s CPU per minute): a wedged process's idle
    # loader threads still tick a few jiffies (observed r5: ~7 ticks/5 min
    # while fully wedged), which defeats a plain <= check
    if [ "$cpu" -le "$((${prev_cpu:-0} + 200))" ]; then
      stuck=$((stuck + 60))
    else
      stuck=0
    fi
    prev_cpu=$cpu
    if [ "$stuck" -gt 720 ]; then
      echo "[requeue] no CPU progress for ${stuck}s; SIGKILL wedge $PID" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      sleep 60   # give the relay time to free the chip
      return 1
    fi
  done
  wait "$PID"
  return $?
}

attempt=0
while [ $attempt -lt 12 ]; do
  attempt=$((attempt + 1))
  echo "[requeue] attempt $attempt $(date -u +%FT%TZ)" >> "$LOG"
  run_once
  rc=$?
  echo "[requeue] attempt $attempt exited rc=$rc" >> "$LOG"
  [ $rc -eq 99 ] && exit 99           # deadline
  done=$(PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python - "$DUMP" <<'EOF'
import sys, os, pickle
p = os.path.join(sys.argv[1], "checkpoint.msgpack")
try:
    with open(p, "rb") as f:
        print(1 if int(pickle.load(f).get("epoch", -1)) >= 30 else 0)
except Exception:
    print(0)
EOF
)
  if [ "$done" = "1" ]; then
    echo "[requeue] campaign complete" >> "$LOG"
    exit 0
  fi
  sleep 30
done
exit 2

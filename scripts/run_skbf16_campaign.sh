#!/bin/bash
# sk_bf16 quality-campaign requeue loop (VERDICT r2 #1, bf16 leg).
#
# Re-runs the 16384-sample / 64-class / K=256 / 10-head live-synthetic
# campaign with --sk_bf16 true, mirroring the fp32 flagship campaign row
# in BASELINE.md. Two env failure modes are handled (CLAUDE.md):
#   - relay client host-memory leak -> --max_host_mem_gb checkpoints and
#     exits cleanly; this loop requeues with --resume true.
#   - spontaneous relay wedge (process stuck in a native wait) -> the
#     watchdog SIGKILLs the run when the log goes stale >12 min, then the
#     loop requeues from the last per-epoch checkpoint.
#
# Usage: bash scripts/run_skbf16_campaign.sh <dump_path> <log_path> [deadline_epoch_s]

set -u
DUMP=${1:?dump path}
LOG=${2:?log path}
DEADLINE=${3:-0}   # unix seconds; 0 = no deadline
mkdir -p "$DUMP"

run_once() {
  env PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/main.py \
    --ds_name synthetic --num_data_samples 16384 --mlp_dim 256 \
    --headcount 10 --ind_groups 2 --match true --distribution gauss \
    --sk_bf16 true --compute_dtype bfloat16 --tpu_aligned_midplanes true \
    --batch_size 32 --num_frames 8 --train_crop_size 64 --aud_spec_type 1 \
    --epochs 30 --nopts 27 --base_lr 0.01 --wd 0.00001 \
    --use_warmup_scheduler true --warmup_epochs 2 \
    --workers 8 --prefetch 4 --seed 31 \
    --max_host_mem_gb 95 --resume true \
    --dump_path "$DUMP" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/skbf16.pid
  # watchdog: kill if the process stops burning CPU for > 12 min (relay
  # wedge) or the deadline passes
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
    # wedge detection by CPU time, not log mtime: SK aggregation phases
    # are legitimately silent >12 min on contended 1-core hosts, while a
    # relay wedge burns ~zero CPU in a native wait
    cpu=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null || echo 0)
    # >2 s CPU/minute required: idle loader threads of a wedged process
    # still tick a few jiffies, defeating a plain <= check (observed r5)
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
  # completed? the checkpoint's epoch field is the resume point; when it
  # reaches --epochs the run is done (main.py exits 0 both on completion
  # and on the clean mem-watchdog preemption exit, so rc alone is moot)
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

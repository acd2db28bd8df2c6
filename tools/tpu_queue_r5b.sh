#!/bin/bash
# Round-5 final-session queue: training-evidence runs (VERDICT r5 #1/#3/#6),
# reordered for a hard session deadline. Serialized through the exclusive
# flock on /root/repo/.tpu_lock (same lock as bench.py), and phases are only
# STARTED before DEADLINE_EPOCH so the driver's end-of-round bench never
# queues behind a 45-minute training job.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}   # no new phase starts after this
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q5b] starting (deadline=$DEADLINE_EPOCH)" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; shift 2
  if [ -s "$LOG/$name.out" ] && grep -E "\"$key\": *-?[0-9]" "$LOG/$name.out" \
      | grep -qv '"error"'; then
    echo "$(date -u +%T) [q5b] SKIP $name (already measured)" >> "$LOG/queue.log"
    return
  fi
  if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "$(date -u +%T) [q5b] DEADLINE — not starting $name" >> "$LOG/queue.log"
    return
  fi
  while ! probe; do sleep 120; done
  while ! flock -n "$LOCK" true; do
    sleep 15
    if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
      echo "$(date -u +%T) [q5b] DEADLINE while waiting for lock — not starting $name" >> "$LOG/queue.log"
      return
    fi
  done
  echo "$(date -u +%T) [q5b] START $name" >> "$LOG/queue.log"
  MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
    > "$LOG/$name.out" 2> "$LOG/$name.err"
  rc=$?
  echo "$(date -u +%T) [q5b] END $name rc=$rc" >> "$LOG/queue.log"
  sleep 15
}

cd /root/repo || exit 1
# 1. CAMA stage-2 overfit: learning evidence for the most-cited stage; its
#    first_eval also reveals the SCANNED-encoder compile time (VERDICT weak #4)
run overfit_cama_r5 reduction_factor 2400 python tools/overfit_train.py \
  --workload cama --steps 300 --eval-every 25
# 2. SVD stage-1 Motion-Adapter row (missing training row, VERDICT #3)
run train_svd_r5 steps_per_sec 2400 python tools/bench_train.py --workload svd_adapter
# 3. SVD overfit (shares the compiled step shape with #2 when config-exact)
run overfit_svd_r5 reduction_factor 2400 python tools/overfit_train.py \
  --workload svd_adapter --steps 200 --eval-every 25 --lr 1e-3
# 4. DC stage-1 adapter overfit (most expensive; compile ~435 s + 300x1.55 s)
run overfit_dc_r5 reduction_factor 3000 python tools/overfit_train.py \
  --workload dc_adapter --steps 200 --eval-every 25 --lr 1e-3
# 5. ActionCLIP s/step row (cheap; overfit curve already committed)
run train_aclip_r5 steps_per_sec 1200 python tools/bench_train.py --workload action_clip
echo "$(date -u +%T) [q5b] done" >> "$LOG/queue.log"

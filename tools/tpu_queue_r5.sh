#!/bin/bash
# Round-5 measurement queue: training-evidence runs (VERDICT r5 #1/#3/#6).
# Strictly serialized through the exclusive flock on /root/repo/.tpu_lock —
# same lock as every python TPU tool, so co-tenancy with the driver bench or
# an interactive run is structurally impossible.
#
# Phases (most valuable first):
#   1. bench_train svd_adapter      — missing training row (VERDICT #3)
#   2. bench_train action_clip      — missing training row (VERDICT #3)
#   3. overfit action_clip          — learning-dynamics evidence (VERDICT #1)
#   4. overfit cama                 —   "
#   5. overfit svd_adapter          —   "
#   6. overfit dc_adapter           —   "
#   7. bench_train cama --fresh-cache — scanned-encoder compile time
#      (VERDICT weak #4: resolves the 1115 s attribution contradiction)
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q5] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; shift 2
  # success-specific skip: the key must carry a finite numeric value on a
  # line without an "error" field (fail-fast / NaN fallback never counts)
  if [ -s "$LOG/$name.out" ] && grep -E "\"$key\": *-?[0-9]" "$LOG/$name.out" \
      | grep -qv '"error"'; then
    echo "$(date -u +%T) [q5] SKIP $name (already measured)" >> "$LOG/queue.log"
    return
  fi
  while ! probe; do sleep 120; done
  # don't start the timeout clock while another TPU holder owns the lock
  while ! flock -n "$LOCK" true; do sleep 30; done
  echo "$(date -u +%T) [q5] START $name" >> "$LOG/queue.log"
  MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
    > "$LOG/$name.out" 2> "$LOG/$name.err"
  rc=$?
  echo "$(date -u +%T) [q5] END $name rc=$rc" >> "$LOG/queue.log"
  sleep 20
}

cd /root/repo || exit 1
run train_svd_r5 steps_per_sec 2700 python tools/bench_train.py --workload svd_adapter
run train_aclip_r5 steps_per_sec 1800 python tools/bench_train.py --workload action_clip
run overfit_aclip_r5 reduction_factor 2400 python tools/overfit_train.py \
  --workload action_clip --steps 400 --eval-every 25
run overfit_cama_r5 reduction_factor 3000 python tools/overfit_train.py \
  --workload cama --steps 300 --eval-every 25
run overfit_svd_r5 reduction_factor 3000 python tools/overfit_train.py \
  --workload svd_adapter --steps 300 --eval-every 25 --lr 1e-3
run overfit_dc_r5 reduction_factor 3600 python tools/overfit_train.py \
  --workload dc_adapter --steps 300 --eval-every 25 --lr 1e-3
run train_cama_fresh_r5 steps_per_sec 3000 python tools/bench_train.py \
  --workload cama --fresh-cache
echo "$(date -u +%T) [q5] done" >> "$LOG/queue.log"

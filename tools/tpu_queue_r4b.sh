#!/bin/bash
# Round-4 session-B measurement queue. Session reset wiped .bench_logs and
# .jax_cache — every job below re-runs. Strictly serialized through the
# exclusive flock on /root/repo/.tpu_lock; success-specific skip keys
# (finite value + rc=0) so failed runs are retried, finished ones are not.
#
# Order:
#   1. bench.py FULL from a cold cache: this run IS the cold-compile
#      measurement for VERDICT #4 (dc_compile_s in stderr detail) and
#      re-warms .jax_cache so the driver's end-of-round bench runs warm.
#      scan_blocks UNet3D landed since the 502 s measurement.
#   2. DC stage-1 Motion-Adapter training step (last unmeasured training
#      row; remat+scan, 2.727B params).
#   3. DC glue attribution (VERDICT #7 ~94 ms unaccounted slice).
#   4. SVD phase re-warm.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q4b] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -Eq "\"$key\": *[0-9]" "$LOG/$name.out" \
        && grep -q "^rc=0" "$LOG/$name.rc" 2>/dev/null; then
      echo "$(date -u +%T) [q4b] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    while ! probe; do sleep 120; done
    while ! flock -n "$LOCK" true; do sleep 30; done
    echo "$(date -u +%T) [q4b] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "rc=$rc" > "$LOG/$name.rc"
    echo "$(date -u +%T) [q4b] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
  done
}

cd /root/repo || exit 1
MRT_BENCH_BUDGET=3300 run bench_r4_cold vs_baseline 2 3600 python bench.py
run train_dc_r4b steps_per_sec 2 3600 python tools/bench_train.py --workload dc_adapter --steps 3
run dc_blocks_glue_r4 glue_total_ms 2 2400 python tools/bench_dc_blocks.py
run svd_warm_r4 svd_s_per_video 1 1800 python bench.py --phase svd
echo "$(date -u +%T) [q4b] done" >> "$LOG/queue.log"

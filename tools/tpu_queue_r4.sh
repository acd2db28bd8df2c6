#!/bin/bash
# Round-4 measurement queue. Strictly serialized through the exclusive
# flock on /root/repo/.tpu_lock (same lock every bench tool and bench.py
# take) — can never co-tenant with the driver's end-of-round bench or an
# interactive run. Success-specific skip keys (finite-value match; a
# NaN/null fallback line never counts as measured) AND rc=0 required.
#
# Order (most valuable first, each bounded):
#   1. CogVideoX-5B stage-1 adapter training step (VERDICT r4 #2's last
#      unmeasured workload — frozen 5.57B DiT bf16-true + remat + scan).
#   2. bench.py FULL with a cache invalidated by the lax.map CFG rework:
#      this run IS the cold-compile measurement for VERDICT #4
#      (dc_compile_s in the stderr detail line) and re-warms .jax_cache so
#      the driver's end-of-round bench runs warm. MRT_BENCH_BUDGET=3300
#      covers cold DC + cold cog compiles.
#   3. DC glue attribution (VERDICT #7: the ~94 ms unaccounted slice —
#      init_attn / conv_in/out / up+down convs now measured).
#   4. SVD phase re-warm so bench.py --svd stays warm for spot checks.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q4] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -Eq "\"$key\": *[0-9]" "$LOG/$name.out" \
        && grep -q "^rc=0" "$LOG/$name.rc" 2>/dev/null; then
      echo "$(date -u +%T) [q4] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    while ! probe; do sleep 120; done
    while ! flock -n "$LOCK" true; do sleep 30; done
    echo "$(date -u +%T) [q4] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "rc=$rc" > "$LOG/$name.rc"
    echo "$(date -u +%T) [q4] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
  done
}

cd /root/repo || exit 1
run train_cog_r4 steps_per_sec 2 3600 python tools/bench_train.py --workload cog_adapter --steps 3
MRT_BENCH_BUDGET=3300 run bench_r4_cold vs_baseline 2 3600 python bench.py
run dc_blocks_glue_r4 glue_total_ms 2 2400 python tools/bench_dc_blocks.py
run svd_warm_r4 svd_s_per_video 1 1800 python bench.py --phase svd
echo "$(date -u +%T) [q4] done" >> "$LOG/queue.log"

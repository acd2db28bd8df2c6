#!/bin/bash
# Session queue C: retries for phases that hit the transient tunnel stall
# (watchdog abort during a warmup fetch — observed twice on cog17 while
# cog49/bench.py passed the same T5 phase in seconds).
# Same structure as tools/tpu_queue.sh, plus per-phase retry.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [qc] waiting for relay..." >> "$LOG/queue.log"
while ! probe; do sleep 120; done
echo "$(date -u +%T) [qc] relay alive; starting queue C" >> "$LOG/queue.log"

run() {
  # run NAME KEY TRIES TIMEOUT CMD... — retry up to TRIES until KEY appears
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -q "\"$key\"" "$LOG/$name.out"; then
      echo "$(date -u +%T) [qc] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    echo "$(date -u +%T) [qc] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "$(date -u +%T) [qc] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
    if ! probe; then
      echo "$(date -u +%T) [qc] relay died after $name; waiting" >> "$LOG/queue.log"
      while ! probe; do sleep 120; done
      sleep 10
    fi
  done
}

cd /root/repo || exit 1
# ---- phases ---------------------------------------------------------------
run cog17_bf16_r3b sample_s 3 3600 python tools/bench_cogvideox.py
run dc_blocks_r3 accounted_blocks_ms 2 3600 python tools/bench_dc_blocks.py
run cog49_bf16_r3b sample_s 2 3600 python tools/bench_cogvideox.py --frames 49
run svd_r3b compile_s 2 3600 python bench.py --phase svd
run cog17_int8_batched_r3b sample_s 2 3600 \
  python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
run cog17_qki8_r3 sample_s 2 3600 python tools/bench_cogvideox.py --qk-int8
run dc_qki8_r3 runs 2 3600 python tools/bench_dynamicrafter.py --qk-int8
# final cache-fresh headline run so the driver's end-of-round bench is warm
run bench_final_r3c vs_baseline 2 2700 python bench.py
echo "$(date -u +%T) [qc] queue C done" >> "$LOG/queue.log"

#!/bin/bash
# Session-6 follow-up: re-measure the DC per-block attribution and int8
# serving rows AFTER the packed-temporal-attention + TemporalConv3 GEMM
# optimizations landed. Gated on queue s6's completion marker so the two
# queues can never overlap on the TPU (plus the flock as the hard guard).
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q6b] waiting for queue s6 to finish..." >> "$LOG/queue.log"
while ! grep -q "queue s6 done" "$LOG/queue.log"; do sleep 60; done
while ! probe; do sleep 120; done
echo "$(date -u +%T) [q6b] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -q "\"$key\"" "$LOG/$name.out"; then
      echo "$(date -u +%T) [q6b] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    echo "$(date -u +%T) [q6b] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "$(date -u +%T) [q6b] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
    if ! probe; then
      echo "$(date -u +%T) [q6b] relay died after $name; waiting" >> "$LOG/queue.log"
      while ! probe; do sleep 120; done
      sleep 10
    fi
  done
}

cd /root/repo || exit 1
run dc_blocks_post_s6 accounted_blocks_ms 2 3600 python tools/bench_dc_blocks.py
echo "$(date -u +%T) [q6b] done" >> "$LOG/queue.log"

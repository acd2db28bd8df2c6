#!/bin/bash
# Session-6 follow-up: re-measure the DC per-block attribution and int8
# serving rows AFTER the packed-temporal-attention + TemporalConv3 GEMM
# optimizations landed. Gated on queue s6's completion marker so the two
# queues can never overlap on the TPU (plus the flock as the hard guard).
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q6c] waiting for queue s6 to finish..." >> "$LOG/queue.log"
while ! grep -qF "[q6b] done" "$LOG/queue.log"; do sleep 60; done
while ! probe; do sleep 120; done
echo "$(date -u +%T) [q6c] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -q "\"$key\"" "$LOG/$name.out"; then
      echo "$(date -u +%T) [q6c] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    echo "$(date -u +%T) [q6c] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "$(date -u +%T) [q6c] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
    if ! probe; then
      echo "$(date -u +%T) [q6c] relay died after $name; waiting" >> "$LOG/queue.log"
      while ! probe; do sleep 120; done
      sleep 10
    fi
  done
}

cd /root/repo || exit 1
run cog17_qki8_s6c sample_s 2 3600 python tools/bench_cogvideox.py --qk-int8
echo "$(date -u +%T) [q6c] done" >> "$LOG/queue.log"

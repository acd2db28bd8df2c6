#!/bin/bash
# Session queue B: int8-QK flash measurements (after tpu_queue.sh drains).
# Same structure as tools/tpu_queue.sh: every phase under flock on
# /root/repo/.tpu_lock, watchdog, success-key skip heuristic.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [qb] waiting for relay..." >> "$LOG/queue.log"
while ! probe; do sleep 120; done
echo "$(date -u +%T) [qb] relay alive; starting queue B" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; shift 2
  if [ -s "$LOG/$name.out" ] && grep -q "\"$key\"" "$LOG/$name.out"; then
    echo "$(date -u +%T) [qb] SKIP $name (already measured)" >> "$LOG/queue.log"
    return
  fi
  echo "$(date -u +%T) [qb] START $name" >> "$LOG/queue.log"
  MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
    > "$LOG/$name.out" 2> "$LOG/$name.err"
  rc=$?
  echo "$(date -u +%T) [qb] END $name rc=$rc" >> "$LOG/queue.log"
  sleep 20
  if ! probe; then
    echo "$(date -u +%T) [qb] relay died after $name; waiting" >> "$LOG/queue.log"
    while ! probe; do sleep 120; done
    sleep 10
  fi
}

cd /root/repo || exit 1
# ---- phases ---------------------------------------------------------------
export MRT_FLASH_QK_INT8=1
run attn_qki8_9216 shape 1200 python tools/bench_attn.py 16 5 9216 64
run attn_qki8_6976 shape 1200 python tools/bench_attn.py 2 10 6976 64
run attn_qki8_17776 shape 1200 python tools/bench_attn.py 1 48 17776 64
# block sweep at 9216 (int8 tiles halve VMEM -> deeper kv may win)
# (env goes through `env` — a VAR=x prefix on a bash FUNCTION leaks after it)
run attn_qki8_9216_bk2048 shape 1200 \
  env MRT_FLASH_T_BK=2048 python tools/bench_attn.py 16 5 9216 64
run attn_qki8_9216_bq2048 shape 1200 \
  env MRT_FLASH_T_BQ=2048 python tools/bench_attn.py 16 5 9216 64
unset MRT_FLASH_QK_INT8
run cog17_qki8_r3 sample_s 3600 python tools/bench_cogvideox.py --qk-int8
run dc_qki8_r3 runs 3600 python tools/bench_dynamicrafter.py --qk-int8
echo "$(date -u +%T) [qb] queue B done" >> "$LOG/queue.log"

#!/bin/bash
# Round-2 session-7 serialized TPU queue: waits for the in-flight bench.py
# cache-warm run to exit, then measures the newly-landed fused int8 Pallas
# GEMM kernel (ops/int8_matmul.py) in isolation and end-to-end. NEVER run
# while another TPU process is active (HBM co-tenancy, CLAUDE.md).
LOG=/root/repo/.bench_logs
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q3] waiting for bench.py to exit..." >> $LOG/queue.log
while pgrep -x -f "/opt/venv/bin/python /root/repo/bench.py" >/dev/null 2>&1 \
      || ps -ef | grep -v grep | grep -q "python bench.py"; do sleep 30; done
echo "$(date -u +%T) [q3] bench done; waiting for relay" >> $LOG/queue.log
while ! probe; do sleep 120; done
sleep 20

run() {
  name=$1; shift
  if [ -s "$LOG/$name.out" ] && grep -q "{" "$LOG/$name.out"; then
    echo "$(date -u +%T) [q3] SKIP $name (already measured)" >> $LOG/queue.log
    return
  fi
  echo "$(date -u +%T) [q3] START $name" >> $LOG/queue.log
  timeout "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$(date -u +%T) [q3] END $name rc=$?" >> $LOG/queue.log
  sleep 20
  if ! probe; then
    echo "$(date -u +%T) [q3] relay died after $name; waiting" >> $LOG/queue.log
    while ! probe; do sleep 120; done
    sleep 10
  fi
}

cd /root/repo
run int8gemm_pallas 1800 python tools/bench_int8_gemm.py
MRT_INT8_PALLAS=1 run cog17_int8_pallas_batched 3600 \
  python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
run cog17_int8_batched 3600 \
  python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
run dc_int8 3600 python tools/bench_dynamicrafter.py --quantize int8
echo "$(date -u +%T) [q3] queue 3 done" >> $LOG/queue.log

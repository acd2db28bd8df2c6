#!/bin/bash
# Serialized TPU measurement queue: waits for the tunnel relay, then runs
# each phase one at a time (never two TPU processes — CLAUDE.md HBM
# co-tenancy). Ordered so a short-lived relay window still yields the most
# valuable artifacts first (driver-protocol headline, then the int8 /
# scan-blocks / 49-frame evidence). Logs to .bench_logs/; re-probes the
# relay between phases and blocks if it died.
LOG=/root/repo/.bench_logs
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) waiting for relay..." >> $LOG/queue.log
while ! probe; do sleep 120; done
echo "$(date -u +%T) relay alive; starting queue" >> $LOG/queue.log
sleep 10

run() {
  name=$1; shift
  # skip phases that already produced a result in an earlier queue run
  if [ -s "$LOG/$name.out" ] && grep -q "{" "$LOG/$name.out"; then
    echo "$(date -u +%T) SKIP $name (already measured)" >> $LOG/queue.log
    return
  fi
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  MRT_WATCHDOG_S=900 timeout "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$(date -u +%T) END $name rc=$?" >> $LOG/queue.log
  # let tunnel-side frees land before the next phase allocates
  sleep 20
  if ! probe; then
    echo "$(date -u +%T) relay died after $name; waiting" >> $LOG/queue.log
    while ! probe; do sleep 120; done
    sleep 10
  fi
}

cd /root/repo
# generous timeout: if any traced line changed since the cache was warmed,
# this run re-warms .jax_cache so the driver's end-of-round bench hits it.
# bench.py's INTERNAL budget (MRT_BENCH_BUDGET, default 540 s) must also be
# raised or it kills the cold DC compile (~13 min) itself at budget-60.
export MRT_BENCH_BUDGET=2580
run bench_full        2700 python bench.py
unset MRT_BENCH_BUDGET
run cog17             3600 python tools/bench_cogvideox.py
run int8gemm           900 python tools/bench_int8_gemm.py
run cog17_int8        3600 python tools/bench_cogvideox.py --quantize int8
run cog17_int8_batched 3600 python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
run cog49             3600 python tools/bench_cogvideox.py --frames 49
run cog49_int8        3600 python tools/bench_cogvideox.py --frames 49 --quantize int8
run cog17_scan        3600 python tools/bench_cogvideox.py --scan-blocks
run dc_int8           3600 python tools/bench_dynamicrafter.py --quantize int8
run dc_batched        3600 python tools/bench_dynamicrafter.py --cfg-mode batched
run compile_scan      2400 python tools/bench_compile.py --platform axon --depth 42 --dim 1024 --tokens 4096
echo "$(date -u +%T) queue done" >> $LOG/queue.log

#!/bin/bash
# Session-7 measurement queue. Single queue, strictly serialized: every TPU
# run goes through the exclusive flock on /root/repo/.tpu_lock (the same
# lock bench.py and all bench tools take), so it can never co-tenant with
# the driver's end-of-round bench or an interactive run. Incorporates the
# round-2 advisor fixes: rc captured on its own line, success-specific
# skip key (finite-value match — a NaN/null fallback line never counts as
# measured), no fragile pgrep gating. MRT_WATCHDOG_S is exported on every
# run but only tools/bench_cogvideox.py implements the watchdog; the other
# jobs rely on the outer `timeout` alone.
#
# Order (most valuable first, each bounded):
#   1. DC per-block attribution AFTER the packed-temporal-attn +
#      TemporalConv3 optimizations (docs/benchmarks.md promised these).
#   2. CogVideoX 17f int8-QK flash serving row (pending since s6c; the
#      SMEM spec fix landed but was never measured on hardware).
#   3. SVD phase re-warm (bench.py --phase svd) so --svd stays warm.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q7] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -Eq "\"$key\": *[0-9]" "$LOG/$name.out"; then
      echo "$(date -u +%T) [q7] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    while ! probe; do sleep 120; done
    # don't start the job's timeout clock while another TPU holder (e.g.
    # the driver bench) owns the lock — wait for it to free up first
    while ! flock -n "$LOCK" true; do sleep 30; done
    echo "$(date -u +%T) [q7] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "$(date -u +%T) [q7] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
  done
}

cd /root/repo || exit 1
run dc_blocks_post_s7 full_forward_ms 2 1800 python tools/bench_dc_blocks.py
run cog17_qki8_s7 sample_s 2 2400 python tools/bench_cogvideox.py --qk-int8
run svd_warm_s7 svd_s_per_video 1 1800 python bench.py --phase svd
echo "$(date -u +%T) [q7] done" >> "$LOG/queue.log"

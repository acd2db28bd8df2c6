#!/bin/bash
# Session-6 queue: the .jax_cache and .bench_logs were wiped by the session
# reset, so (1) re-warm every cache the driver's end-of-round bench needs,
# (2) re-measure the CogVideoX bf16 rows with the flash-T kernel (the r3
# docs rows still cite the pre-flash-T numbers and say "remeasure queued"),
# (3) finish the qk-int8 serving rows queue C never recorded.
# Serialized behind the cross-process TPU flock like every other TPU tool.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q6] waiting for relay..." >> "$LOG/queue.log"
while ! probe; do sleep 120; done
echo "$(date -u +%T) [q6] relay alive; starting queue s6" >> "$LOG/queue.log"

run() {
  # run NAME KEY TRIES TIMEOUT CMD... — retry up to TRIES until KEY appears
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -q "\"$key\"" "$LOG/$name.out"; then
      echo "$(date -u +%T) [q6] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    echo "$(date -u +%T) [q6] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "$(date -u +%T) [q6] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
    if ! probe; then
      echo "$(date -u +%T) [q6] relay died after $name; waiting" >> "$LOG/queue.log"
      while ! probe; do sleep 120; done
      sleep 10
    fi
  done
}

cd /root/repo || exit 1
# ---- phases ---------------------------------------------------------------
# flagship first: cog17 bf16 at the exact protocol, flash-T kernel default
run cog17_bf16_s6 sample_s 3 3600 python tools/bench_cogvideox.py
# DC per-block attribution (queue C ran it but the logs were wiped): the
# UNet3D forward is ~33% MFU — this tells us where the headline's time goes
run dc_blocks_s6 accounted_blocks_ms 2 3600 python tools/bench_dc_blocks.py
# north star: cog49 bf16 (flash-T should cut the 188.5 s sampler ~8%)
run cog49_bf16_s6 sample_s 2 3600 python tools/bench_cogvideox.py --frames 49
# serving rows queue C never recorded
run cog17_qki8_s6 sample_s 2 3600 python tools/bench_cogvideox.py --qk-int8
run cog49_int8_batched_s6 sample_s 2 3600 \
  python tools/bench_cogvideox.py --frames 49 --quantize int8 --cfg-mode batched
run dc_qki8_s6 runs 2 3600 python tools/bench_dynamicrafter.py --qk-int8
# final cache-fresh headline run so the driver's end-of-round bench is warm
run bench_final_s6 vs_baseline 2 2700 python bench.py
echo "$(date -u +%T) [q6] queue s6 done" >> "$LOG/queue.log"

#!/bin/bash
# Round-4 session-B follow-up queue (after the flash-tile rework + the
# UNet3D resblock-remat fix). Serialized via the exclusive flock on
# /root/repo/.tpu_lock — waits politely behind the in-flight final bench.
#
#   1. DC stage-1 adapter train step, config-exact b=2 (attempt 1 OOMed at
#      29.5 GB because the resblocks were outside remat — now fixed).
#   2. Fallback: b=1 per-chip microbatch (x accum 2 = the reference's
#      per-GPU batch) — only if (1) produced no finite steps_per_sec.
#   3. DC per-block + glue attribution with the new flash tiles.
#   4. SVD protocol phase (new tiles: L0/L1 spatial attention faster).
#   5. CogVideoX 49f e2e with the new 17776-token tiles (94.9 vs 83.4
#      TFLOP/s) — serving table row; last, bounded.
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q4d] starting" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; tries=$3; shift 3
  for attempt in $(seq 1 "$tries"); do
    if [ -s "$LOG/$name.out" ] && grep -Eq "\"$key\": *[0-9]" "$LOG/$name.out" \
        && grep -q "^rc=0" "$LOG/$name.rc" 2>/dev/null; then
      echo "$(date -u +%T) [q4d] SKIP $name (already measured)" >> "$LOG/queue.log"
      return
    fi
    while ! probe; do sleep 120; done
    while ! flock -n "$LOCK" true; do sleep 30; done
    echo "$(date -u +%T) [q4d] START $name attempt $attempt" >> "$LOG/queue.log"
    MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
      > "$LOG/$name.out" 2> "$LOG/$name.err"
    rc=$?
    echo "rc=$rc" > "$LOG/$name.rc"
    echo "$(date -u +%T) [q4d] END $name attempt $attempt rc=$rc" >> "$LOG/queue.log"
    sleep 20
  done
}

cd /root/repo || exit 1
run train_dc_r4d steps_per_sec 1 3000 python tools/bench_train.py --workload dc_adapter --steps 3
if ! grep -Eq '"steps_per_sec": *[0-9]' "$LOG/train_dc_r4d.out" 2>/dev/null; then
  run train_dc_b1_r4d steps_per_sec 1 3000 python tools/bench_train.py --workload dc_adapter --steps 3 --batch 1
fi
run dc_blocks_glue_r4 glue_total_ms 2 2400 python tools/bench_dc_blocks.py
run svd_warm_r4 svd_s_per_video 1 1800 python bench.py --phase svd
run cog49_r4 sample_s 1 2400 python tools/bench_cogvideox.py --frames 49
echo "$(date -u +%T) [q4d] done" >> "$LOG/queue.log"

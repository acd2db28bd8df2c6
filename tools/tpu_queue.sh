#!/bin/bash
# Serialized TPU measurement queue (round 3).
#
# Every phase runs under `flock /root/repo/.tpu_lock`, the same lock every
# python TPU tool takes (tools/tpu_lock.py) — so overlap with bench.py, a
# second queue copy, or an ad-hoc benchmark is structurally impossible
# (round 2's driver benchmark was poisoned by exactly that overlap).
#
# ADVICE round-2 fixes folded in:
#  - rc captured on its own line before logging (command-substitution $? bug)
#  - skip heuristic greps for a success-specific key, not any '{'
#  - MRT_WATCHDOG_S guard on every run
#  - no pgrep-based waiting (flock replaces it)
LOG=/root/repo/.bench_logs
LOCK=/root/repo/.tpu_lock
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q] waiting for relay..." >> "$LOG/queue.log"
while ! probe; do sleep 120; done
echo "$(date -u +%T) [q] relay alive; starting queue" >> "$LOG/queue.log"

run() {
  name=$1; key=$2; shift 2
  # skip phases that already produced a SUCCESS result: the key must carry a
  # finite numeric value on a line without an "error" field (a fail-fast or
  # NaN-fallback JSON line never counts as measured — ADVICE r3/r4)
  if [ -s "$LOG/$name.out" ] && grep -E "\"$key\": *-?[0-9]" "$LOG/$name.out" \
      | grep -qv '"error"'; then
    echo "$(date -u +%T) [q] SKIP $name (already measured)" >> "$LOG/queue.log"
    return
  fi
  echo "$(date -u +%T) [q] START $name" >> "$LOG/queue.log"
  # MRT_TPU_LOCK_HELD: the queue's flock IS the serialization — the python
  # tool inside must not re-take it (its phase subprocesses would deadlock)
  MRT_WATCHDOG_S=900 MRT_TPU_LOCK_HELD=1 flock "$LOCK" timeout "$@" \
    > "$LOG/$name.out" 2> "$LOG/$name.err"
  rc=$?
  echo "$(date -u +%T) [q] END $name rc=$rc" >> "$LOG/queue.log"
  # let tunnel-side frees land before the next phase allocates
  sleep 20
  if ! probe; then
    echo "$(date -u +%T) [q] relay died after $name; waiting" >> "$LOG/queue.log"
    while ! probe; do sleep 120; done
    sleep 10
  fi
}

cd /root/repo || exit 1
# ---- phases (edit per session; "key" = success-only JSON field) ----------
# ordered most-valuable-first in case the relay dies mid-queue
# (flash-T tuned defaults landed f7119d8 — e2e numbers below remeasure with it)
run qkint8_probe_r3 int8_speedup 1200 python tools/bench_qk_int8.py
run cog17_bf16_r3b sample_s 3600 python tools/bench_cogvideox.py
run bench_kernelwarm_r3 vs_baseline 2700 python bench.py
run cog49_bf16_r3b sample_s 3600 python tools/bench_cogvideox.py --frames 49
run svd_r3b compile_s 3600 python bench.py --phase svd
run cog17_int8_batched_r3b sample_s 3600 \
  python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
echo "$(date -u +%T) [q] queue done" >> "$LOG/queue.log"

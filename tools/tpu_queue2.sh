#!/bin/bash
# Follow-up serialized TPU queue: waits for tpu_queue.sh to finish (its
# "queue done" marker), then re-measures the CogVideoX phases with the
# subprocess-phased bench (decode in a fresh TPU client — the live-client
# HBM-reclaim failure ate every decode in queue 1), the overhead-cancelling
# int8 GEMM microbench, and the adaptive-caching serving modes.
# NEVER run while another TPU process is active (HBM co-tenancy).
LOG=/root/repo/.bench_logs
mkdir -p "$LOG"
probe() { timeout 3 bash -c "echo > /dev/tcp/127.0.0.1/8082" 2>/dev/null; }

echo "$(date -u +%T) [q2] waiting for queue 1..." >> $LOG/queue.log
while ! grep -q "queue done" $LOG/queue.log; do sleep 60; done
echo "$(date -u +%T) [q2] queue 1 done; waiting for relay" >> $LOG/queue.log
while ! probe; do sleep 120; done
sleep 20

run() {
  name=$1; shift
  if [ -s "$LOG/$name.out" ] && grep -q "{" "$LOG/$name.out"; then
    echo "$(date -u +%T) [q2] SKIP $name (already measured)" >> $LOG/queue.log
    return
  fi
  echo "$(date -u +%T) [q2] START $name" >> $LOG/queue.log
  MRT_WATCHDOG_S=900 timeout "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$(date -u +%T) [q2] END $name rc=$?" >> $LOG/queue.log
  sleep 20
  if ! probe; then
    echo "$(date -u +%T) [q2] relay died after $name; waiting" >> $LOG/queue.log
    while ! probe; do sleep 120; done
    sleep 10
  fi
}

cd /root/repo
run int8gemm_v2        1200 python tools/bench_int8_gemm.py
run cog17              3600 python tools/bench_cogvideox.py
run cog17_int8         3600 python tools/bench_cogvideox.py --quantize int8
run cog17_int8_batched 3600 python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
run cog49              3600 python tools/bench_cogvideox.py --frames 49
run cog49_int8         3600 python tools/bench_cogvideox.py --frames 49 --quantize int8
run cog49_int8_batched 3600 python tools/bench_cogvideox.py --frames 49 --quantize int8 --cfg-mode batched
run cog17_cached       3600 python tools/bench_cogvideox.py --cache-threshold 0.1
run dc_cached          3600 python tools/bench_dynamicrafter.py --cache-threshold 0.1
echo "$(date -u +%T) [q2] queue 2 done" >> $LOG/queue.log
run dc_blocks 3600 python tools/bench_dc_blocks.py
echo "$(date -u +%T) [q2] queue 2b done" >> $LOG/queue.log
run dc_int8   3600 python tools/bench_dynamicrafter.py --quantize int8
run dc_batched 3600 python tools/bench_dynamicrafter.py --cfg-mode batched
echo "$(date -u +%T) [q2] queue 2c done" >> $LOG/queue.log
run flash_dc_l0 1800 python tools/sweep_flash_attention.py 16 5 9216 64
run flash_dc_l1 1800 python tools/sweep_flash_attention.py 16 10 2304 64
echo "$(date -u +%T) [q2] queue 2d done" >> $LOG/queue.log
run train_cama 3600 python tools/bench_train.py --workload cama
run train_dc_adapter 3600 python tools/bench_train.py --workload dc_adapter
echo "$(date -u +%T) [q2] queue 2e done" >> $LOG/queue.log
run int8gemm_pallas 1200 python tools/bench_int8_gemm.py
echo "$(date -u +%T) [q2] queue 2f done" >> $LOG/queue.log
MRT_INT8_PALLAS=1 run cog17_int8_pallas 3600 python tools/bench_cogvideox.py --quantize int8 --cfg-mode batched
echo "$(date -u +%T) [q2] queue 2g done" >> $LOG/queue.log

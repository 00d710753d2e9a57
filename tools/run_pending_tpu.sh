#!/bin/bash
# Waits for the axon TPU tunnel to come back, then runs the queued round-3
# measurements (fat-leaf + leaf-queue traversal variants on real captured
# fronts). Logs to /tmp/pending_tpu.log. Safe to re-run.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/pending_tpu.log
echo "=== run_pending_tpu $(date) ===" >> "$LOG"

# 1. Wait for the device (tunnel init can take ~350 s when it returns).
for i in $(seq 1 200); do
  if timeout 500 python -c "import jax; d=jax.devices(); assert d and d[0].platform!='cpu', d; print(d)" >> "$LOG" 2>&1; then
    echo "device up after attempt $i $(date)" >> "$LOG"
    break
  fi
  echo "attempt $i: device still down $(date)" >> "$LOG"
  sleep 90
  if [ "$i" = 200 ]; then echo "GIVING UP" >> "$LOG"; exit 1; fi
done

# 2. Pop-count stats are already known from the CPU evaluator; measure WALL
#    time of the variants on real captured fronts.
echo "--- bench_fronts prod,dual,leaf16,leaf24 ---" >> "$LOG"
timeout 5400 python tools/bench_fronts.py 512 \
  --variants prod,dual,leaf16,leaf24 >> "$LOG" 2>&1
echo "--- bench_fronts lq4,lq8 ---" >> "$LOG"
timeout 3600 python tools/bench_fronts.py 512 \
  --variants prod,lq4,lq8 >> "$LOG" 2>&1
echo "=== done $(date) ===" >> "$LOG"

#!/bin/bash
# Consolidated round-3 queued TPU measurements (replaces run_pending_tpu.sh
# and run_pending_tpu2.sh, whose waiters were stopped before they ran).
# Waits for the axon tunnel to come back, then runs in PRIORITY order:
#   1. steady-drain kernel decision (prod vs sd2 vs dual-expand sdd3/sdd4)
#      — the CPU economics (tools/eval_lq.py) predict sdd3 cuts the
#      dominant-front iteration count 4.6x; this decides the production
#      kernel.
#   2. windowed live-lane compaction (wc8/wc16) — orthogonal iteration cut.
#   3. leaf-queue lq8 + fat-leaf leaf24, for the record.
# Logs to /tmp/pending_tpu3.log. Safe to re-run.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/pending_tpu3.log
echo "=== run_pending_tpu3 $(date) ===" >> "$LOG"

for i in $(seq 1 200); do
  if timeout 500 python -c "import jax; d=jax.devices(); assert d and d[0].platform!='cpu', d; print(d)" >> "$LOG" 2>&1; then
    echo "device up after attempt $i $(date)" >> "$LOG"
    break
  fi
  echo "attempt $i: device still down $(date)" >> "$LOG"
  sleep 90
  if [ "$i" = 200 ]; then echo "GIVING UP" >> "$LOG"; exit 1; fi
done

echo "--- 1. bench_fronts prod,sd2,sdd2,sdd3,sdd4 ---" >> "$LOG"
timeout 5400 python tools/bench_fronts.py 512 \
  --variants prod,sd2,sdd2,sdd3,sdd4 >> "$LOG" 2>&1
echo "--- 2. bench_fronts prod,wc8,wsd8,wsd16 ---" >> "$LOG"
timeout 3600 python tools/bench_fronts.py 512 \
  --variants prod,wc8,wsd8,wsd16 >> "$LOG" 2>&1
echo "--- 3. bench_fronts prod,lq8,leaf24 ---" >> "$LOG"
timeout 3600 python tools/bench_fronts.py 512 \
  --variants prod,lq8,leaf24 >> "$LOG" 2>&1
echo "=== done $(date) ===" >> "$LOG"

#!/bin/bash
# Phase 2 of the queued TPU measurements: waits for run_pending_tpu.sh to
# finish (its "=== done" marker), then measures windowed live-lane
# compaction variants on real captured fronts. Logs to /tmp/pending_tpu2.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/pending_tpu2.log
echo "=== run_pending_tpu2 $(date) ===" >> "$LOG"

for i in $(seq 1 600); do
  if grep -q "^=== done" /tmp/pending_tpu.log 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "^=== done" /tmp/pending_tpu.log 2>/dev/null; then
  echo "phase 1 never finished; aborting $(date)" >> "$LOG"
  exit 1
fi

echo "--- bench_fronts prod,wc8,wc16,wcg8 ---" >> "$LOG"
timeout 5400 python tools/bench_fronts.py 512 \
  --variants prod,wc8,wc16,wc256,wcg8 >> "$LOG" 2>&1
echo "=== done $(date) ===" >> "$LOG"

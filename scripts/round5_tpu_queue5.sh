#!/bin/bash
# Round-5 queue 5 (waits on queue 4): one-off measurement of the
# geometry-tuned window (96,128,96) at the shipped overlap 0.125 —
# y=128 snaps 1024 exactly (window inflation 1.60x -> 1.47x).
cd /root/repo
mkdir -p outputs/round5

if [ -f /tmp/queue4.pid ]; then
  while kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== bench_fast_win96x128x96 $(date +%H:%M:%S)" | tee -a outputs/round5/queue5.log
BENCH_RECIPE=fast BENCH_WINDOW=96,128,96 BENCH_VARIANTS=0 python bench.py \
  > outputs/round5/bench_fast_win96x128x96.log 2>&1 \
  || echo "=== bench_fast_win96x128x96 FAILED" | tee -a outputs/round5/queue5.log
tail -1 outputs/round5/bench_fast_win96x128x96.log | tee -a outputs/round5/queue5.log

echo "=== queue5 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue5.log

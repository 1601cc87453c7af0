#!/bin/bash
# Round-5 queue 2 (waits on queue 1): push the overlap-quality frontier
# below 0.125 on CONVERGED weights (inference-only, isolates the knob):
#  - binary QB ld legs at ov0.0625 and ov0 with the 24k aniso weights
#    (r4 chain showed 0.5 -> 0.125 is flat: 0.9586/0.9572/0.9582);
#  - matching throughput points via one-off bench runs (fast recipe at
#    0.0625/0; stock at 0.125 — the reference-exact-arch quality-neutral
#    point, measured 0.9635 binary / best instance VOI in QUALITY.md).
cd /root/repo
mkdir -p outputs/round5
T=outputs/round4/pfs122_24000.msgpack

if [ -f /tmp/queue5_1.pid ]; then
  while kill -0 "$(cat /tmp/queue5_1.pid)" 2>/dev/null; do sleep 60; done
fi

runq() {
  script=$1; name=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue.log
    if env "$@" python "scripts/$script" > "outputs/round5/${name}.log" 2>&1; then
      tail -2 "outputs/round5/${name}.log" | tee -a outputs/round5/queue.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round5/queue.log
    tail -3 "outputs/round5/${name}.log" | tee -a outputs/round5/queue.log
    sleep 180
  done
}

benchq() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue.log
  env "$@" BENCH_VARIANTS=0 python bench.py > "outputs/round5/${name}.log" 2>&1 \
    || echo "=== $name FAILED" | tee -a outputs/round5/queue.log
  tail -1 "outputs/round5/${name}.log" | tee -a outputs/round5/queue.log
}

runq quality_benchmark.py qb_pfs122_ov00625 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_LOAD_PARAMS=$T QB_OVERLAP=0.0625
runq quality_benchmark.py qb_pfs122_ov0 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_LOAD_PARAMS=$T QB_OVERLAP=0

benchq bench_fast_ov00625 BENCH_RECIPE=fast BENCH_OVERLAP=0.0625
benchq bench_fast_ov0     BENCH_RECIPE=fast BENCH_OVERLAP=0
benchq bench_stock_ov0125 BENCH_RECIPE=stock BENCH_OVERLAP=0.125

echo "=== queue2 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue.log

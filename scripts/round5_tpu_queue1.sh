#!/bin/bash
# Round-5 queue 1:
#  1) bench.py full run — validates the newly-shipped ov0.125 fast-recipe
#     headline (was a variant in BENCH_r04: 73.54 Mvox/s, 2.125x) end to end.
#  2) instance-quality chain for the SHIPPED recipe (pfs122 = aniso (1,2,2)
#     patchify stem): train once at 2400 steps, save params, sweep overlap
#     {0.5, 0.25, 0.125} on identical weights. Closes the evidence gap that
#     the instance-VOI overlap rows were stock-arch only.
cd /root/repo
mkdir -p outputs/round5
IP=outputs/round5/iq_pfs122_2400.msgpack

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

echo "=== bench $(date +%H:%M:%S)" | tee -a outputs/round5/queue.log
python bench.py > outputs/round5/bench_headline.log 2>&1 \
  || echo "=== bench FAILED" | tee -a outputs/round5/queue.log
tail -1 outputs/round5/bench_headline.log | tee -a outputs/round5/queue.log

runq instance_quality_benchmark.py iq_pfs122_2400 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_STEPS=2400 IQ_SAVE_PARAMS=$IP
runq instance_quality_benchmark.py iq_pfs122_ov025 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_LOAD_PARAMS=$IP IQ_OVERLAP=0.25
runq instance_quality_benchmark.py iq_pfs122_ov0125 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_LOAD_PARAMS=$IP IQ_OVERLAP=0.125

echo "=== queue1 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue.log

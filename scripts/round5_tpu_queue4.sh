#!/bin/bash
# Round-5 queue 4: qualify overlap 0.0625 as a shipping candidate on FRESH
# weights (the r4 msgpack params were wiped with outputs/ on the host reset).
# With the r5 value-only-scatter engine, aniso-patchify throughput is
# 96.7 Mvox/s at ov0.125 vs 104.1 at ov0.0625 (bench_r5_optimized) — worth
# an instance-VOI qualification; binary was already flat (0.9582/0.9561).
#  1) binary QB: retrain pfs122 @24k, save params, ld legs at 0.125/0.0625
#  2) instance QB: retrain pfs122 @2400, save params, ld legs at 0.125/0.0625
cd /root/repo
mkdir -p outputs/round5
BT=outputs/round5/pfs122_24000.msgpack
IT=outputs/round5/iq_pfs122_2400.msgpack

runq() {
  script=$1; name=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue4.log
    if env "$@" python "scripts/$script" > "outputs/round5/${name}.log" 2>&1; then
      tail -2 "outputs/round5/${name}.log" | tee -a outputs/round5/queue4.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round5/queue4.log
    tail -3 "outputs/round5/${name}.log" | tee -a outputs/round5/queue4.log
    sleep 180
  done
}

runq quality_benchmark.py qb_pfs122_24k_r5 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_STEPS=24000 QB_SAVE_PARAMS=$BT
runq quality_benchmark.py qb_pfs122_r5_ov0125 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_LOAD_PARAMS=$BT QB_OVERLAP=0.125
runq quality_benchmark.py qb_pfs122_r5_ov00625 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_LOAD_PARAMS=$BT QB_OVERLAP=0.0625

runq instance_quality_benchmark.py iq_pfs122_r5_2400 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_STEPS=2400 IQ_SAVE_PARAMS=$IT
runq instance_quality_benchmark.py iq_pfs122_r5_ov0125 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_LOAD_PARAMS=$IT IQ_OVERLAP=0.125
runq instance_quality_benchmark.py iq_pfs122_r5_ov00625 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_LOAD_PARAMS=$IT IQ_OVERLAP=0.0625

echo "=== queue4 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue4.log

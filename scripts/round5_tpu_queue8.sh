#!/bin/bash
# Round-5 queue 8: converged-budget stock-arch instance row (apples-to-apples
# vs queue7's pfs122@24k 0.9488/0.9479) + the ov0.0625 leg on the saved
# pfs122 24k weights (frontier completeness).
cd /root/repo
mkdir -p outputs/round5
S24=outputs/round5/iq_stock_24000.msgpack
I24=outputs/round5/iq_pfs122_24000.msgpack

runq() {
  script=$1; name=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue8.log
    if env "$@" python "scripts/$script" > "outputs/round5/${name}.log" 2>&1; then
      tail -2 "outputs/round5/${name}.log" | tee -a outputs/round5/queue8.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round5/queue8.log
    tail -3 "outputs/round5/${name}.log" | tee -a outputs/round5/queue8.log
    sleep 180
  done
}

runq instance_quality_benchmark.py iq_pfs122_24k_ov00625 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_LOAD_PARAMS=$I24 IQ_OVERLAP=0.0625

runq instance_quality_benchmark.py iq_stock_24k_r5 \
  IQ_STEPS=24000 IQ_SAVE_PARAMS=$S24
runq instance_quality_benchmark.py iq_stock_24k_ov0125 \
  IQ_LOAD_PARAMS=$S24 IQ_OVERLAP=0.125

echo "=== queue8 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue8.log

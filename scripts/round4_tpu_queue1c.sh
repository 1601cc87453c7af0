#!/bin/bash
# Round-4 queue 1c: the overlap-quality frontier (VERDICT r3 item 2), now
# that non-dividing strides run via predict_volume_device's accumulator
# fallback. Binary legs reuse the converged stock teacher (inference-only,
# isolates the overlap knob); instance legs train once at 2400 steps, save
# params, then sweep overlap on identical weights.
cd /root/repo
T=outputs/round4/teacher_stock_24k.msgpack
IP=outputs/round4/instance_2400.msgpack

if [ -f /tmp/queue1b.pid ]; then
  while kill -0 "$(cat /tmp/queue1b.pid)" 2>/dev/null; do sleep 30; done
fi

runq() {
  script=$1; name=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round4/queue.log
    if env "$@" python "scripts/$script" > "outputs/round4/${name}.log" 2>&1; then
      tail -2 "outputs/round4/${name}.log" | tee -a outputs/round4/queue.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round4/queue.log
    tail -3 "outputs/round4/${name}.log" | tee -a outputs/round4/queue.log
    sleep 180
  done
}

runq quality_benchmark.py overlap_025  QB_LOAD_PARAMS=$T QB_OVERLAP=0.25
runq quality_benchmark.py overlap_0125 QB_LOAD_PARAMS=$T QB_OVERLAP=0.125

runq instance_quality_benchmark.py iq_base_2400 IQ_SAVE_PARAMS=$IP IQ_STEPS=2400
runq instance_quality_benchmark.py iq_ov025  IQ_LOAD_PARAMS=$IP IQ_OVERLAP=0.25
runq instance_quality_benchmark.py iq_ov0125 IQ_LOAD_PARAMS=$IP IQ_OVERLAP=0.125

echo "=== queue1c done $(date +%H:%M:%S)" | tee -a outputs/round4/queue.log

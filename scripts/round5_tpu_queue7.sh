#!/bin/bash
# Round-5 queue 7 (waits on queue 6): instance-task depth for the SHIPPED
# recipe (pfs122 = aniso (1,2,2) patchify stem).
#  1) converged budget: IQ 24000 steps (tracked rows stop at 2400) — does
#     the instance chain keep converging like the binary one?
#  2) ld leg at the shipped ov0.125 point on those weights.
#  3) long-range offsets at 2400: fills the mutex column with a sane value
#     for the shipped arch (short-range-only mutex is known-degenerate,
#     VOI ~7.35 — the preflight warns about exactly this).
cd /root/repo
mkdir -p outputs/round5
I24=outputs/round5/iq_pfs122_24000.msgpack

if [ -f /tmp/queue6.pid ]; then
  while kill -0 "$(cat /tmp/queue6.pid)" 2>/dev/null; do sleep 60; done
fi

runq() {
  script=$1; name=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue7.log
    if env "$@" python "scripts/$script" > "outputs/round5/${name}.log" 2>&1; then
      tail -2 "outputs/round5/${name}.log" | tee -a outputs/round5/queue7.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round5/queue7.log
    tail -3 "outputs/round5/${name}.log" | tee -a outputs/round5/queue7.log
    sleep 180
  done
}

runq instance_quality_benchmark.py iq_pfs122_24k_r5 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_STEPS=24000 IQ_SAVE_PARAMS=$I24
runq instance_quality_benchmark.py iq_pfs122_24k_ov0125 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_LOAD_PARAMS=$I24 IQ_OVERLAP=0.125
runq instance_quality_benchmark.py iq_pfs122_lr_2400 \
  IQ_ARCH=patchify IQ_PATCHIFY_STRIDE=1,2,2 IQ_OFFSETS=long IQ_STEPS=2400

echo "=== queue7 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue7.log

#!/bin/bash
# Round-5 queue 6 (waits on the post-commit bench): final-round quality legs.
#  1) binary QB: pfs122 at a 48k-step budget (2x the tracked 24k) — does the
#     fast recipe keep converging toward stock's 0.9636 (0.9586 @24k)?
#  2) ld leg at the shipped ov0.125 operating point on those weights.
#  3) production-CLI fast-recipe train+test re-run — exercises the r5
#     on-device inverse-weight engine path (window.py _snap_inv_weight)
#     through scripts/main.py on the real chip.
cd /root/repo
mkdir -p outputs/round5
B48=outputs/round5/pfs122_48000.msgpack

if [ -f /tmp/bench_r5.pid ]; then
  while kill -0 "$(cat /tmp/bench_r5.pid)" 2>/dev/null; do sleep 60; done
fi

runq() {
  script=$1; name=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue6.log
    if env "$@" python "scripts/$script" > "outputs/round5/${name}.log" 2>&1; then
      tail -2 "outputs/round5/${name}.log" | tee -a outputs/round5/queue6.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round5/queue6.log
    tail -3 "outputs/round5/${name}.log" | tee -a outputs/round5/queue6.log
    sleep 180
  done
}

runq quality_benchmark.py qb_pfs122_48k_r5 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_STEPS=48000 QB_SAVE_PARAMS=$B48
runq quality_benchmark.py qb_pfs122_48k_ov0125 \
  QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_LOAD_PARAMS=$B48 QB_OVERLAP=0.125

echo "=== cli_fast train $(date +%H:%M:%S)" | tee -a outputs/round5/queue6.log
python scripts/main.py --config tutorials/mito_lucchi_tpu_fast.yaml --mode train \
  system.rng_seed=7 monitor.log_every=100 \
  > outputs/round5/cli_fast_train_r5b.log 2>&1 \
  || echo "=== cli_fast train FAILED" | tee -a outputs/round5/queue6.log
tail -2 outputs/round5/cli_fast_train_r5b.log | tee -a outputs/round5/queue6.log

echo "=== cli_fast test $(date +%H:%M:%S)" | tee -a outputs/round5/queue6.log
python scripts/main.py --config tutorials/mito_lucchi_tpu_fast.yaml --mode test \
  > outputs/round5/cli_fast_test_r5b.log 2>&1 \
  || echo "=== cli_fast test FAILED" | tee -a outputs/round5/queue6.log
tail -3 outputs/round5/cli_fast_test_r5b.log | tee -a outputs/round5/queue6.log

echo "=== queue6 done $(date +%H:%M:%S)" | tee -a outputs/round5/queue6.log

#!/bin/bash
# Round-5 queue 3 (waits on the revalidation bench):
#  1) engine overhead probe — measures the r5 separable-normalizer engine
#     (value-only scatter) vs the pre-r5 two-accumulator engine at the
#     shipped operating point on the bench geometry.
#  2) production-CLI train+test of the SHIPPED fast recipe
#     (tutorials/mito_synthetic_cli_fast_tpu.yaml) — r4 only validated the
#     stock arch through scripts/main.py.
#  3) fresh bench.py headline with the optimized engine.
cd /root/repo
mkdir -p outputs/round5
log() { echo "=== $* $(date +%H:%M:%S)" | tee -a outputs/round5/queue3.log; }

if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 60; done
fi

log engine_probe
python scripts/tpu_engine_probe.py > outputs/round5/engine_probe.log 2>&1 \
  || log engine_probe FAILED
grep "engine_probe" outputs/round5/engine_probe.log | tee -a outputs/round5/queue3.log

log cli_fast_train
python scripts/main.py --config tutorials/mito_synthetic_cli_fast_tpu.yaml \
  --mode train > outputs/round5/cli_fast_train.log 2>&1 || log cli_fast_train FAILED
tail -2 outputs/round5/cli_fast_train.log | tee -a outputs/round5/queue3.log

log cli_fast_test
python scripts/main.py --config tutorials/mito_synthetic_cli_fast_tpu.yaml \
  --mode test > outputs/round5/cli_fast_test.log 2>&1 || log cli_fast_test FAILED
tail -2 outputs/round5/cli_fast_test.log | tee -a outputs/round5/queue3.log

log bench_r5_optimized
python bench.py > outputs/round5/bench_r5_optimized.log 2>&1 \
  || log bench_r5_optimized FAILED
tail -1 outputs/round5/bench_r5_optimized.log | tee -a outputs/round5/queue3.log

log queue3 done

#!/bin/bash
# Round-4 TPU queue part 2: production-CLI run (VERDICT item 7) and the
# tune -> tune-test tracked row (item 8). Waits for queue part 1.
cd /root/repo
mkdir -p outputs/round4

if [ -f /tmp/queue.pid ]; then
  while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 30; done
fi

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a outputs/round4/queue2.log; }

# 1) production CLI: train then test on the mito synthetic recipe
log cli_train
python scripts/main.py --config tutorials/mito_synthetic_cli_tpu.yaml \
  --mode train > outputs/round4/cli_train.log 2>&1 || log cli_train FAILED
tail -2 outputs/round4/cli_train.log | tee -a outputs/round4/queue2.log

log cli_test
python scripts/main.py --config tutorials/mito_synthetic_cli_tpu.yaml \
  --mode test > outputs/round4/cli_test.log 2>&1 || log cli_test FAILED
tail -2 outputs/round4/cli_test.log | tee -a outputs/round4/queue2.log

# 2) tune -> tune-test row
log tune_train
python scripts/main.py --config tutorials/synthetic_instance_tune_tpu.yaml \
  --mode train > outputs/round4/tune_train.log 2>&1 || log tune_train FAILED
tail -2 outputs/round4/tune_train.log | tee -a outputs/round4/queue2.log

log tune_tune
python scripts/main.py --config tutorials/synthetic_instance_tune_tpu.yaml \
  --mode tune > outputs/round4/tune_tune.log 2>&1 || log tune_tune FAILED
tail -3 outputs/round4/tune_tune.log | tee -a outputs/round4/queue2.log

BP=$(ls outputs/synthetic_instance_tune/tune/*best_params.yaml 2>/dev/null | head -1)
log "tune_tunetest (best_params=$BP)"
python scripts/main.py --config tutorials/synthetic_instance_tune_tpu.yaml \
  --mode tune-test --best-params "$BP" \
  'data.test.image=synthetic://instance/tune_volB_image?shape=32,128,128&seed=23' \
  'data.test.label=synthetic://instance/tune_volB_label?shape=32,128,128&seed=23' \
  > outputs/round4/tune_tunetest.log 2>&1 || log tune_tunetest FAILED
tail -2 outputs/round4/tune_tunetest.log | tee -a outputs/round4/queue2.log

log queue2 done

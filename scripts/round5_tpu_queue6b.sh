#!/bin/bash
# Round-5 queue 6b: redo the queue-6 CLI legs with the right config —
# queue 6 pointed at the real-data tutorial (no dataset on this host) and a
# bad key (system.rng_seed; the schema key is system.seed). This is the
# production-CLI drive of the r5 on-device inverse-weight engine
# (window.py _snap_inv_weight) on the real chip.
cd /root/repo
mkdir -p outputs/round5

# serialize behind queue 7 — one TPU job at a time through the tunnel
if [ -f /tmp/queue7.pid ]; then
  while kill -0 "$(cat /tmp/queue7.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== cli_fast train $(date +%H:%M:%S)" | tee -a outputs/round5/queue6b.log
python scripts/main.py --config tutorials/mito_synthetic_cli_fast_tpu.yaml \
  --mode train system.seed=7 \
  > outputs/round5/cli_fast_train_r5c.log 2>&1 \
  || echo "=== cli_fast train FAILED" | tee -a outputs/round5/queue6b.log
tail -2 outputs/round5/cli_fast_train_r5c.log | tee -a outputs/round5/queue6b.log

echo "=== cli_fast test $(date +%H:%M:%S)" | tee -a outputs/round5/queue6b.log
python scripts/main.py --config tutorials/mito_synthetic_cli_fast_tpu.yaml \
  --mode test \
  > outputs/round5/cli_fast_test_r5c.log 2>&1 \
  || echo "=== cli_fast test FAILED" | tee -a outputs/round5/queue6b.log
tail -3 outputs/round5/cli_fast_test_r5c.log | tee -a outputs/round5/queue6b.log

echo "=== queue6b done $(date +%H:%M:%S)" | tee -a outputs/round5/queue6b.log

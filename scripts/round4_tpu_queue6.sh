#!/bin/bash
# Round-4 TPU queue part 6: longer production-CLI leg. The queue5 CLI run
# validated the fixed checkpoint auto-resolve (jaccard 0.022 -> 0.2876) but
# its 150-step budget (chosen to bound tunnel IO) undertrains vs the QB
# curve (0.80@800 steps). Re-train through the SAME shipped CLI at 800 steps
# and re-test; the test leg also exercises checkpoint-provenance cache
# invalidation (the queue5 prediction cache records the 150-step checkpoint,
# so the resolver must recompute rather than reuse).
cd /root/repo
mkdir -p outputs/round4

if [ -f /tmp/queue5.pid ]; then
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 60; done
fi

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a outputs/round4/queue6.log; }

log cli_train_800
python scripts/main.py --config tutorials/mito_synthetic_cli_tpu.yaml \
  --mode train \
  optimization.n_steps_per_epoch=200 optimization.max_epochs=4 \
  > outputs/round4/cli_train_800.log 2>&1 || log cli_train_800 FAILED
tail -2 outputs/round4/cli_train_800.log | tee -a outputs/round4/queue6.log

log cli_test_800
python scripts/main.py --config tutorials/mito_synthetic_cli_tpu.yaml \
  --mode test > outputs/round4/cli_test_800.log 2>&1 || log cli_test_800 FAILED
tail -2 outputs/round4/cli_test_800.log | tee -a outputs/round4/queue6.log
grep -h "auto-resolved checkpoint\|cache" outputs/round4/cli_test_800.log \
  | tail -3 | tee -a outputs/round4/queue6.log

log queue6 done

#!/bin/bash
# Round-4 TPU queue part 5: re-run the production-CLI and tune->tune-test
# legs (queue2) now that test/tune modes auto-resolve the trained checkpoint
# (runtime/dispatch.py::resolve_latest_checkpoint) — the first pass ran them
# with RANDOM weights (jaccard 0.022 / VOI 6.5, see CLAUDE.md round-4
# findings). Stale pre-fix output dirs are deleted first for a clean rerun
# (their checkpoint="" attrs now normalize to random-init and would be
# auto-invalidated anyway once a real checkpoint exists).
# Then: aniso (1,2,2) patchify-stem QB at 9600/24000 steps to map the fast
# recipe's quality plateau (stock plateaus 0.9636@24k; pfs122 is 0.9082@2400).
cd /root/repo
mkdir -p outputs/round4

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a outputs/round4/queue5.log; }

rm -rf outputs/mito_synthetic_cli outputs/synthetic_instance_tune

# 1) production CLI: train then test (checkpoint auto-resolved this time)
log cli_train
python scripts/main.py --config tutorials/mito_synthetic_cli_tpu.yaml \
  --mode train > outputs/round4/cli_train2.log 2>&1 || log cli_train FAILED
tail -2 outputs/round4/cli_train2.log | tee -a outputs/round4/queue5.log

log cli_test
python scripts/main.py --config tutorials/mito_synthetic_cli_tpu.yaml \
  --mode test > outputs/round4/cli_test2.log 2>&1 || log cli_test FAILED
tail -2 outputs/round4/cli_test2.log | tee -a outputs/round4/queue5.log
grep -h "auto-resolved checkpoint" outputs/round4/cli_test2.log | tail -1 \
  | tee -a outputs/round4/queue5.log

# 2) tune -> tune-test row (tune on volume A, apply best params to held-out B)
log tune_train
python scripts/main.py --config tutorials/synthetic_instance_tune_tpu.yaml \
  --mode train > outputs/round4/tune_train2.log 2>&1 || log tune_train FAILED
tail -2 outputs/round4/tune_train2.log | tee -a outputs/round4/queue5.log

log tune_tune
python scripts/main.py --config tutorials/synthetic_instance_tune_tpu.yaml \
  --mode tune > outputs/round4/tune_tune2.log 2>&1 || log tune_tune FAILED
tail -3 outputs/round4/tune_tune2.log | tee -a outputs/round4/queue5.log

BP=$(ls -t outputs/synthetic_instance_tune/*/tune/*best_params.yaml \
       outputs/synthetic_instance_tune/tune/*best_params.yaml 2>/dev/null | head -1)
log "tune_tunetest (best_params=$BP)"
python scripts/main.py --config tutorials/synthetic_instance_tune_tpu.yaml \
  --mode tune-test --best-params "$BP" \
  'data.test.image=synthetic://instance/tune_volB_image?shape=32,128,128&seed=23' \
  'data.test.label=synthetic://instance/tune_volB_label?shape=32,128,128&seed=23' \
  > outputs/round4/tune_tunetest2.log 2>&1 || log tune_tunetest FAILED
tail -2 outputs/round4/tune_tunetest2.log | tee -a outputs/round4/queue5.log

# 3) aniso patchify stem at larger training budgets (quality plateau)
log pfs122_9600
QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_STEPS=9600 \
  QB_SAVE_PARAMS=outputs/round4/pfs122_9600.msgpack \
  python scripts/quality_benchmark.py > outputs/round4/pfs122_9600.log 2>&1 \
  || log pfs122_9600 FAILED
tail -2 outputs/round4/pfs122_9600.log | tee -a outputs/round4/queue5.log

log pfs122_24000
QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_STEPS=24000 \
  QB_SAVE_PARAMS=outputs/round4/pfs122_24000.msgpack \
  python scripts/quality_benchmark.py > outputs/round4/pfs122_24000.log 2>&1 \
  || log pfs122_24000 FAILED
tail -2 outputs/round4/pfs122_24000.log | tee -a outputs/round4/queue5.log

# 4) converged pfs122 at overlap 0.25 (the shipped fast-recipe operating point)
log pfs122_24000_ov025
QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_OVERLAP=0.25 \
  QB_LOAD_PARAMS=outputs/round4/pfs122_24000.msgpack QB_STEPS=0 \
  python scripts/quality_benchmark.py > outputs/round4/pfs122_24000_ov025.log 2>&1 \
  || log pfs122_24000_ov025 FAILED
tail -2 outputs/round4/pfs122_24000_ov025.log | tee -a outputs/round4/queue5.log

log queue5 done

#!/bin/bash
# Round-4 TPU experiment queue (VERDICT r3 items 1 + 2).
# Serial on the single chip; each job logs to outputs/round4/ and appends its
# QUALITY.md row. Failures don't stop the queue.
cd /root/repo
mkdir -p outputs/round4
T=outputs/round4/teacher_stock_24k.msgpack

# wait for the teacher training run (started separately) to finish
if [ -f /tmp/qb_teacher.pid ]; then
  while kill -0 "$(cat /tmp/qb_teacher.pid)" 2>/dev/null; do sleep 30; done
fi
if [ ! -f "$T" ]; then
  echo "teacher params missing: $T" >&2
fi

run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a outputs/round4/queue.log
  env "$@" python scripts/quality_benchmark.py \
    > "outputs/round4/${name}.log" 2>&1 || \
    echo "=== $name FAILED" | tee -a outputs/round4/queue.log
  tail -2 "outputs/round4/${name}.log" | tee -a outputs/round4/queue.log
}

# 1) distillation into the patchify student (the headline lever)
run distill_a05_2400 QB_ARCH=patchify QB_DISTILL_TEACHER=$T QB_DISTILL_ALPHA=0.5 QB_STEPS=2400
run distill_a09_2400 QB_ARCH=patchify QB_DISTILL_TEACHER=$T QB_DISTILL_ALPHA=0.9 QB_STEPS=2400

# 2) anisotropic (1,2,2) patchify stem probe — between stock and isotropic
run aniso_2400 QB_ARCH=patchify QB_PATCHIFY_STRIDE=1,2,2 QB_STEPS=2400

# 3) overlap-quality frontier on IDENTICAL weights (the converged teacher),
#    inference-only: isolates the overlap effect from training noise
run overlap_050 QB_LOAD_PARAMS=$T QB_OVERLAP=0.5
run overlap_025 QB_LOAD_PARAMS=$T QB_OVERLAP=0.25
run overlap_0125 QB_LOAD_PARAMS=$T QB_OVERLAP=0.125

echo "=== queue done $(date +%H:%M:%S)" | tee -a outputs/round4/queue.log

#!/bin/bash
# Round-4 queue 1b: re-run the distill legs that hit transient
# remote-compile tunnel failures in queue 1 (both died on the tiny data-gen
# compile, minutes after the teacher job freed the chip — a known
# tunnel-recovery window, CLAUDE.md), plus the 9600-step distill budget legs.
# Each leg retries once after a 180 s cool-down.
cd /root/repo
T=outputs/round4/teacher_stock_24k.msgpack

# serial chip use: wait for queue 2 to drain
if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  for attempt in 1 2; do
    echo "=== $name try$attempt: $* $(date +%H:%M:%S)" | tee -a outputs/round4/queue.log
    if env "$@" python scripts/quality_benchmark.py \
        > "outputs/round4/${name}.log" 2>&1; then
      tail -2 "outputs/round4/${name}.log" | tee -a outputs/round4/queue.log
      return 0
    fi
    echo "=== $name try$attempt FAILED" | tee -a outputs/round4/queue.log
    tail -3 "outputs/round4/${name}.log" | tee -a outputs/round4/queue.log
    sleep 180
  done
}

run distill_a05_2400 QB_ARCH=patchify QB_DISTILL_TEACHER=$T QB_DISTILL_ALPHA=0.5 QB_STEPS=2400
run distill_a09_2400 QB_ARCH=patchify QB_DISTILL_TEACHER=$T QB_DISTILL_ALPHA=0.9 QB_STEPS=2400
run distill_a05_9600 QB_ARCH=patchify QB_DISTILL_TEACHER=$T QB_DISTILL_ALPHA=0.5 QB_STEPS=9600
run distill_a09_9600 QB_ARCH=patchify QB_DISTILL_TEACHER=$T QB_DISTILL_ALPHA=0.9 QB_STEPS=9600

echo "=== queue1b done $(date +%H:%M:%S)" | tee -a outputs/round4/queue.log

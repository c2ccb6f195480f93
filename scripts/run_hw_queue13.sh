#!/bin/bash
# Round-5 hardware queue 13 — final validation pass:
#  (1) flagship chunked-fused guided serving, 2 clips with the auto-derived
#      chunk plan: re-validates the 807 s steady-state number on the round-5
#      code (auto exec-chunk, ADVICE donation fixes, cache-key changes) and
#      the repeat-clip pattern that reuses caller-owned data buffers,
#  (2) bench sanity at the very end (the driver runs the same afterwards).
# Launch: setsid bash scripts/run_hw_queue13.sh > /tmp/r5_queue13.log 2>&1 &
cd /root/repo

timeout 10800 python scripts/run_e2e_guided.py --mode fused \
  --exec-chunk auto > /tmp/r5_flagship_final.log 2>&1
echo "=== 1 done: $? ==="

timeout 3600 python bench.py > /tmp/r5_bench_final.log 2>&1
echo "=== 2 done: $? ==="
echo QUEUE13-DONE

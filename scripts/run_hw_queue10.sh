#!/bin/bash
# Round-5 hardware queue 10 — VERDICT r4 worklist, chip half:
#  (1) bench validity on a cold chip (item 1),
#  (2) bench validity immediately after an induced OOM (item 1's third state),
#  (3) int6-FFN chunked-fused retry with the donate-data capacity lever +
#      auto-sized chunks (item 2 + 8),
#  (4) guided-720p capacity probe — the north-star config (item 3),
#  (5) multi-seed drift distribution (item 7),
#  (6) vc with the steady-state decode split (item 4),
#  (7) refine-720p with the steady-state decode split (item 4).
# Launch: setsid bash scripts/run_hw_queue10.sh > /tmp/r5_queue10.log 2>&1 &
cd /root/repo

# (1) bench on the cold chip — the round's official artifact must reproduce
timeout 3600 python bench.py > /tmp/r5_bench_cold.log 2>&1
echo "=== 1 done: $? ==="

# (2) induced-OOM bench validation (same process tree, hog forces fallback)
timeout 3600 python scripts/probe_bench_after_oom.py --keep-hog-gb 10 \
  > /tmp/r5_bench_after_oom.log 2>&1
echo "=== 2 done: $? ==="

# (3) int6-FFN chunked-fused with donate-data + auto chunk plan
timeout 9000 python scripts/run_e2e_guided.py --mode fused \
  --exec-chunk auto --quant int6-ffn --donate-data --no-repeat \
  > /tmp/r5_int6_chunked_donate.log 2>&1
echo "=== 3 done: $? ==="

# (4) guided-720p capacity probe (phases isolated; rc 2/3/4 = which failed)
timeout 7200 python scripts/probe_720p_guided_capacity.py \
  > /tmp/r5_720p_capacity.log 2>&1
echo "=== 4 done: $? ==="

# (5) multi-seed drift distribution (all 4 quant rungs x 5 seeds)
timeout 14400 python scripts/measure_int4_drift_prod.py --seeds 5 \
  > /tmp/r5_drift_seeds.log 2>&1
echo "=== 5 done: $? ==="

# (6) vc continuation with the decode split (clips=2 for steady denoise)
timeout 10800 python scripts/run_e2e_vc.py --clips 2 \
  > /tmp/r5_vc_decode_split.log 2>&1
echo "=== 6 done: $? ==="

# (7) refine-720p with the decode split
timeout 10800 python scripts/run_e2e_refine_720p.py --clips 1 \
  > /tmp/r5_refine_decode_split.log 2>&1
echo "=== 7 done: $? ==="

# (8) bench sanity at queue end (the driver runs bench.py after the round)
timeout 3600 python bench.py > /tmp/r5_bench_warm.log 2>&1
echo "=== 8 done: $? ==="
echo QUEUE10-DONE

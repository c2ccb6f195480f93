#!/bin/bash
# Round-4 hardware queue 9 — quality-recommended recipe (int6-FFN) in the
# fastest serving mode (chunked fused), then a bench.py sanity pass.
# Launch: setsid bash scripts/run_hw_queue9.sh > /tmp/r4_queue9.log 2>&1 &
cd /root/repo

# (0) wait for queue8
while ps -p 30736 > /dev/null 2>&1; do sleep 30; done
echo "=== 0: queue8 done ==="

# (1) int6-FFN flagship guided, chunked fused serving
timeout 9000 python scripts/run_e2e_guided.py --mode fused --exec-chunk 4 \
  --quant int6-ffn --no-repeat > /tmp/r4_wan_int6_chunked.log 2>&1
echo "=== 1 done: $? ==="

# (2) bench sanity (the driver runs this at round end; pre-warm + verify)
timeout 3600 python bench.py > /tmp/r4_bench_sanity.log 2>&1
echo "=== 2 done: $? ==="
echo QUEUE9-DONE

#!/bin/bash
# Round-4 hardware queue 5 — session takeover of queue4 (killed mid-item
# 0b; its in-flight Wan 720p split-CFG+token-chunk clip keeps running and
# this queue WAITS for it). Priority order per VERDICT round-3:
#   1. refine720 retry with the efbc6e1 recoverable-decode fix (item 1a)
#   2. LongCat fused-fault bisect ladder (item 2)
#   3. Wan fused one-program with token-chunked FFN (item 2)
#   4. generate_vc on chip (item 8)
#   5. DepthCrafter high-res with attn_chunks (item 4)
#   6. int6-FFN guided flagship e2e (quality-recipe speed)
# Launch detached: setsid bash scripts/run_hw_queue5.sh > /tmp/r4_queue5.log 2>&1 &
cd /root/repo

# (0) wait for the in-flight wan 720p clip (PID in /tmp/wan720.pid if set,
# else poll for any run_e2e_guided process started by queue4)
while ps -p 3790 > /dev/null 2>&1; do sleep 20; done
echo "=== 0: in-flight wan720 done ==="

# (1) 720p refine retry: decode recovery now drops DiT params AND the
# compiled step executables + clear_caches (efbc6e1)
timeout 5400 python scripts/run_e2e_refine_720p.py --clips 2 \
  > /tmp/r4_refine720d.log 2>&1
echo "=== 1 done: $? ==="

# (2-5) LongCat fused-fault bisect ladder at production scale
timeout 4200 python scripts/run_e2e_longcat_guided.py \
  > /tmp/r4_lc_fused_full.log 2>&1
echo "=== 2 done: $? ==="
timeout 4200 python scripts/run_e2e_longcat_guided.py --unguided \
  > /tmp/r4_lc_fused_unguided.log 2>&1
echo "=== 3 done: $? ==="
timeout 4200 python scripts/run_e2e_longcat_guided.py --no-flf \
  > /tmp/r4_lc_fused_noflf.log 2>&1
echo "=== 4 done: $? ==="
timeout 4200 python scripts/run_e2e_longcat_guided.py --token-chunk 4 \
  > /tmp/r4_lc_fused_tc4.log 2>&1
echo "=== 5 done: $? ==="

# (6) Wan fused ONE-PROGRAM guided mode with token-chunked FFN (36 MB miss)
timeout 7200 python scripts/run_e2e_guided.py --mode fused --token-chunk 4 \
  --no-repeat > /tmp/r4_wan_fused_tc4.log 2>&1
echo "=== 6 done: $? ==="

# (7) generate_vc on-chip (VERDICT item 8)
timeout 4200 python scripts/run_e2e_vc.py --clips 2 > /tmp/r4_vc.log 2>&1
echo "=== 7 done: $? ==="

# (8) DepthCrafter published high-res config with attn_chunks (item 4)
timeout 5400 python scripts/probe_depth_highres.py \
  > /tmp/r4_depthhr.log 2>&1
echo "=== 8 done: $? ==="

# (9) int6-FFN guided flagship e2e (capacity + speed of the drift recipe)
timeout 7200 python scripts/run_e2e_guided.py --quant int6-ffn --no-repeat \
  > /tmp/r4_wan_int6.log 2>&1
echo "=== 9 done: $? ==="
echo QUEUE5-DONE

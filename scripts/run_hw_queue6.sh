#!/bin/bash
# Round-4 hardware queue 6 — after the LC fused-fault ladder showed the
# fault is NOT in the guided machinery (full/unguided/noflf/tc4 all fault,
# 4/4) and NOT FFN-transient pressure (tc4 faults), bisect the remaining
# works-vs-faults delta: {step scan} x {auto relayout} x {VAE co-residency}
# x {trip count}. Then the completed-decode 720p re-runs (subprocess
# fallback landed in 07b67c5), vc, depth high-res, int6 e2e.
# Launch: setsid bash scripts/run_hw_queue6.sh > /tmp/r4_queue6.log 2>&1 &
cd /root/repo

# (0) wait for the in-flight Wan fused token-chunked program (queue5 item 6)
while ps -p 10621 > /dev/null 2>&1; do sleep 20; done
echo "=== 0: wan fused tc4 done ==="

# (1-3) LongCat fused bisect rungs, ~12 min each
timeout 2400 python scripts/run_e2e_longcat_guided.py --unguided --steps 2 \
  > /tmp/r4_lc_bisect_steps2.log 2>&1
echo "=== 1 done: $? ==="
timeout 3000 python scripts/run_e2e_longcat_guided.py --unguided \
  --no-auto-layout > /tmp/r4_lc_bisect_nolayout.log 2>&1
echo "=== 2 done: $? ==="
timeout 2400 python scripts/run_e2e_longcat_guided.py --unguided --no-vae \
  > /tmp/r4_lc_bisect_novae.log 2>&1
echo "=== 3 done: $? ==="

# (4) 720p refine full clip with the fresh-process decode fallback
timeout 5400 python scripts/run_e2e_refine_720p.py --clips 2 \
  > /tmp/r4_refine720e.log 2>&1
echo "=== 4 done: $? ==="

# (5) Wan 720p x 49f clip, fused CFG step (known-good denoise), decode
# completes via the subprocess fallback
timeout 9000 python scripts/run_e2e_guided.py --unguided --no-repeat \
  --height 720 --width 1280 > /tmp/r4_wan720e.log 2>&1
echo "=== 5 done: $? ==="

# (6) generate_vc on-chip (VERDICT item 8)
timeout 4200 python scripts/run_e2e_vc.py --clips 2 > /tmp/r4_vc.log 2>&1
echo "=== 6 done: $? ==="

# (7) DepthCrafter published high-res config with attn_chunks (item 4)
timeout 5400 python scripts/probe_depth_highres.py \
  > /tmp/r4_depthhr.log 2>&1
echo "=== 7 done: $? ==="

# (8) int6-FFN guided flagship e2e (capacity + speed of the drift recipe)
timeout 7200 python scripts/run_e2e_guided.py --quant int6-ffn --no-repeat \
  > /tmp/r4_wan_int6.log 2>&1
echo "=== 8 done: $? ==="
echo QUEUE6-DONE

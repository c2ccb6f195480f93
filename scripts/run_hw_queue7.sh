#!/bin/bash
# Round-4 hardware queue 7 — after the bisect eliminated guided machinery,
# FLF, FFN transients, auto-relayout, and VAE co-residency (all fault) while
# steps=2 runs clean, the leading hypothesis is a single-execution DURATION
# limit (~150 s at 16 steps vs 37 s longest-ever success). Pin it with the
# synthetic probe, correlate at model scale (steps=8 ~= 72 s), then the
# headline re-runs.
# Launch: setsid bash scripts/run_hw_queue7.sh > /tmp/r4_queue7.log 2>&1 &
cd /root/repo

# (0) wait for the in-flight refine720e clip
while ps -p 15701 > /dev/null 2>&1; do sleep 20; done
echo "=== 0: refine720e done ==="

# (1) synthetic single-execution duration ladder (no model code)
timeout 2400 python scripts/probe_long_execution.py \
  > /tmp/r4_longexec.log 2>&1
echo "=== 1 done: $? ==="

# (2) model-scale correlation: 8-step fused unguided ~= 72 s execution
timeout 2400 python scripts/run_e2e_longcat_guided.py --unguided --steps 8 \
  > /tmp/r4_lc_bisect_steps8.log 2>&1
echo "=== 2 done: $? ==="

# (3) Wan 720p x 49f full clip, fused CFG step + fresh-process decode
timeout 9000 python scripts/run_e2e_guided.py --unguided --no-repeat \
  --height 720 --width 1280 > /tmp/r4_wan720e.log 2>&1
echo "=== 3 done: $? ==="

# (4) Wan fused one-program retry: extended auto layouts (data args too),
# NO token chunk (the tc4 variant measured 377 MB over with VAE-decode
# temps dominating; round-3 no-tc was only 36 MB over and the video_ref
# entry copy alone is 119 MB)
timeout 7200 python scripts/run_e2e_guided.py --mode fused --no-repeat \
  > /tmp/r4_wan_fused_layouts.log 2>&1
echo "=== 4 done: $? ==="

# (5) generate_vc on-chip (VERDICT item 8)
timeout 4200 python scripts/run_e2e_vc.py --clips 2 > /tmp/r4_vc.log 2>&1
echo "=== 5 done: $? ==="

# (6) DepthCrafter published high-res config with attn_chunks (item 4)
timeout 5400 python scripts/probe_depth_highres.py \
  > /tmp/r4_depthhr.log 2>&1
echo "=== 6 done: $? ==="

# (7) int6-FFN guided flagship e2e (capacity + speed of the drift recipe)
timeout 7200 python scripts/run_e2e_guided.py --quant int6-ffn --no-repeat \
  > /tmp/r4_wan_int6.log 2>&1
echo "=== 7 done: $? ==="
echo QUEUE7-DONE

#!/bin/bash
# Round-4 hardware queue, relaunch after the session crash killed queue 3
# mid-flight (wan720b was between prepare_latents and DiT init; refine720b
# had OOM'd at the encode-next-to-DiT — fixed by phase ordering). Launch
# detached so it survives the driver session:
#   setsid bash scripts/run_hw_queue4.sh > /tmp/r4_queue4.log 2>&1 &
cd /root/repo

# (0) 720p refine with round-4 phase ordering: encode before the DiT is
# resident (clip 1), then a fully co-resident steady-state attempt (clip 2).
timeout 5400 python scripts/run_e2e_refine_720p.py --clips 2 \
  > /tmp/r4_refine720c.log 2>&1
echo "=== 0 done: $? ==="

# (0b) Wan 720p x 49f unguided clip (VERDICT item 1b); VAE-first ordering
# landed in c2bff95. Fallback ladder: fused CFG step -> split CFG ->
# split CFG + token-chunked FFN.
timeout 9000 python scripts/run_e2e_guided.py --unguided --no-repeat \
    --height 720 --width 1280 > /tmp/r4_wan720c.log 2>&1 \
  || timeout 9000 python scripts/run_e2e_guided.py --unguided --no-repeat \
    --split-cfg --height 720 --width 1280 > /tmp/r4_wan720c_split.log 2>&1 \
  || timeout 9000 python scripts/run_e2e_guided.py --unguided --no-repeat \
    --split-cfg --token-chunk 4 --height 720 --width 1280 \
    > /tmp/r4_wan720c_tc.log 2>&1
echo "=== 0b done: $? ==="

# (a) Wan fused ONE-PROGRAM guided mode with token-chunked FFN — the
# round-3 program missed 16 GB by ~36 MB; chunking frees ~GBs of gates.
timeout 7200 python scripts/run_e2e_guided.py --mode fused --token-chunk 4 \
  --no-repeat > /tmp/r4_wan_fused_tc4.log 2>&1
echo "=== a done: $? ==="

# (b-e) LongCat fused-fault bisect ladder at production scale, 16-step
# distilled. Round-3: full-fused COMPILES then faults at runtime (2/2).
timeout 4200 python scripts/run_e2e_longcat_guided.py \
  > /tmp/r4_lc_fused_full.log 2>&1
echo "=== b done: $? ==="
timeout 4200 python scripts/run_e2e_longcat_guided.py --unguided \
  > /tmp/r4_lc_fused_unguided.log 2>&1
echo "=== c done: $? ==="
timeout 4200 python scripts/run_e2e_longcat_guided.py --no-flf \
  > /tmp/r4_lc_fused_noflf.log 2>&1
echo "=== d done: $? ==="
timeout 4200 python scripts/run_e2e_longcat_guided.py --token-chunk 4 \
  > /tmp/r4_lc_fused_tc4.log 2>&1
echo "=== e done: $? ==="

# (f) generate_vc on-chip (VERDICT item 8)
timeout 4200 python scripts/run_e2e_vc.py --clips 2 > /tmp/r4_vc.log 2>&1
echo "=== f done: $? ==="

# (g) DepthCrafter published high-res config with attn_chunks (item 4)
timeout 5400 python scripts/probe_depth_highres.py \
  > /tmp/r4_depthhr.log 2>&1
echo "=== g done: $? ==="

# (h) int6-FFN guided flagship e2e (capacity + speed of the drift recipe)
timeout 7200 python scripts/run_e2e_guided.py --quant int6-ffn --no-repeat \
  > /tmp/r4_wan_int6.log 2>&1
echo "=== h done: $? ==="
echo QUEUE4-DONE

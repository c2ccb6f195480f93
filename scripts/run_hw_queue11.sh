#!/bin/bash
# Round-5 hardware queue 11 — follow-ups from queue10's first results:
#  (A) re-run the induced-OOM bench probe with the fixed scalar-read sync
#      (block_until_ready lies through the tunnel: 64x2 GiB "allocated"
#      without surfacing the RESOURCE_EXHAUSTED),
#  (B) int6-FFN chunked-fused retry with --token-chunk 4: queue10 step 3
#      reproduced the 640 MB compile-time OOM and proved donate_data
#      cannot help (the AOT compiler budgets args+temps independent of
#      live chip state); token-chunking the DiT FFN is the remaining
#      temp-side lever,
#  (C) if the 720p capacity probe said FITS: the full guided 720p clip
#      (north-star config) in loop mode with split-CFG.
# Launch: setsid bash scripts/run_hw_queue11.sh > /tmp/r5_queue11.log 2>&1 &
cd /root/repo

# (0) wait for queue10
while ! grep -q QUEUE10-DONE /tmp/r5_queue10.log 2>/dev/null; do sleep 60; done
echo "=== 0: queue10 done ==="

# (A) induced-OOM bench validation, fixed sync
timeout 3600 python scripts/probe_bench_after_oom.py --keep-hog-gb 10 \
  > /tmp/r5_bench_after_oom2.log 2>&1
echo "=== A done: $? ==="

# (B) int6 chunked-fused + token-chunk 4
timeout 9000 python scripts/run_e2e_guided.py --mode fused \
  --exec-chunk auto --quant int6-ffn --token-chunk 4 --no-repeat \
  > /tmp/r5_int6_chunked_tc4.log 2>&1
echo "=== B done: $? ==="

# (C) full guided 720p clip, only if the capacity probe fully passed
if grep -q "STEP PATTERN FITS" /tmp/r5_720p_capacity.log 2>/dev/null; then
  timeout 14400 python scripts/run_e2e_guided.py --height 720 --width 1280 \
    --mode loop --split-cfg --no-repeat \
    > /tmp/r5_720p_guided_clip.log 2>&1
  echo "=== C done: $? ==="
else
  echo "=== C skipped: capacity probe did not pass ==="
fi
echo QUEUE11-DONE

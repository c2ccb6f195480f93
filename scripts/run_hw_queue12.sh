#!/bin/bash
# Round-5 hardware queue 12 — H-strip-tiled VAE (vae_stream.py spatial
# strips) on the chip:
#  (1) 720p decode/encode AOT memory analysis + steady time, VAE alone,
#      untiled-vs-tiled A/B (the untiled numbers are 12.65 / 8.43 GiB),
#  (2) the guided-720p capacity probe with strips — phases 3-7 (fuse
#      next to the resident DiT: the round-5 blocker),
#  (3) if the probe passes: the FULL guided 720p north-star clip,
#  (4) int6-FFN chunked-fused retry with strips (the 640 MB OOM's top
#      temps were VAE fuse convs — strips shrink exactly those),
#  (5) bench sanity.
# Launch: setsid bash scripts/run_hw_queue12.sh > /tmp/r5_queue12.log 2>&1 &
cd /root/repo

# (1) VAE-alone tiled A/B at 720p
timeout 7200 python scripts/probe_720p_guided_capacity.py --skip-dit \
  --spatial-chunks 10 > /tmp/r5_720p_vae_tiled.log 2>&1
echo "=== 1 done: $? ==="

# (2) full capacity probe with strips
timeout 10800 python scripts/probe_720p_guided_capacity.py \
  --spatial-chunks 10 > /tmp/r5_720p_capacity_tiled.log 2>&1
echo "=== 2 done: $? ==="

# (3) the north-star clip, if the fuse now fits
if grep -q "STEP PATTERN FITS" /tmp/r5_720p_capacity_tiled.log 2>/dev/null; then
  timeout 14400 python scripts/run_e2e_guided.py --height 720 --width 1280 \
    --mode loop --split-cfg --spatial-chunks 10 --no-repeat \
    > /tmp/r5_720p_guided_clip.log 2>&1
  echo "=== 3 done: $? ==="
else
  echo "=== 3 skipped: tiled fuse still does not fit ==="
fi

# (4) int6 chunked-fused with strips at 480p
timeout 9000 python scripts/run_e2e_guided.py --mode fused \
  --exec-chunk auto --quant int6-ffn --spatial-chunks 6 --no-repeat \
  > /tmp/r5_int6_chunked_strips.log 2>&1
echo "=== 4 done: $? ==="

# (5) bench sanity
timeout 3600 python bench.py > /tmp/r5_bench_post12.log 2>&1
echo "=== 5 done: $? ==="
echo QUEUE12-DONE

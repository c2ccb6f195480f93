#!/bin/bash
# VGGT warping test case (mirrors /root/reference/vggt/run_test_case.sh).
# Requires converted VGGT weights (--vggt_checkpoint) or precomputed depth
# (--depth_npz).
set -e
cd "$(dirname "$0")/.."
python -m worldforge_tpu.cli.run_warp \
    --image_path "${IMAGE_PATH:-/root/reference/test_case/case_for_vggt/truck}" \
    --output_path "${OUTPUT_PATH:-output_test_vggt}" \
    --camera 2 \
    --direction left \
    --degree 20 \
    --frame_single 25 \
    --look_at_depth 0.25 \
    ${VGGT_CHECKPOINT:+--vggt_checkpoint "$VGGT_CHECKPOINT"} \
    ${DEPTH_NPZ:+--depth_npz "$DEPTH_NPZ"}

#!/bin/bash
# DepthCrafter warping test case (mirrors
# /root/reference/DepthCrafter/run_test_case.sh).
set -e
cd "$(dirname "$0")/.."
python -m worldforge_tpu.cli.warp_depthcrafter \
    --video_path "${VIDEO_PATH:-/root/reference/test_case/case_for_dc/two_car}" \
    --output_path "${OUTPUT_PATH:-output_test_dc/two_car}" \
    --direction up \
    --degree 30 \
    --look_at_depth 0.9 \
    --enable_edge_filter \
    ${DEPTH_NPZ:+--depth_npz "$DEPTH_NPZ"}

#!/bin/bash
# WorldForge (LongCat) batch inference param grid (mirrors
# /root/reference/longcat_for_worldforge/run_test_case.sh:1-76).
set -e
cd "$(dirname "$0")/.."

CHECKPOINT_DIR="${CHECKPOINT_DIR:-}"
VIDEO_REF="${VIDEO_REF:-/root/reference/test_case/truck/imgs}"
OUTPUT_DIR="${OUTPUT_DIR:-./output_longcat}"
SCENE="${SCENE:-truck}"
NUM_FRAMES="${NUM_FRAMES:-49}"
NUM_INFERENCE_STEPS="${NUM_INFERENCE_STEPS:-50}"
SEED="${SEED:-42}"
EXTRA="${EXTRA:-}"

omegas=(4)
guide_steps=(28)
resample_steps=(2)
max_replaces=(2)

mkdir -p "$OUTPUT_DIR"

for omega in "${omegas[@]}"; do
for guide in "${guide_steps[@]}"; do
for resample in "${resample_steps[@]}"; do
for mr in "${max_replaces[@]}"; do
    output="${OUTPUT_DIR}/o${omega}_guide${guide}_rs${resample}_mr${mr}.mp4"
    echo "==== omega=$omega guide=$guide resample=$resample max_replace=$mr"
    python -m worldforge_tpu.cli.run_longcat \
        ${CHECKPOINT_DIR:+--checkpoint_dir "$CHECKPOINT_DIR"} \
        --video-ref "$VIDEO_REF" \
        --guided \
        --use-pca-channel-selection \
        --soften-mask \
        --scene "$SCENE" \
        --num-frames "$NUM_FRAMES" \
        --num-inference-steps "$NUM_INFERENCE_STEPS" \
        --omega "$omega" \
        --guide-steps "$guide" \
        --resample-steps "$resample" \
        --resample-round "$guide" \
        --max-replace "$mr" \
        --seed "$SEED" \
        --output "$output" \
        $EXTRA
done; done; done; done

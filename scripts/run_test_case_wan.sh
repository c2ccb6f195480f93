#!/bin/bash
# WorldForge (Wan) batch inference param grid (mirrors
# /root/reference/wan_for_worldforge/run_test_case.sh:1-70).
set -e
cd "$(dirname "$0")/.."

MODELS_DIR="${MODELS_DIR:-}"                    # converted Wan checkpoints
VIDEO_REF="${VIDEO_REF:-/root/reference/test_case/truck/imgs}"
OUTPUT_DIR="${OUTPUT_DIR:-./output_wan}"
SCENE="${SCENE:-truck}"
NUM_FRAMES="${NUM_FRAMES:-49}"
MODEL="${MODEL:-480p}"
STATIC="${STATIC:-True}"
NUM_INFERENCE_STEPS="${NUM_INFERENCE_STEPS:-50}"
EXTRA="${EXTRA:-}"                              # e.g. "--random-init --resize 96 160"

omegas=(4)
guidance_scales=(4)
transition_distances=(15)
resample_steps=(2)
guide_steps=(15 18)
step_additions=(0)

mkdir -p "$OUTPUT_DIR"

for omega in "${omegas[@]}"; do
for cfg in "${guidance_scales[@]}"; do
for mask in "${transition_distances[@]}"; do
for resample in "${resample_steps[@]}"; do
for guide in "${guide_steps[@]}"; do
for add in "${step_additions[@]}"; do
    round=$((guide + add))
    output="${OUTPUT_DIR}/o${omega}_guide${guide}_round${round}_mask${mask}_cfg${cfg}.mp4"
    echo "========================================"
    echo "omega=$omega, guide=$guide, round=$round, mask=$mask, cfg=$cfg"
    echo "========================================"
    python -m worldforge_tpu.cli.infer_worldforge \
        --model "$MODEL" \
        ${MODELS_DIR:+--models-dir "$MODELS_DIR"} \
        --video-ref "$VIDEO_REF" \
        --guided \
        --use-pca-channel-selection \
        --soften-mask \
        --scene "$SCENE" \
        --static "$STATIC" \
        --num-frames "$NUM_FRAMES" \
        --num-inference-steps "$NUM_INFERENCE_STEPS" \
        --guidance-scale "$cfg" \
        --omega "$omega" \
        --transition-distance "$mask" \
        --resample-steps "$resample" \
        --guide-steps "$guide" \
        --resample-round "$round" \
        --output "$output" \
        $EXTRA
done; done; done; done; done; done

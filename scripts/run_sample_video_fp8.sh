#!/bin/bash
# FP8-weight T2V run (reference: scripts/run_sample_video_fp8.sh).
cd "$(dirname "$0")/.." || exit 1

python sample_video.py \
    --video-size 720 1280 \
    --video-length 129 \
    --infer-steps 50 \
    --prompt "A cat walks on the grass, realistic style." \
    --flow-reverse \
    --seed 42 \
    --use-fp8 \
    --save-path ./results

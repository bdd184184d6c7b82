#!/bin/bash
# Canonical single-chip T2V run (reference: scripts/run_sample_video.sh).
cd "$(dirname "$0")/.." || exit 1

python sample_video.py \
    --video-size 720 1280 \
    --video-length 129 \
    --infer-steps 50 \
    --prompt "A cat walks on the grass, realistic style." \
    --flow-reverse \
    --seed 42 \
    --save-path ./results

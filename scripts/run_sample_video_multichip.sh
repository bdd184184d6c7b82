#!/bin/bash
# Sequence-parallel T2V over a TPU slice (reference:
# scripts/run_sample_video_multigpu.sh, torchrun 8-GPU Ulysses).
#
# ONE host process drives the whole mesh — no torchrun/launcher. Supported
# degree table mirrors the reference README: ulysses x ring must divide the
# latent H (or W) patch grid; for 720p x 129f (grid 45 x 80) valid products
# include 1x8, 2x4, 4x2, 8x1, 3x3, 5x1, ...
cd "$(dirname "$0")/.." || exit 1

python sample_video.py \
    --video-size 720 1280 \
    --video-length 129 \
    --infer-steps 50 \
    --prompt "A cat walks on the grass, realistic style." \
    --flow-reverse \
    --seed 42 \
    --ulysses-degree "${ULYSSES_DEGREE:-8}" \
    --ring-degree "${RING_DEGREE:-1}" \
    --save-path ./results

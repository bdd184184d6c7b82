#!/bin/bash
# Metrics-only sweep over finished experiment output trees
# (reference: test.sh, test_bucket_{pool,stride}.sh).
# Usage: scripts/test_metrics.sh <orig_dir> <exp_base>
cd "$(dirname "$0")/.." || exit 1

ORIG=${1:?usage: test_metrics.sh <orig_dir> <exp_base>}
BASE=${2:?usage: test_metrics.sh <orig_dir> <exp_base>}

python - "$ORIG" "$BASE" <<'EOF'
import sys
from hunyuanvideo_efficiency_tpu.evaluation import compute_metrics_experiments

results = compute_metrics_experiments(sys.argv[1], sys.argv[2])
for name, dm in sorted(results.items()):
    lp = f" lpips={dm.mean_lpips:.4f}" if dm.mean_lpips is not None else ""
    print(f"{name}: psnr={dm.mean_psnr:.3f} ssim={dm.mean_ssim:.4f}{lp}")
EOF

"""Per-video metric CSV runner + golden-value smoke.

Mirror of the reference's offline metrics suite entry points
(reference: rebuttal/common_metrics_on_video_quality/run.py:29-140 per-video
CSV incl. PSNR/SSIM/MS-SSIM/LPIPS/FVD, demo.py zeros-vs-ones smoke).
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional

import numpy as np

from .metrics import (frechet_distance, gaussian_stats, ms_ssim_video,
                      psnr_video, ssim_video)


def per_video_metrics(videos1: np.ndarray, videos2: np.ndarray,
                      lpips_params=None, i3d_path: Optional[str] = None,
                      out_csv: Optional[str] = None,
                      with_fvmd: bool = False) -> List[Dict]:
    """videos [N, T, H, W, C] uint8 (or float in [0, 255]); returns one row
    per video, plus a final 'set' row with FVD (when i3d_path is given)
    and FVMD (when with_fvmd; reference run.py:80-86)."""
    rows = []
    for i, (a, b) in enumerate(zip(videos1, videos2)):
        row = {"video": i,
               "psnr": psnr_video(a, b),
               "ssim": ssim_video(a, b),
               "ms_ssim": ms_ssim_video(a, b)}
        if lpips_params is not None:
            from .lpips import lpips_video

            row["lpips"] = lpips_video(lpips_params, a, b)
        rows.append(row)
    set_row: Dict = {}
    if i3d_path is not None:
        from .fvd import compute_fvd

        set_row["fvd"] = compute_fvd(
            np.asarray(videos1, np.float32) / 255.0,
            np.asarray(videos2, np.float32) / 255.0, i3d_path=i3d_path)
    if with_fvmd:
        from .fvmd import fvmd

        set_row["fvmd"] = fvmd(videos1, videos2)
    if set_row:
        rows.append({"video": "set", **set_row})
    if out_csv:
        keys: List[str] = []
        for r in rows:
            keys += [k for k in r if k not in keys]
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
    return rows


def demo(n: int = 8, frames: int = 30, size: int = 64) -> Dict[str, float]:
    """Zeros-vs-ones numeric sanity fixture (reference: demo.py + README
    'Evaluation Example': PSNR 0.0, SSIM ~0, LPIPS 0.814 / FVD ~151 with
    real AlexNet/I3D weights — the weight-dependent values require those
    checkpoints; the weight-free metrics are asserted exactly)."""
    zeros = np.zeros((n, frames, size, size, 3), np.uint8)
    ones = np.full((n, frames, size, size, 3), 255, np.uint8)
    rows = per_video_metrics(zeros, ones)
    out = {"psnr": float(np.mean([r["psnr"] for r in rows])),
           "ssim": float(np.mean([r["ssim"] for r in rows])),
           "ms_ssim": float(np.mean([r["ms_ssim"] for r in rows]))}
    # Frechet core golden check: unit-variance Gaussians, mean shift d
    rng = np.random.RandomState(0)
    f1 = rng.randn(512, 16)
    mu, sig = gaussian_stats(f1)
    out["frechet_self"] = frechet_distance(mu, sig, mu, sig)
    return out


if __name__ == "__main__":
    for k, v in demo().items():
        print(f"{k}: {v:.4f}")

"""FVD (Frechet Video Distance) with an I3D feature extractor.

Mirror of the reference's offline FVD suite
(reference: rebuttal/common_metrics_on_video_quality/fvd/styleganv/fvd.py and
fvd/videogpt/fvd.py): videos -> I3D logits/features -> Gaussian stats ->
Frechet distance. I3D weights are torchscript files the reference downloads;
in zero-egress environments pass a local path (`i3d_path`). The Frechet core
(metrics.frechet_distance) is pure numpy and golden-tested.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .metrics import frechet_distance, gaussian_stats


def _resize_video(video: np.ndarray, size: int = 224) -> np.ndarray:
    """[T, H, W, C] float in [0, 1] -> bilinear-resized [T, size, size, C]."""
    import cv2

    return np.stack([
        cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
        for f in video])


def i3d_features(videos: np.ndarray, i3d_path: str,
                 batch: int = 2) -> np.ndarray:
    """[N, T, H, W, C] in [0, 1] -> [N, 400] I3D logit features.

    Uses the same torchscript I3D the reference uses (styleganv variant,
    `i3d_torchscript.pt`); torch runs host-side as an offline tool.
    """
    import torch

    model = torch.jit.load(i3d_path).eval()
    feats = []
    detector_kwargs = dict(rescale=False, resize=False, return_features=True)
    with torch.no_grad():
        for i in range(0, len(videos), batch):
            batch_v = np.stack([_resize_video(v) for v in videos[i:i + batch]])
            # [N, T, H, W, C] in [0,1] -> [N, C, T, H, W] in [-1, 1]
            x = torch.from_numpy(
                batch_v.transpose(0, 4, 1, 2, 3) * 2.0 - 1.0).float()
            feats.append(model(x, **detector_kwargs).numpy())
    return np.concatenate(feats)


def compute_fvd(videos_real: np.ndarray, videos_fake: np.ndarray,
                i3d_path: Optional[str] = None,
                features_real: Optional[np.ndarray] = None,
                features_fake: Optional[np.ndarray] = None) -> float:
    """FVD between two video sets [N, T, H, W, C] in [0, 1]; either an
    i3d_path or precomputed features must be given.

    Golden reference: zeros vs ones [8, 30, 3, 64, 64] gives ~151.3 with the
    styleganv I3D (reference README 'Evaluation Example')."""
    if features_real is None or features_fake is None:
        if i3d_path is None:
            raise ValueError(
                "compute_fvd needs i3d_path (torchscript I3D weights; see "
                "reference fvd/styleganv/fvd.py download URL) or "
                "precomputed features")
        features_real = i3d_features(videos_real, i3d_path)
        features_fake = i3d_features(videos_fake, i3d_path)
    mu_r, sig_r = gaussian_stats(features_real)
    mu_f, sig_f = gaussian_stats(features_fake)
    return frechet_distance(mu_r, sig_r, mu_f, sig_f)

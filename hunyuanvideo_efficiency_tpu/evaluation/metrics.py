"""Video quality metrics: PSNR / SSIM / MS-SSIM (pure numpy/JAX).

Re-implements the reference's metric definitions without its external deps
(reference: evaluation/compute_metrics.py:31-41 uses cv2 PSNR + skimage
SSIM; rebuttal/common_metrics_on_video_quality/calculate_{psnr,ssim}.py):

* PSNR: 10*log10(data_range^2 / MSE), per frame, averaged over frames.
* SSIM: Wang et al. 2004 with the skimage defaults the reference relies on —
  uniform 7x7 window, K1=0.01, K2=0.03, per-channel then averaged, sample
  covariance normalization (N-1).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.ndimage import uniform_filter


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Frames [..., H, W, C] (uint8 or float in [0, data_range])."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _native_core():
    from ..native import load_metrics_core

    return load_metrics_core()


def _is_u8(a, b):
    return (a.dtype == np.uint8 and b.dtype == np.uint8 and a.ndim == 4)


def psnr_video(a: np.ndarray, b: np.ndarray, data_range: float = 255.0
               ) -> float:
    """[T, H, W, C]: per-frame PSNR averaged (reference computes per frame,
    calculate_psnr.py:6-15). uint8 inputs use the threaded C++ core
    (native/metrics_core.cpp) when the toolchain is available."""
    assert a.shape == b.shape, f"{a.shape} vs {b.shape}"
    if _is_u8(a, b):
        core = _native_core()
        if core is not None:
            vals = core.psnr_frames(a, b, data_range)
            finite = vals[np.isfinite(vals)]
            return float(finite.mean()) if finite.size else float("inf")
    vals = [psnr(a[t], b[t], data_range) for t in range(a.shape[0])]
    finite = [v for v in vals if np.isfinite(v)]
    return float(np.mean(finite)) if finite else float("inf")


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float,
                 win: int = 7, k1: float = 0.01, k2: float = 0.03) -> float:
    """2-D single-channel SSIM, skimage-compatible (uniform window, crop to
    valid region, N-1 covariance normalization)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    np_ = win ** 2
    cov_norm = np_ / (np_ - 1)

    ux = uniform_filter(x, win)
    uy = uniform_filter(y, win)
    uxx = uniform_filter(x * x, win)
    uyy = uniform_filter(y * y, win)
    uxy = uniform_filter(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1, a2 = 2 * ux * uy + c1, 2 * vxy + c2
    b1, b2 = ux ** 2 + uy ** 2 + c1, vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    pad = (win - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """[H, W, C] or [H, W]: channel-averaged SSIM."""
    if a.ndim == 2:
        return _ssim_single(a, b, data_range)
    return float(np.mean([_ssim_single(a[..., c], b[..., c], data_range)
                          for c in range(a.shape[-1])]))


def ssim_video(a: np.ndarray, b: np.ndarray, data_range: float = 255.0
               ) -> float:
    """[T, H, W, C]: per-frame SSIM averaged (threaded C++ core for uint8)."""
    assert a.shape == b.shape, f"{a.shape} vs {b.shape}"
    if _is_u8(a, b):
        core = _native_core()
        if core is not None:
            return float(core.ssim_frames(a, b, data_range).mean())
    return float(np.mean([ssim(a[t], b[t], data_range)
                          for t in range(a.shape[0])]))


def _downsample2(x: np.ndarray) -> np.ndarray:
    """2x average-pool with edge cropping to even size."""
    h, w = x.shape[:2]
    x = x[: h - h % 2, : w - w % 2]
    return (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2]) / 4.0


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_cs(x, y, data_range, win=7, k1=0.01, k2=0.03):
    """Returns (mean ssim, mean contrast-structure) for one channel."""
    np_ = win ** 2
    cov_norm = np_ / (np_ - 1)
    ux, uy = uniform_filter(x, win), uniform_filter(y, win)
    vx = cov_norm * (uniform_filter(x * x, win) - ux * ux)
    vy = cov_norm * (uniform_filter(y * y, win) - uy * uy)
    vxy = cov_norm * (uniform_filter(x * y, win) - ux * uy)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    cs = (2 * vxy + c2) / (vx + vy + c2)
    s = ((2 * ux * uy + c1) / (ux ** 2 + uy ** 2 + c1)) * cs
    pad = (win - 1) // 2
    sl = np.s_[pad:-pad, pad:-pad]
    return float(s[sl].mean()), float(cs[sl].mean())


def ms_ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0,
            weights=_MSSSIM_WEIGHTS) -> float:
    """Multi-scale SSIM (Wang 2003), channel-averaged
    (reference: rebuttal run.py uses pytorch-msssim)."""
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    vals = []
    for c in range(a.shape[-1]):
        x = np.asarray(a[..., c], np.float64)
        y = np.asarray(b[..., c], np.float64)
        mcs = []
        val = 1.0
        for i, w in enumerate(weights):
            s, cs = _ssim_cs(x, y, data_range)
            if i == len(weights) - 1:
                val = np.prod([max(m, 0) ** wt for m, wt in
                               zip(mcs + [s], weights)])
            else:
                mcs.append(cs)
                x, y = _downsample2(x), _downsample2(y)
        vals.append(val)
    return float(np.mean(vals))


def ms_ssim_video(a: np.ndarray, b: np.ndarray,
                  data_range: float = 255.0) -> float:
    return float(np.mean([ms_ssim(a[t], b[t], data_range)
                          for t in range(a.shape[0])]))


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (FVD/FID core,
    reference: rebuttal/common_metrics_on_video_quality/fvd/*/fvd.py)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def gaussian_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, D] feature matrix -> (mu, sigma)."""
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)

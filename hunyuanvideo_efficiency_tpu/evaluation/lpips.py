"""LPIPS (AlexNet backbone) in JAX.

Re-implements the reference's vendored LPIPS
(reference: rebuttal/common_metrics_on_video_quality/lpips/lpips.py, used by
evaluation/compute_metrics.py:43-62): input scaling layer, AlexNet conv
stack with 5 ReLU taps, per-channel unit normalization, squared diff, 1x1
linear heads, spatial mean, sum over taps.

Weights are NOT bundled (zero-egress). `convert_lpips_weights` converts the
standard torchvision-AlexNet + lpips-lin checkpoints into a flat .npz; at
runtime pass its path (or the tree) to `lpips_video`.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS ScalingLayer constants (reference lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature geometry: (out_ch, kernel, stride, pad), maxpool after idx
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}


def _conv(x, w, b, stride, pad):
    # x [B, C, H, W]; w [kh, kw, cin, cout]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID")


def alexnet_features(params: Dict[str, Any], x: jnp.ndarray):
    """x [B, 3, H, W] in [-1, 1] -> list of 5 ReLU tap tensors."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    for i, (cout, k, s, p) in enumerate(_ALEX):
        cp = params["features"][i]
        x = _conv(x, cp["kernel"], cp["bias"], s, p)
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return taps


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@partial(jax.jit, static_argnames=())
def lpips_pair(params: Dict[str, Any], a: jnp.ndarray, b: jnp.ndarray
               ) -> jnp.ndarray:
    """a/b [B, 3, H, W] in [-1, 1] -> [B] LPIPS distances."""
    fa = alexnet_features(params, a)
    fb = alexnet_features(params, b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
        w = params["lins"][i]["kernel"]  # [1, 1, cin, 1]
        d = jax.lax.conv_general_dilated(
            d, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        total = total + jnp.mean(d, axis=(1, 2, 3))
    return total


def lpips_video(params: Dict[str, Any], a: np.ndarray, b: np.ndarray,
                batch: int = 8) -> float:
    """[T, H, W, C] uint8/float videos -> mean per-frame LPIPS
    (reference: compute_metrics.py:43-62 batches frames on one device)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.max() > 1.5:
        a, b = a / 127.5 - 1.0, b / 127.5 - 1.0
    a = a.transpose(0, 3, 1, 2)
    b = b.transpose(0, 3, 1, 2)
    vals = []
    for i in range(0, a.shape[0], batch):
        vals.append(np.asarray(
            lpips_pair(params, jnp.asarray(a[i:i + batch]),
                       jnp.asarray(b[i:i + batch]))))
    return float(np.concatenate(vals).mean())


def convert_lpips_weights(alexnet_sd: Dict[str, np.ndarray],
                          lin_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision `alexnet().features` state dict + lpips `lin` state dict
    -> JAX tree. torch conv [out, in, kh, kw] -> [kh, kw, in, out]."""
    feat_idx = [0, 3, 6, 8, 10]  # conv layer indices in torchvision AlexNet
    features = []
    for i in feat_idx:
        w = alexnet_sd[f"features.{i}.weight"]
        b = alexnet_sd[f"features.{i}.bias"]
        features.append({"kernel": np.ascontiguousarray(
            w.transpose(2, 3, 1, 0)), "bias": b})
    lins = []
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:
            key = f"lins.{i}.model.1.weight"
        w = lin_sd[key]  # [1, cin, 1, 1]
        lins.append({"kernel": np.ascontiguousarray(
            w.transpose(2, 3, 1, 0))})
    return {"features": features, "lins": lins}


def load_lpips_params(path: str) -> Dict[str, Any]:
    from ..utils.checkpoint import load_params_npz

    return load_params_npz(path)


def random_lpips_params(key: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Random-weight LPIPS (tests only — relative comparisons still behave
    like a perceptual stack structurally)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))
    features = []
    cin = 3
    for (cout, k, s, p) in _ALEX:
        features.append({
            "kernel": 0.1 * jax.random.normal(next(ks), (k, k, cin, cout)),
            "bias": jnp.zeros((cout,))})
        cin = cout
    lins = [{"kernel": jnp.abs(0.01 * jax.random.normal(
        next(ks), (1, 1, c, 1)))} for c in (64, 192, 384, 256, 256)]
    return {"features": features, "lins": lins}

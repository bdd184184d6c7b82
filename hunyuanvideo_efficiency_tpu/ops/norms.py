"""Functional normalization ops.

All norms compute statistics in float32 regardless of input dtype and cast
back, matching the reference's numerical behavior
(reference: hyvideo/modules/norm_layers.py:5-59 computes RMSNorm in fp32;
torch LayerNorm/GroupNorm upcast internally under autocast).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
             eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm over the last axis; fp32 statistics; optional affine scale."""
    xf = x.astype(jnp.float32)
    normed = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    normed = normed.astype(x.dtype)
    if weight is not None:
        normed = normed * weight
    return normed


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last axis; fp32 statistics; optional affine."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(x.dtype)


def group_norm(x: jnp.ndarray, num_groups: int, weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm for channels-last tensors [..., C].

    Statistics are computed per (batch, group) over all spatial positions and
    the channels within the group — equivalent to torch GroupNorm on NCDHW
    (reference VAE norm; hyvideo/vae/unet_causal_3d_blocks.py:302).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    b = xf.shape[0]
    c = xf.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    spatial = xf.shape[1:-1]
    xg = xf.reshape(b, -1, num_groups, c // num_groups)  # [B, S, G, C/G]
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(b, *spatial, c)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)

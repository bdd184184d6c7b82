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
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    spatial = x.shape[1:-1]
    xg = x.reshape(b, -1, num_groups, c // num_groups)  # [B, S, G, C/G]
    # fp32 statistics via on-the-fly accumulating reductions — no fp32
    # copy of x is materialized (two f32 upcasts of a decode tile's widest
    # stage were 2 x 8.4 GB, more than the whole chip)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3),
                       keepdims=True, dtype=jnp.float32)
    # E[x^2] - E[x]^2: x is normalized activations (|x| ~ O(10)), so the
    # cancellation is benign in fp32
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    # fold stats (+ affine params) into per-(batch, group) scale/shift
    # scalars, applied in the input dtype: one fused elementwise pass
    scale = lax.rsqrt(var + eps)                  # [B, 1, G, 1] f32
    shift = -mean * scale
    cg = c // num_groups
    if weight is not None:
        wg = weight.astype(jnp.float32).reshape(1, 1, num_groups, cg)
        scale = scale * wg
        shift = shift * wg
    if bias is not None:
        shift = shift + bias.astype(jnp.float32).reshape(
            1, 1, num_groups, cg)
    # apply in the input dtype (bf16 apply of fp32-folded scale/shift):
    # XLA refused to fuse an f32 upcastx-mul-add-downcast chain here and
    # materialized two full f32 copies (2 x 8.4 GB at a 256px decode tile)
    out = xg * scale.astype(x.dtype) + shift.astype(x.dtype)
    return out.reshape(b, *spatial, c)

"""N-dimensional rotary positional embeddings (3D RoPE for video tokens).

Re-implements the reference RoPE semantics
(reference: hyvideo/modules/posemb_layers.py:191-310) in JAX:

- Per-axis 1-D frequencies, concatenated along head_dim: rope_dim_list
  [16, 56, 56] over (t, h, w) sums to head_dim 128.
- Real-valued (cos, sin) tables with interleaved duplication
  (`repeat_interleave(2)`), applied with the `rotate_half` convention
  x*cos + rotate_half(x)*sin where rotate_half maps pairs (x0, x1) to
  (-x1, x0).
- Optional NTK-style theta rescale: theta *= rescale ** (dim / (dim - 2)).

Tables are precomputed once per resolution on the host in fp32; application
happens inside jit in fp32 and casts back to the input dtype.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def get_1d_rotary_pos_embed(
    dim: int,
    pos: np.ndarray,
    theta: float = 10000.0,
    theta_rescale_factor: float = 1.0,
    interpolation_factor: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (cos, sin) with shape [S, dim], interleave-duplicated."""
    pos = np.asarray(pos, dtype=np.float32)
    if theta_rescale_factor != 1.0:
        theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    angles = np.outer(pos * interpolation_factor, freqs)  # [S, dim/2]
    cos = np.repeat(np.cos(angles), 2, axis=1)  # [S, dim]
    sin = np.repeat(np.sin(angles), 2, axis=1)
    return cos, sin


def get_meshgrid_nd(sizes: Sequence[int]) -> List[np.ndarray]:
    """Flattened per-axis coordinates of an n-d grid in row-major order."""
    axes = [np.arange(s, dtype=np.float32) for s in sizes]
    grids = np.meshgrid(*axes, indexing="ij")
    return [g.reshape(-1) for g in grids]


def get_nd_rotary_pos_embed(
    rope_dim_list: Sequence[int],
    sizes: Sequence[int],
    theta: float = 10000.0,
    theta_rescale_factor: Union[float, Sequence[float]] = 1.0,
    interpolation_factor: Union[float, Sequence[float]] = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (cos, sin) tables of shape [prod(sizes), sum(rope_dim_list)]."""
    n = len(rope_dim_list)
    assert len(sizes) == n
    if isinstance(theta_rescale_factor, (int, float)):
        theta_rescale_factor = [float(theta_rescale_factor)] * n
    if isinstance(interpolation_factor, (int, float)):
        interpolation_factor = [float(interpolation_factor)] * n
    coords = get_meshgrid_nd(sizes)
    cos_parts, sin_parts = [], []
    for i in range(n):
        cos_i, sin_i = get_1d_rotary_pos_embed(
            rope_dim_list[i], coords[i], theta,
            theta_rescale_factor=theta_rescale_factor[i],
            interpolation_factor=interpolation_factor[i],
        )
        cos_parts.append(cos_i)
        sin_parts.append(sin_i)
    cos = np.concatenate(cos_parts, axis=1)
    sin = np.concatenate(sin_parts, axis=1)
    return jnp.asarray(cos, dtype=jnp.float32), jnp.asarray(sin, dtype=jnp.float32)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """Pairs (x0, x1) -> (-x1, x0) along the last axis."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def _rotate_one(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                ) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half_interleaved(xf) * sin
    return out.astype(x.dtype)


def rotate_tokens(
    x: jnp.ndarray,
    freqs_cis: Tuple[jnp.ndarray, jnp.ndarray],
    chunk: int | None = None,
    pre=None,
) -> jnp.ndarray:
    """Rotate one tensor [B, S, H, D] with (cos, sin) tables [S, D].

    Computed in fp32 and cast back, matching the reference's fp32 rotation
    (reference: hyvideo/modules/posemb_layers.py:170-171).

    `chunk`: apply over token chunks via `lax.map` so the fp32 intermediates
    never materialize at full sequence length (at 67k tokens x 24 heads they
    are ~0.8 GB each — the difference between fitting and OOM at 720p-class
    shapes on a 16 GB chip). The rotation is pointwise per token, so results
    are identical.

    `pre`: optional per-token map applied to each chunk *in the same pass*
    (models/dit.py fuses QK-RMSNorm here — each separate chunked pass costs
    a full HBM read+write of the tensor, and lax.map bodies cannot fuse
    across passes). `pre` must be pointwise per token; it sees zero-padded
    tail rows, whose output is sliced off.
    """
    cos, sin = freqs_cis
    if pre is None:
        pre = lambda u: u  # noqa: E731
    s = x.shape[1]
    if chunk is None or s <= chunk:
        return _rotate_one(pre(x), cos[None, :, None, :],
                           sin[None, :, None, :])

    import jax

    b, s_, h, d = x.shape
    pad = (-s_) % chunk
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x
    cp = jnp.pad(cos, ((0, pad), (0, 0))) if pad else cos
    sp = jnp.pad(sin, ((0, pad), (0, 0))) if pad else sin
    nc = xp.shape[1] // chunk
    xc = xp.reshape(b, nc, chunk, h, d).transpose(1, 0, 2, 3, 4)
    cc = cp.reshape(nc, 1, chunk, 1, d)
    sc = sp.reshape(nc, 1, chunk, 1, d)
    yc = jax.lax.map(lambda t: _rotate_one(pre(t[0]), t[1], t[2]),
                     (xc, cc, sc))
    return yc.transpose(1, 0, 2, 3, 4).reshape(b, nc * chunk, h, d)[:, :s_]


def apply_rotary_emb(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    freqs_cis: Tuple[jnp.ndarray, jnp.ndarray],
    chunk: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding to q/k shaped [B, S, H, D] (seq-second layout);
    see `rotate_tokens` for the chunking contract."""
    return (rotate_tokens(xq, freqs_cis, chunk),
            rotate_tokens(xk, freqs_cis, chunk))


def make_joint_freqs(cos, sin, txt_len: int,
                     seq_pad_multiple=None):
    """Extend an img-only RoPE table with identity rows (cos=1, sin=0) over
    `txt_len` text tokens (+ alignment padding, mirroring dit_forward's
    seq_pad_multiple text pad). Passing the pre-extended table to
    dit_forward saves keeping two full tables alive across the denoise
    scan."""
    img_len, d = cos.shape
    if seq_pad_multiple:
        txt_len += (-(img_len + txt_len)) % seq_pad_multiple
    cos = np.concatenate(
        [np.asarray(cos), np.ones((txt_len, d), np.asarray(cos).dtype)])
    sin = np.concatenate(
        [np.asarray(sin), np.zeros((txt_len, d), np.asarray(sin).dtype)])
    return jnp.asarray(cos), jnp.asarray(sin)

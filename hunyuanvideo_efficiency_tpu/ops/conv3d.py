"""Causal 3D convolution and temporal resampling ops (channels-last).

The reference VAE is built on `CausalConv3d`: a Conv3d whose temporal padding
is (k-1, 0) with replicate mode so frame t never sees frames > t, and whose
spatial padding is symmetric k//2 (reference:
hyvideo/vae/unet_causal_3d_blocks.py:49-75). We keep tensors in NDHWC
(B, T, H, W, C) — the layout XLA:TPU tiles best — and use
`lax.conv_general_dilated` with DHWIO kernels. Public pipeline boundaries
transpose from the reference's NCDHW convention.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")


def replicate_pad_t(x: jnp.ndarray, before: int, after: int = 0) -> jnp.ndarray:
    """Edge-replicate padding along the T axis of [B, T, H, W, C]."""
    if before == 0 and after == 0:
        return x
    parts = []
    if before:
        parts.append(jnp.repeat(x[:, :1], before, axis=1))
    parts.append(x)
    if after:
        parts.append(jnp.repeat(x[:, -1:], after, axis=1))
    return jnp.concatenate(parts, axis=1)


def causal_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: Tuple[int, int, int] = (1, 1, 1),
    impl: str = "auto",
) -> jnp.ndarray:
    """Causal conv over [B, T, H, W, C] with kernel [kt, kh, kw, Cin, Cout].

    Padding is edge-replicate everywhere, asymmetric (kt-1, 0) on T (causal)
    and symmetric k//2 on H/W — exactly the reference's
    F.pad(..., (kw//2, kw//2, kh//2, kh//2, kt-1, 0), mode='replicate')
    (reference: hyvideo/vae/unet_causal_3d_blocks.py:68-75).

    impl="t2d" decomposes the 3D conv into kt temporally-shifted 2D NHWC
    convs summed together — identical math, but the [B*T, H, W, C] 2D conv
    is the layout XLA:TPU tiles best. impl="3d" is the direct
    conv_general_dilated form. impl="pallas" is the implicit-GEMM Pallas
    kernel (ops/conv3d_pallas.py) — measured 60.5 vs 47.5 TFLOP/s (1.27x)
    on the VAE decoder's dominant 128-ch 256px stage and 47.4 vs 42.7 at
    256-ch, parity at 512-ch (scripts/conv_probe.py, on-chip), used
    whenever its static shape gate admits the call. impl="auto" (default)
    picks pallas when applicable, else t2d for small tensors and 3d for
    large ones: the t2d decomposition materializes kt shifted full-tensor
    copies (3 x 4.2 GB at a 256px decode tile's widest stage — the
    allocation that made big-tile VAE decode un-compilable on one chip),
    while the direct form needs only the padded input.
    """
    kt, kh, kw = kernel.shape[0], kernel.shape[1], kernel.shape[2]
    if impl in ("auto", "pallas"):
        from .conv3d_pallas import (conv3d_stride1_pallas,
                                    pallas_conv_applicable)

        from .conv3d_pallas import pick_h_block

        hb = (pick_h_block(x.shape, kernel.shape)
              if pallas_conv_applicable(x.shape, kernel.shape,
                                        tuple(stride)) else None)
        if hb is not None:
            w = x.shape[3]
            w_out = -(-w // 8) * 8  # kernel needs w_out AND Wp 8-aligned
            wp = -(-(w_out + kw - 1) // 8) * 8
            extra = wp - (w + kw - 1)
            xp = jnp.pad(x, [(0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                             (kw // 2, kw // 2 + extra), (0, 0)],
                         mode="edge")
            from . import conv3d_pallas as _cp

            out = conv3d_stride1_pallas(xp, kernel.astype(x.dtype), w_out,
                                        h_block=hb,
                                        interpret=_cp.INTERPRET_OVERRIDE)
            out = out[:, :, :, :w]
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out
        if impl == "pallas":
            raise ValueError(
                f"pallas conv gate rejects shape {x.shape} kernel "
                f"{kernel.shape} stride {stride}")
    if impl == "auto":
        impl = "3d" if x.size >= 200_000_000 else "t2d"
    if impl == "3d" or kt == 1:
        pad = [(0, 0), (kt - 1, 0), (kh // 2, kh // 2),
               (kw // 2, kw // 2), (0, 0)]
        if any(p != (0, 0) for p in pad):
            x = jnp.pad(x, pad, mode="edge")
        out = lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=stride,
            padding="VALID", dimension_numbers=_DN)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out

    st, sh, sw = stride
    pad = [(0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
           (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    b, tp, hp, wp, cin = xp.shape
    t_out = (tp - kt) // st + 1
    h_out = (hp - kh) // sh + 1
    w_out = (wp - kw) // sw + 1
    cout = kernel.shape[-1]

    out = None
    for dt in range(kt):
        xs = xp[:, dt:dt + (t_out - 1) * st + 1:st]  # [B, T', Hp, Wp, Cin]
        x2 = xs.reshape(b * t_out, hp, wp, cin)
        y2 = lax.conv_general_dilated(
            x2, kernel[dt].astype(x.dtype), window_strides=(sh, sw),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y2 if out is None else out + y2
    out = out.reshape(b, t_out, h_out, w_out, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d_1x1(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
               ) -> jnp.ndarray:
    """Pointwise conv == matmul over channels. kernel: [Cin, Cout]."""
    out = jnp.einsum("bthwc,cd->bthwd", x, kernel.astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def causal_avg_pool_t(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Replicate-pad (k-1, 0) on T then avg_pool3d((k,1,1), (s,1,1)).

    Matches the t-ops pooling hook (reference:
    hyvideo/vae/unet_causal_3d_blocks.py:767-783).
    """
    x = replicate_pad_t(x, kernel - 1, 0)
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, kernel, 1, 1, 1),
        window_strides=(1, stride, 1, 1, 1),
        padding="VALID",
    )
    return summed / float(kernel)


def interpolate_nearest_t(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest-neighbor temporal upsample by integer scale on [B,T,H,W,C]."""
    return jnp.repeat(x, scale, axis=1)


def _nearest_upsample_hw(x: jnp.ndarray, sh: int, sw: int) -> jnp.ndarray:
    if sh > 1:
        x = jnp.repeat(x, sh, axis=2)
    if sw > 1:
        x = jnp.repeat(x, sw, axis=3)
    return x


def upsample_nearest_causal_3d(x: jnp.ndarray,
                               factor: Tuple[int, int, int]) -> jnp.ndarray:
    """Causal nearest upsample: frame 0 is upsampled spatially only; frames
    1..T-1 are upsampled on (T, H, W) (reference:
    hyvideo/vae/unet_causal_3d_blocks.py:155-171). Output T = (T-1)*ft + 1.
    """
    ft, fh, fw = factor
    t = x.shape[1]
    first = _nearest_upsample_hw(x[:, :1], fh, fw)
    if t == 1:
        return first
    rest = x[:, 1:]
    if ft > 1:
        rest = jnp.repeat(rest, ft, axis=1)
    rest = _nearest_upsample_hw(rest, fh, fw)
    return jnp.concatenate([first, rest], axis=1)

"""FP8 (E4M3) weight quantization for the DiT block linears.

TPU-native analog of the reference's fp8 path
(reference: hyvideo/modules/fp8_optimization.py:7-101): per-tensor symmetric
scales, E4M3 storage, dequantize-to-compute-dtype at matmul time. Instead of
monkey-patching `nn.Linear.forward`, the functional `linear()` in models/dit.py
recognises quantized leaves ({'kernel': fp8, 'scale': f32}) and XLA fuses the
dequant multiply into the matmul's operand load.

Only double/single-block weights are quantized (the reference converts only
`double_blocks`/`single_blocks` linears, fp8_optimization.py:92-96); embedders
and the final layer stay high precision.

For stacked (scanned) block params, scales are per-block (axis 0), i.e. a
[depth, 1, 1] scale next to a [depth, in, out] kernel — per-tensor per layer,
matching the reference's `*_fp8_map.pt` side-car of one scale per linear.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# Max representable magnitude of float8_e4m3fn: 1.75 * 2^8
# (reference computes the same 448.0 via get_fp_maxval, fp8_optimization.py:7-18)
FP8_E4M3_MAX = 448.0

QUANT_BLOCK_KEYS = ("double_blocks", "single_blocks")


def quantize_tensor_fp8(w: jnp.ndarray, stacked: bool):
    """Per-tensor (per-block if stacked) E4M3 quantization.

    Returns {'kernel': float8_e4m3fn, 'scale': f32 broadcastable}.
    """
    wf = w.astype(jnp.float32)
    if stacked:
        axes = tuple(range(1, w.ndim))
        amax = jnp.max(jnp.abs(wf), axis=axes, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(wf))
    scale = jnp.maximum(amax, 1e-12) / FP8_E4M3_MAX
    q = jnp.clip(wf / scale, -FP8_E4M3_MAX, FP8_E4M3_MAX)
    return {"kernel": q.astype(jnp.float8_e4m3fn),
            "scale": scale.astype(jnp.float32)}


def dequantize(p: Dict[str, Any], dtype) -> jnp.ndarray:
    if "scale_out" in p:
        return (p["kernel"].astype(jnp.float32) * p["scale_out"]).astype(dtype)
    return (p["kernel"].astype(jnp.float32) * p["scale"]).astype(dtype)


def quantize_tensor_int8(w: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of a linear kernel.

    Works on [in, out] and stacked [depth, in, out] kernels alike: the
    absmax reduces over the contraction (in) axis, giving a scale of shape
    [..., 1, out] that broadcasts over matmul results and column-slices
    together with the kernel.

    Unlike fp8 (a storage format the reference also uses,
    hyvideo/modules/fp8_optimization.py), int8 is a *compute* format here:
    the v5e MXU executes s8 x s8 -> s32 dots at twice the bf16 rate, so the
    matmul-dominated denoise step speeds up, not just the weight footprint.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"kernel": q, "scale_out": scale.astype(jnp.float32)}


def quantize_dit_params_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every linear kernel inside double/single blocks to int8
    (per-output-channel scales). Same coverage as the fp8 converter: biases,
    norms, embedders and the final layer stay high precision."""
    out = dict(params)
    for key in QUANT_BLOCK_KEYS:
        if key not in params:
            continue

        def conv(p):
            if isinstance(p, dict):
                if "kernel" in p and p["kernel"].ndim >= 2:
                    rest = {k: v for k, v in p.items()
                            if k not in ("kernel", "scale")}
                    # an already-fp8 leaf must be dequantized first — the
                    # raw E4M3 codes are off by the per-tensor fp8 scale
                    w = (dequantize(p, jnp.float32) if "scale" in p
                         else p["kernel"])
                    return {**rest, **quantize_tensor_int8(w)}
                return {k: conv(v) for k, v in p.items()}
            return p

        out[key] = conv(params[key])
    return out


def quantize_dit_params_fp8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every linear kernel inside double/single blocks to fp8.

    Biases, norms, and modulation/embedding layers keep their dtype (the
    reference likewise only converts weight tensors of block linears,
    fp8_optimization.py:92-98).
    """
    out = dict(params)
    for key in QUANT_BLOCK_KEYS:
        if key not in params:
            continue

        def conv(p):
            if isinstance(p, dict):
                if "kernel" in p and p["kernel"].ndim >= 2:
                    rest = {k: v for k, v in p.items() if k != "kernel"}
                    return {**rest,
                            **quantize_tensor_fp8(p["kernel"], stacked=True)}
                return {k: conv(v) for k, v in p.items()}
            return p

        out[key] = conv(params[key])
    return out


def fp8_param_bytes(params: Dict[str, Any]) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def quantize_tensor_int4(w: jnp.ndarray):
    """Per-output-channel symmetric int4 storage: two values per byte.

    Pairs along the OUT axis: even columns in the low nibble, odd in the
    high nibble. Range [-7, 7] (the -8 code is unused, keeping the scale
    symmetric). Returns {'kernel_i4': uint8 [..., in, out/2],
    'scale_out': f32 [..., 1, out]}.
    """
    assert w.shape[-1] % 2 == 0, "int4 packing needs an even out dim"
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    low = q[..., 0::2] & 0xF
    high = q[..., 1::2] & 0xF
    packed = (low | (high << 4)).astype(jnp.uint8)
    return {"kernel_i4": packed, "scale_out": scale.astype(jnp.float32)}


def dequantize_int4(p, dtype):
    """uint8-packed int4 -> dense [..., in, out] in `dtype`."""
    b = p["kernel_i4"]
    low = (b & 0xF).astype(jnp.int8)
    low = jnp.where(low > 7, low - 16, low)
    high = (b >> 4).astype(jnp.int8)
    high = jnp.where(high > 7, high - 16, high)
    q = jnp.stack([low, high], axis=-1).reshape(*b.shape[:-1],
                                                b.shape[-1] * 2)
    return (q.astype(jnp.float32) * p["scale_out"]).astype(dtype)


MODULATION_KEYS = ("modulation", "img_mod", "txt_mod")


def quantize_dit_params_int4_modulation(params):
    """int4-pack the adaLN modulation linears of double/single blocks.

    The modulation matrices are 3.4B of the 13B parameters (h -> 6h/3h
    per block) yet only ever run as batch-size matvecs of the shared
    conditioning vector — the least compute- and the most storage-heavy
    class in the model. int4 storage frees ~1.7 GB, the difference that
    fits 720p x 129f on a single 16 GB chip (opt-in quality trade, like
    int8/STA; the reference has no analog — it needs 60 GB for 720p)."""
    out = dict(params)
    for key in QUANT_BLOCK_KEYS:
        if key not in params:
            continue
        blocks = dict(out[key])
        for mk in MODULATION_KEYS:
            if mk in blocks and "kernel" in blocks[mk]:
                p = blocks[mk]
                rest = {k: v for k, v in p.items()
                        if k not in ("kernel", "scale", "scale_out")}
                blocks[mk] = {**rest, **quantize_tensor_int4(
                    dequantize(p, jnp.float32) if ("scale" in p
                                                   or "scale_out" in p)
                    else p["kernel"])}
        out[key] = blocks
    return out

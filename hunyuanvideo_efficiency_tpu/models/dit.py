"""HunyuanVideo MM-DiT backbone — TPU-native functional implementation.

Re-designs the reference HYVideoDiffusionTransformer
(reference: hyvideo/modules/models.py:396-760) for XLA:

* All 20 double-stream blocks (and all 40 single-stream blocks) share one
  traced body, iterated with `lax.scan` over stacked parameters: constant
  compile time in depth and a natural remat boundary.
* Patch embedding is a reshape + matmul (stride==kernel Conv3d is exactly
  block-diagonal patchify; reference embed_layers.py:40-58) — lands on the
  MXU with no conv lowering.
* Varlen packing (get_cu_seqlens, attenion.py:34-57) is replaced by a
  key-padding bias over a static [img_len + txt_len] sequence — see
  ops/attention.py for the equivalence argument.
* QK-RMSNorm + 3D RoPE (interleaved real cos/sin) + joint img/txt attention
  match the reference math (models.py:132-252, 326-393).

Parameter tree layout (linears are {'kernel': [in, out], 'bias': [out]}):
  time_in / vector_in / guidance_in : MLP embedders
  txt_in : token refiner (token_refiner.py)
  img_in : {'kernel': [pt*ph*pw*C, hidden], 'bias': [hidden]}
  double_blocks : every leaf stacked on axis 0 (depth D=20)
  single_blocks : stacked on axis 0 (depth 40)
  final_layer : norm-free adaLN + zero-init linear
"""
from __future__ import annotations

import os
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (attention, joint_attention, sdpa_attention,
                             text_key_bias)
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rotary_emb, rotate_tokens
from .dit_config import DiTConfig

Params = Dict[str, Any]

ACT = {
    "gelu": jax.nn.gelu,
    "gelu_tanh": partial(jax.nn.gelu, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


# --------------------------------------------------------------------------
# small functional layers
# --------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_i4" in p:  # int4-packed storage (modulation linears)
        from ..ops.quantization import dequantize_int4

        y = x @ dequantize_int4(p, x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    w = p["kernel"]
    if w.dtype == jnp.int8:  # W8A8 compute path (ops/quantization.py)
        return _int8_linear(p, x)
    if "scale" in p:  # fp8 storage (ops/quantization.py): dequant fuses
        w = (w.astype(jnp.float32) * p["scale"]).astype(x.dtype)
    else:
        w = w.astype(x.dtype)
    y = x @ w
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


_INT8_TEMP_BUDGET = int(os.environ.get("INT8_TEMP_BUDGET",
                                       1_500_000_000))
"""Byte budget for _int8_linear's widest transient, [L, out] x 4 (the
s8xs8 dot's s32/f32 output before the bf16 cast). INT8_TEMP_BUDGET env
overrides for measurement (read at import).

At 720p-class lengths (118.8k tokens) the wide projections (qkv 9216,
mlp 12288) would transiently need 4.4-5.8 GB — with 13B int8 params
already holding 12.4 GB of HBM those temps are what pushed the staged
720p step past 15.75 GB at runtime, so they COLUMN-chunk
(_int8_linear_colchunked: quantize once, slide the dot over output
column blocks). Square [h -> h] projections only need ~1.45 GB and run
UN-chunked. 544p-class shapes (67.8k tokens) never chunk — they fit
whole and keep their measured perf (the token gate). Measured at
[118.8k, 3072] x [3072, 9216] on v5e: 284.5 TOP/s unchunked, 145
token-chunked (the retired scheme — it re-ran the per-token quant in
every chunk, serializing VPU against MXU), ~212 for the Pallas fused
kernel (ops/int8_matmul.py); column chunking keeps the unchunked dot's
structure (see docs/KERNELS.md)."""


_INT8_CHUNK_TOKENS = 100_000

_INT8_IMPL = "xla"
"""Which W8A8 implementation `linear()` dispatches for sequence-sized
inputs: "xla" (_int8_linear_body, token-chunked when the s32 temp
demands), "pallas" (ops/int8_matmul.int8_linear_pallas — quant, s8 dot
and dequant fused per tile, so no full-size s32 temp exists and no
chunking is needed), or "auto" (pallas on TPU, xla elsewhere — interpret-
mode Pallas at model sizes would stall CPU hosts). Module-level because
`linear()` carries no config; flip with set_int8_impl(). The default
follows the on-chip measurement (scripts/int8_linear_bench.py,
docs/KERNELS.md)."""


def set_int8_impl(impl: str) -> None:
    global _INT8_IMPL
    if impl not in ("xla", "pallas", "auto"):
        raise ValueError(f"int8 impl must be xla|pallas|auto, got {impl!r}")
    _INT8_IMPL = impl


_COLCHUNK_UNROLL = False
"""Column-chunk loop form: False = fori_loop (guaranteed single-temp),
True = static-slice unroll with an optimization_barrier chain (same temp
bound via explicit sequencing; no dynamic-slice weight copies or loop
drains). Set by measurement — see docs/KERNELS.md W8A8 table."""


def set_colchunk_unroll(on: bool) -> None:
    """Pick the column-chunk loop form (_COLCHUNK_UNROLL above).

    Read at TRACE time: an already-jit-cached step keeps the form it was
    traced with until something forces a retrace (new shapes/statics or a
    fresh jit wrapper). Flip it BEFORE building the jitted step; benchmark
    harnesses that rebuild their jit per measurement (bench.py's chain())
    are unaffected."""
    global _COLCHUNK_UNROLL
    _COLCHUNK_UNROLL = bool(on)


def _int8_linear(p: Params, x: jnp.ndarray,
                 act: Optional[str] = None) -> jnp.ndarray:
    """`act` (an ACT key) fuses into the Pallas store epilogue when the
    kernel path fires; otherwise it is applied as a plain elementwise op
    (which XLA fuses into the dequant epilogue anyway)."""
    n_out = p["kernel"].shape[-1]
    h = p["kernel"].shape[0]
    rows = x.size // x.shape[-1]
    use_pallas = _INT8_IMPL == "pallas" or (
        _INT8_IMPL == "auto" and jax.default_backend() == "tpu")
    if use_pallas and h % 128 == 0 and n_out % 128 == 0 and rows >= 1024:
        from ..ops.int8_matmul import int8_linear_pallas

        return int8_linear_pallas(p, x, act=act)
    post = ACT[act] if act else (lambda y: y)
    if (x.ndim == 3 and x.shape[1] > _INT8_CHUNK_TOKENS
            and x.shape[1] * n_out * 4 > _INT8_TEMP_BUDGET):
        return _int8_linear_colchunked(p, x, post)
    return post(_int8_linear_body(p, x))


def _int8_linear_colchunked(p: Params, x: jnp.ndarray, post) -> jnp.ndarray:
    """W8A8 linear with OUTPUT-COLUMN chunking.

    The wide 720p projections (qkv [118.8k, 3072]x[3072, 9216], fc1
    ...x[3072, 12288]) need a 4.4-5.8 GB s32/f32 dot output that does not
    fit next to the 12.4 GB int8 weight tree. Token-chunking bounded the
    temp but re-ran the per-token quant inside every chunk, serializing
    the VPU quant against the MXU dot across chunks (measured 145 TOP/s
    vs 284 unchunked at [118.8k, 3072]x[3072, 9216] on v5e). Here the
    activation is quantized ONCE (int8 xq is L x h = 0.35 GB — cheap),
    and a `fori_loop` slides over column blocks of the weight so only one
    [L, bn] s32 temp is ever live; each block's dequant + `post` epilogue
    fuses into its own dot. Sequential loop semantics guarantee the
    single-temp memory bound (an unrolled loop would let the scheduler
    overlap several multi-GB temps)."""
    n = p["kernel"].shape[-1]
    l = x.shape[1]
    # widest column block whose s32 temp fits the budget and divides n
    # (lane-aligned); n is a multiple of 128 for every DiT projection
    bn = n
    while bn > 128 and (l * bn * 4 > _INT8_TEMP_BUDGET or n % bn):
        bn -= 128
    nc = n // bn

    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)

    w, so = p["kernel"], p["scale_out"]
    bias = p.get("bias")

    def body(j, acc):
        wj = jax.lax.dynamic_slice_in_dim(w, j * bn, bn, axis=-1)
        soj = jax.lax.dynamic_slice_in_dim(so, j * bn, bn, axis=-1)
        y = jax.lax.dot_general(
            xq, wj, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sx * soj[..., 0, :]
        if bias is not None:
            y = y + jax.lax.dynamic_slice_in_dim(
                bias, j * bn, bn, axis=-1).astype(jnp.float32)
        y = post(y.astype(x.dtype))
        return jax.lax.dynamic_update_slice_in_dim(acc, y, j * bn, axis=-1)

    out = jnp.zeros(x.shape[:-1] + (n,), x.dtype)
    if not _COLCHUNK_UNROLL:
        return jax.lax.fori_loop(0, nc, body, out)

    # Unrolled variant (measured alternative, set_colchunk_unroll): STATIC
    # weight slices (no per-iteration dynamic-slice copy, no while-loop
    # pipeline drain between chunks). The temp bound still holds: each
    # chunk's input rides an optimization_barrier with the previous
    # chunk's output, so the scheduler cannot materialize two [L, bn] s32
    # temps at once.
    outs = []
    gate = xq
    for j in range(nc):
        y = jax.lax.dot_general(
            gate, w[..., j * bn:(j + 1) * bn],
            (((gate.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sx * so[..., 0, j * bn:(j + 1) * bn]
        if bias is not None:
            y = y + jax.lax.slice_in_dim(
                bias, j * bn, (j + 1) * bn, axis=-1).astype(jnp.float32)
        y = post(y.astype(x.dtype))
        if j + 1 < nc:
            y, gate = jax.lax.optimization_barrier((y, gate))
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _int8_linear_body(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-token activation quant + s8xs8->s32 MXU dot.

    Weights carry per-output-channel scales ({'kernel': int8, 'scale_out':
    [..., 1, out]}, quantize_tensor_int8). Activations are quantized
    symmetrically per token at matmul time; the int32 accumulator is exact
    (127^2 * 15360 < 2^31), so the only error is the two roundings. The
    same x feeding several column-slices is quantized once (XLA CSE)."""
    # amax reduces in the input dtype (max has no accumulation error), so
    # no full-sequence f32 copy of x is ever materialized — the f32 form
    # below lives only inside one fused elementwise pass (a f32[L, 3072]
    # temp here was 1.37 GB at 720p, the largest allocation in the step)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * p["scale_out"][..., 0, :]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def mlp(p: Params, x: jnp.ndarray, act: str) -> jnp.ndarray:
    if p["fc1"]["kernel"].dtype == jnp.int8:
        # fuse the activation into the W8A8 epilogue: no separate HBM
        # pass over the [L, 4h] hidden (models/dit._int8_linear)
        return linear(p["fc2"], _int8_linear(p["fc1"], x, act=act))
    return linear(p["fc2"], ACT[act](linear(p["fc1"], x)))


def _chunked_tokens(fn, x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Apply a token-pointwise fn over chunks of the token axis of
    [B, L, D] to bound the live intermediate size (e.g. the [L, 4h] MLP
    hidden at 67k tokens is 1.7 GB bf16 — chunking makes 720p-class shapes
    fit a 16 GB chip). fn must be shape-preserving in L."""
    b, l, d = x.shape
    if chunk is None or l <= chunk:
        return fn(x)
    if l % chunk:
        # prefer the largest 8-multiple divisor of l at or under the
        # requested chunk: jnp.pad of [L, 3072] is a 720 MB copy at 720p
        # (8 = the TPU sublane quantum; e.g. 118800 img tokens -> 7920)
        for c in range(chunk - chunk % 8, 7, -8):
            if l % c == 0:
                chunk = c
                break
    pad = (-l) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    nc = x.shape[1] // chunk
    xc = x.reshape(b, nc, chunk, d).transpose(1, 0, 2, 3)
    yc = jax.lax.map(fn, xc)
    y = yc.transpose(1, 0, 2, 3).reshape(b, nc * chunk, -1)
    return y[:, :l]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0
                       ) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] ordering
    (reference: embed_layers.py:93-117). fp32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedder(p: Params, t: jnp.ndarray, dtype,
                      freq_size: int = 256) -> jnp.ndarray:
    emb = timestep_embedding(t, freq_size).astype(dtype)
    return linear(p["mlp_2"], jax.nn.silu(linear(p["mlp_0"], emb)))


def mlp_embedder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """in_layer -> silu -> out_layer (reference: mlp_layers.py:63-73)."""
    return linear(p["out_layer"], jax.nn.silu(linear(p["in_layer"], x)))


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1.0 + scale[:, None]) + shift[:, None]


def apply_gate(x: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    return x * gate[:, None]


def _bound_mode(cfg: DiTConfig) -> str:
    """Static flash softmax-kernel choice: with QK-RMSNorm the score bound
    C ~ sqrt(d)*|g_q|*|g_k| always holds, so only the static-offset Pallas
    kernel needs compiling (halves flash compile work — minutes on the
    remote-compile backend). Without qk_norm keep the traced dispatch."""
    return "static" if cfg.qk_norm else "auto"


def _analytic_score_bound(cfg: DiTConfig, d: int, norm_params):
    """Weight-derived upper bound on |q.k|*scale after QK-norm + RoPE.

    For RMSNorm, ||norm(x)*g|| <= sqrt(d)*max|g| for every token (the
    normalized row has L2 norm <= sqrt(d)); LayerNorm adds the bias L2
    norm. RoPE rotates disjoint 2-D pairs, preserving row norms exactly.
    So C = max_q_bound * max_k_bound / sqrt(d) bounds every score without
    reading q/k — replacing the per-layer Cauchy-Schwarz reduction (a full
    HBM pass over q AND k, ~25 ms/layer at 720p) with O(d) work on the
    norm weights. 1.02 covers bf16 rounding of the normalized rows; the
    static flash kernel only needs C within ~88 of the true row max, so
    the cap at 60 is safe for any realistic gamma.

    norm_params: list of (p_q, p_k) norm-param dicts whose q/k feed one
    joint attention (img and txt towers). Returns scalar f32, or None when
    qk_norm is off (callers then fall back to the numeric bound)."""
    if not cfg.qk_norm:
        return None

    def row_bound(pp):
        g = pp.get("scale") if isinstance(pp, dict) else None
        gb = (jnp.max(jnp.abs(g.astype(jnp.float32)))
              if g is not None else jnp.float32(1.0))
        bound = (d ** 0.5) * gb
        if cfg.qk_norm_type != "rms":
            bias = pp.get("bias") if isinstance(pp, dict) else None
            if bias is not None:
                bound = bound + jnp.sqrt(
                    jnp.sum(jnp.square(bias.astype(jnp.float32))))
        return bound

    qb = jnp.max(jnp.stack([row_bound(pq) for pq, _ in norm_params]))
    kb = jnp.max(jnp.stack([row_bound(pk) for _, pk in norm_params]))
    return jnp.minimum(qb * kb * (d ** -0.5) * 1.02, 60.0)


def _qk_norm(p_q, p_k, q, k, cfg: DiTConfig, chunk=None):
    """QK norm, optionally token-chunked: the norm's fp32 intermediates at
    full length are 2 x [L, H, D] f32 = 2.7 GB at 720p (118.8k tokens) —
    the allocation that pushed 720p past one chip's HBM. Chunking bounds
    them to [chunk, H, D] like the MLP/rope paths (mlp_chunk_tokens)."""
    if not cfg.qk_norm:
        return q, k

    def one(x, pp):
        if cfg.qk_norm_type == "rms":
            return rms_norm(x, pp["scale"])
        return layer_norm(x, pp.get("scale"), pp.get("bias"))

    b, l, h, d = q.shape
    if chunk is None or l <= chunk:
        return one(q, p_q), one(k, p_k)

    def norm_chunked(x, pp):
        f = lambda u: one(u.reshape(b, -1, h, d), pp).reshape(b, -1, h * d)
        y = _chunked_tokens(f, x.reshape(b, l, h * d), chunk)
        return y.reshape(b, l, h, d)

    return norm_chunked(q, p_q), norm_chunked(k, p_k)


def _qk_norm_rope(p_q, p_k, q, k, cfg: DiTConfig, freqs_cis=None,
                  chunk=None):
    """Fused QK-norm + RoPE: ONE token-chunked pass over q/k instead of two.

    Each separate chunked pass costs a full HBM read+write of q and k
    ([B, L, H, D] ~400 MB bf16 each at 544p, x2 tensors x60 blocks), and
    the lax.map chunk bodies cannot fuse across passes; rotating the
    freshly-normed chunk while it is live in VMEM halves that elementwise
    traffic. Results are bit-identical to norm-then-rotate (both fp32 per
    token)."""
    if freqs_cis is None:
        return _qk_norm(p_q, p_k, q, k, cfg, chunk)
    if not cfg.qk_norm:
        return apply_rotary_emb(q, k, freqs_cis, chunk=chunk)

    def pre(pp):
        if cfg.qk_norm_type == "rms":
            return lambda x: rms_norm(x, pp["scale"])
        return lambda x: layer_norm(x, pp.get("scale"), pp.get("bias"))

    return (rotate_tokens(q, freqs_cis, chunk=chunk, pre=pre(p_q)),
            rotate_tokens(k, freqs_cis, chunk=chunk, pre=pre(p_k)))


# --------------------------------------------------------------------------
# Token refiner (reference: hyvideo/modules/token_refiner.py)
# --------------------------------------------------------------------------

def _refiner_block(p: Params, x: jnp.ndarray, c: jnp.ndarray,
                   attn_bias: Optional[jnp.ndarray], heads: int) -> jnp.ndarray:
    gates = linear(p["adaLN_modulation"], jax.nn.silu(c))
    gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)
    nx = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    qkv = linear(p["self_attn_qkv"], nx)
    b, l, _ = qkv.shape
    q, k, v = [u.reshape(b, l, heads, -1)
               for u in jnp.split(qkv, 3, axis=-1)]
    attn = sdpa_attention(q, k, v, bias=attn_bias)
    x = x + apply_gate(linear(p["self_attn_proj"], attn), gate_msa)
    nx2 = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
    x = x + apply_gate(mlp(p["mlp"], nx2, "silu"), gate_mlp)
    return x


def token_refiner(p: Params, x: jnp.ndarray, t: jnp.ndarray,
                  mask: Optional[jnp.ndarray], cfg: DiTConfig) -> jnp.ndarray:
    """LLM hidden states [B, L, text_dim] -> refined [B, L, hidden]
    (reference: token_refiner.py:164-236)."""
    dtype = x.dtype
    t_emb = timestep_embedder(p["t_embedder"], t, dtype)
    if mask is None:
        ctx = jnp.mean(x, axis=1)
    else:
        mf = mask.astype(x.dtype)[..., None]
        ctx = jnp.sum(x * mf, axis=1) / jnp.maximum(jnp.sum(mf, axis=1), 1.0)
    ctx = linear(p["c_embedder"]["linear_2"],
                 jax.nn.silu(linear(p["c_embedder"]["linear_1"], ctx)))
    c = t_emb + ctx

    attn_bias = None
    if mask is not None:
        m = mask.astype(jnp.bool_)
        pair = m[:, None, :] & m[:, :, None]  # [B, L, L]
        pair = pair.at[:, :, 0].set(True)  # avoid NaN rows (reference :157)
        attn_bias = jnp.where(pair, 0.0, -1e30).astype(jnp.float32)[:, None]

    x = linear(p["input_embedder"], x)
    for blk in p["blocks"]:
        x = _refiner_block(blk, x, c, attn_bias, cfg.heads_num)
    return x


# --------------------------------------------------------------------------
# MM blocks
# --------------------------------------------------------------------------

def _qkv_proj(p: Params, x: jnp.ndarray, heads: int, d: int):
    """q/k/v via three column-slice matmuls of the fused qkv weight.

    Equivalent to one [in, 3h] matmul + split, but never materializes the
    [L, 3h] buffer (1.16 GB bf16 at 67k tokens) nor the split copies."""
    b, l, _ = x.shape
    h = heads * d
    q = linear(_col_slice(p, 0, h), x).reshape(b, l, heads, d)
    k = linear(_col_slice(p, h, 2 * h), x).reshape(b, l, heads, d)
    v = linear(_col_slice(p, 2 * h, 3 * h), x).reshape(b, l, heads, d)
    return q, k, v


def _qkv_proj_group(p: Params, x: jnp.ndarray, heads: int, d: int,
                    g: int, hg: int):
    """Per-head-group q/k/v from column slices of the fused qkv weight
    (layout [q | k | v], each h = heads*d wide): full-sequence q/k/v
    buffers never materialize when attention runs group-by-group."""
    b, l, _ = x.shape
    h = heads * d
    o = g * hg * d
    q = linear(_col_slice(p, o, o + hg * d), x).reshape(b, l, hg, d)
    k = linear(_col_slice(p, h + o, h + o + hg * d), x).reshape(b, l, hg, d)
    v = linear(_col_slice(p, 2 * h + o, 2 * h + o + hg * d),
               x).reshape(b, l, hg, d)
    return q, k, v


def double_block(p: Params, img: jnp.ndarray, txt: jnp.ndarray,
                 vec: jnp.ndarray, txt_bias: jnp.ndarray,
                 freqs_cis, cfg: DiTConfig,
                 token_grid=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(reference: models.py:132-252)."""
    b, img_len, h = img.shape
    heads, d = cfg.heads_num, cfg.head_dim

    img_mod = linear(p["img_mod"], jax.nn.silu(vec))
    (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2) = jnp.split(img_mod, 6, -1)
    txt_mod = linear(p["txt_mod"], jax.nn.silu(vec))
    (t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = jnp.split(txt_mod, 6, -1)

    img_m = modulate(layer_norm(img), i_shift1, i_scale1)
    txt_len = txt.shape[1]
    txt_m = modulate(layer_norm(txt), t_shift1, t_scale1)

    joint_rope = (freqs_cis is not None
                  and freqs_cis[0].shape[0] == img_len + txt_len)
    # img rows of the RoPE table: a joint table's text rows are identity
    # (cos=1, sin=0 — see dit_forward), so norm+rope fuse on the img part
    # and the txt part needs norm only; an img-only table slices to itself.
    img_freqs = (None if freqs_cis is None
                 else (freqs_cis[0][:img_len], freqs_cis[1][:img_len]))
    # Head-group loop also applies on the split img/txt (STA) path — the
    # sequence-parallel path shards heads across chips instead, so the two
    # mechanisms are mutually exclusive.
    split_groups = (cfg.attn_head_chunks > 1 and not joint_rope
                    and not cfg.ulysses_axis and not cfg.ring_axis)
    sbound = _analytic_score_bound(
        cfg, d, [(p["img_attn_q_norm"], p["img_attn_k_norm"]),
                 (p["txt_attn_q_norm"], p["txt_attn_k_norm"])])
    if not (joint_rope and cfg.attn_head_chunks > 1) and not split_groups:
        img_q, img_k, img_v = _qkv_proj(p["img_attn_qkv"], img_m, heads, d)
        img_q, img_k = _qk_norm_rope(p["img_attn_q_norm"],
                                     p["img_attn_k_norm"],
                                     img_q, img_k, cfg, img_freqs,
                                     chunk=cfg.mlp_chunk_tokens)
        txt_q, txt_k, txt_v = _qkv_proj(p["txt_attn_qkv"], txt_m, heads, d)
        txt_q, txt_k = _qk_norm(p["txt_attn_q_norm"], p["txt_attn_k_norm"],
                                txt_q, txt_k, cfg)
    if joint_rope:
        # Pre-rotated img q/k concat with identity-rope (= un-rotated) txt:
        # no separate joint-rope pass, and the separately-rope'd img q/k
        # buffers never exist (2 x 696 MB of peak HBM at 720p). With
        # attn_head_chunks > 1 attention additionally runs per head group
        # (column slices of the fused qkv weights in, row slices of the
        # projection out — algebraically identical), dividing the q/k/v
        # working set by the group count.
        if txt_bias is not None:
            key_bias = jnp.concatenate(
                [jnp.zeros((b, 1, 1, img_len), jnp.float32),
                 txt_bias.astype(jnp.float32)], axis=-1)
        else:
            key_bias = None
        ng = max(1, cfg.attn_head_chunks)
        hg = heads // ng
        img_po = txt_po = None
        img_u, txt_u = img_m, txt_m
        for g in range(ng):
            if g > 0:
                # the unrolled groups have no data dependency except the
                # accumulators; without this barrier XLA overlaps them and
                # the peak grows by a full group working set per overlap
                img_u, txt_u, img_po, txt_po = jax.lax.optimization_barrier(
                    (img_m, txt_m, img_po, txt_po))
            if ng == 1:
                iq, ik, iv = img_q, img_k, img_v
                tq, tk, tv = txt_q, txt_k, txt_v
            else:
                iq, ik, iv = _qkv_proj_group(p["img_attn_qkv"], img_u,
                                             heads, d, g, hg)
                iq, ik = _qk_norm_rope(p["img_attn_q_norm"],
                                       p["img_attn_k_norm"], iq, ik, cfg,
                                       img_freqs,
                                       chunk=cfg.mlp_chunk_tokens)
                tq, tk, tv = _qkv_proj_group(p["txt_attn_qkv"], txt_u,
                                             heads, d, g, hg)
                tq, tk = _qk_norm(p["txt_attn_q_norm"],
                                  p["txt_attn_k_norm"], tq, tk, cfg)
            q = jnp.concatenate([iq, tq], axis=1)
            k = jnp.concatenate([ik, tk], axis=1)
            v = jnp.concatenate([iv, tv], axis=1)
            attn = attention(q, k, v, mode=cfg.attn_mode,
                             key_bias=key_bias, bound_mode=_bound_mode(cfg),
                             score_bound=sbound)
            o, e = g * hg * d, (g + 1) * hg * d
            io = linear(_row_slice(p["img_attn_proj"], o, e,
                                   keep_bias=(g == 0)), attn[:, :img_len])
            to = linear(_row_slice(p["txt_attn_proj"], o, e,
                                   keep_bias=(g == 0)), attn[:, img_len:])
            img_po = io if img_po is None else img_po + io
            txt_po = to if txt_po is None else txt_po + to
    elif split_groups:
        # Head-grouped split-path attention (STA at 720p-class shapes):
        # per group, project a column slice of the fused qkv weights,
        # attend, and accumulate the row-sliced projection — identical math
        # to all-heads-at-once, but q/k/v (and STA's tile-permuted copies)
        # exist for heads_num/ng heads at a time.
        ng = cfg.attn_head_chunks
        hg = heads // ng
        img_po = txt_po = None
        img_u, txt_u = img_m, txt_m
        for g in range(ng):
            if g > 0:
                # sequence the unrolled groups (see joint branch above)
                img_u, txt_u, img_po, txt_po = jax.lax.optimization_barrier(
                    (img_m, txt_m, img_po, txt_po))
            iq, ik, iv = _qkv_proj_group(p["img_attn_qkv"], img_u,
                                         heads, d, g, hg)
            iq, ik = _qk_norm_rope(p["img_attn_q_norm"],
                                   p["img_attn_k_norm"], iq, ik, cfg,
                                   img_freqs, chunk=cfg.mlp_chunk_tokens)
            tq, tk, tv = _qkv_proj_group(p["txt_attn_qkv"], txt_u,
                                         heads, d, g, hg)
            tq, tk = _qk_norm(p["txt_attn_q_norm"],
                              p["txt_attn_k_norm"], tq, tk, cfg)
            ia, ta = joint_attention(
                iq, ik, iv, tq, tk, tv, txt_bias,
                mode=cfg.attn_mode, token_grid=token_grid,
                sta_tile=cfg.sta_tile, sta_window=cfg.sta_window,
                bound_mode=_bound_mode(cfg), score_bound=sbound)
            o, e = g * hg * d, (g + 1) * hg * d
            io = linear(_row_slice(p["img_attn_proj"], o, e,
                                   keep_bias=(g == 0)), ia)
            to = linear(_row_slice(p["txt_attn_proj"], o, e,
                                   keep_bias=(g == 0)), ta)
            img_po = io if img_po is None else img_po + io
            txt_po = to if txt_po is None else txt_po + to
    else:
        # RoPE already fused into the img QK-norm pass above
        img_attn, txt_attn = joint_attention(
            img_q, img_k, img_v, txt_q, txt_k, txt_v, txt_bias,
            mode=cfg.attn_mode, ulysses_axis=cfg.ulysses_axis,
            ring_axis=cfg.ring_axis, token_grid=token_grid,
            sta_tile=cfg.sta_tile, sta_window=cfg.sta_window,
            bound_mode=_bound_mode(cfg), score_bound=sbound,
            flash_ring_kernel=cfg.flash_ring_kernel)
        img_po = linear(p["img_attn_proj"], img_attn)
        txt_po = linear(p["txt_attn_proj"], txt_attn)

    img = img + apply_gate(img_po, i_gate1)
    img = img + apply_gate(
        _chunked_tokens(
            lambda u: mlp(p["img_mlp"], u, cfg.mlp_act_type),
            modulate(layer_norm(img), i_shift2, i_scale2),
            cfg.mlp_chunk_tokens), i_gate2)
    txt = txt + apply_gate(txt_po, t_gate1)
    txt = txt + apply_gate(
        mlp(p["txt_mlp"], modulate(layer_norm(txt), t_shift2, t_scale2),
            cfg.mlp_act_type), t_gate2)
    return img, txt


def _col_slice(p: Params, start: int, stop: Optional[int]) -> Params:
    """Column slice of a linear ({kernel [in,out], bias [out]}); the fp8
    per-tensor scale (if any) applies unchanged to any slice."""
    q = {"kernel": p["kernel"][:, start:stop]}
    if "bias" in p:
        q["bias"] = p["bias"][start:stop]
    if "scale" in p:
        q["scale"] = p["scale"]
    if "scale_out" in p:  # int8 per-output-channel: slice with the columns
        q["scale_out"] = p["scale_out"][..., start:stop]
    return q


def _row_slice(p: Params, start: int, stop: Optional[int],
               keep_bias: bool) -> Params:
    q = {"kernel": p["kernel"][start:stop]}
    if keep_bias and "bias" in p:
        q["bias"] = p["bias"]
    if "scale" in p:
        q["scale"] = p["scale"]
    if "scale_out" in p:  # rows = contraction axis; out scales unchanged
        q["scale_out"] = p["scale_out"]
    return q


def single_block(p: Params, x: jnp.ndarray, vec: jnp.ndarray,
                 txt_len: int, txt_bias: jnp.ndarray, freqs_cis,
                 cfg: DiTConfig, token_grid=None) -> jnp.ndarray:
    """Fused-linear parallel attn+MLP block (reference: models.py:326-393).

    The reference's fused linear1 -> [3h qkv | mlp_hidden] split and
    concat(attn, act(mlp)) -> linear2 are algebraically decomposed into
    sliced matmuls: out = attn @ W2[:h] + act(x_mod @ W1[:,3h:]) @ W2[h:].
    Identical math, but the [L, 3h+m] and [L, h+m] concatenation buffers are
    never materialized, and the MLP branch is token-chunkable — together the
    difference between fitting and OOM at 720p-class token counts.
    """
    b, l, h = x.shape
    heads, d = cfg.heads_num, cfg.head_dim
    mod = linear(p["modulation"], jax.nn.silu(vec))
    shift, scale, gate = jnp.split(mod, 3, -1)
    x_mod = modulate(layer_norm(x), shift, scale)
    h3 = 3 * cfg.hidden_size
    p_qkv = _col_slice(p["linear1"], 0, h3)
    sbound = _analytic_score_bound(cfg, d, [(p["q_norm"], p["k_norm"])])
    joint_rope = (freqs_cis is not None and freqs_cis[0].shape[0] == l)
    if joint_rope:
        # dit_forward extended the RoPE table with identity rows (cos=1,
        # sin=0) over the text segment, so the joint q/k rotate in place:
        # no img/txt splits and no re-concats — at 720p those copies were
        # ~2 GB of HBM peak across the 40 single blocks. attn_head_chunks
        # further runs attention per head group (column slices of linear1
        # in, row slices of linear2 out — identical math) so the q/k/v
        # working set is 1/N.
        if txt_bias is not None:
            key_bias = jnp.concatenate(
                [jnp.zeros((b, 1, 1, l - txt_len), jnp.float32),
                 txt_bias.astype(jnp.float32)], axis=-1)
        else:
            key_bias = None
        ng = max(1, cfg.attn_head_chunks)
        hg = heads // ng
        out = None
        x_u = x_mod
        for g in range(ng):
            if g > 0:
                # sequence the unrolled groups (see double_block)
                x_u, out = jax.lax.optimization_barrier((x_mod, out))
            if ng == 1:
                qg, kg, vg = _qkv_proj(p_qkv, x_u, heads, d)
            else:
                qg, kg, vg = _qkv_proj_group(p_qkv, x_u, heads, d, g, hg)
            qg, kg = _qk_norm_rope(p["q_norm"], p["k_norm"], qg, kg, cfg,
                                   freqs_cis, chunk=cfg.mlp_chunk_tokens)
            attn = attention(qg, kg, vg, mode=cfg.attn_mode,
                             key_bias=key_bias, bound_mode=_bound_mode(cfg),
                             score_bound=sbound)
            og = linear(_row_slice(p["linear2"], g * hg * d,
                                   (g + 1) * hg * d, keep_bias=(g == 0)),
                        attn)
            out = og if out is None else out + og
    elif (cfg.attn_head_chunks > 1 and not cfg.ulysses_axis
          and not cfg.ring_axis):
        # Head-grouped split-path attention (STA) — see double_block
        ng = cfg.attn_head_chunks
        hg = heads // ng
        out = None
        x_u = x_mod
        for g in range(ng):
            if g > 0:
                x_u, out = jax.lax.optimization_barrier((x_mod, out))
            qg, kg, vg = _qkv_proj_group(p_qkv, x_u, heads, d, g, hg)
            iq, tq = qg[:, :-txt_len], qg[:, -txt_len:]
            ik, tk = kg[:, :-txt_len], kg[:, -txt_len:]
            iv, tv = vg[:, :-txt_len], vg[:, -txt_len:]
            iq, ik = _qk_norm_rope(p["q_norm"], p["k_norm"], iq, ik, cfg,
                                   freqs_cis, chunk=cfg.mlp_chunk_tokens)
            tq, tk = _qk_norm(p["q_norm"], p["k_norm"], tq, tk, cfg)
            ia, ta = joint_attention(
                iq, ik, iv, tq, tk, tv, txt_bias,
                mode=cfg.attn_mode, token_grid=token_grid,
                sta_tile=cfg.sta_tile, sta_window=cfg.sta_window,
                bound_mode=_bound_mode(cfg), score_bound=sbound)
            attn = jnp.concatenate([ia, ta], axis=1)
            og = linear(_row_slice(p["linear2"], g * hg * d,
                                   (g + 1) * hg * d, keep_bias=(g == 0)),
                        attn)
            out = og if out is None else out + og
    else:
        q, k, v = _qkv_proj(p_qkv, x_mod, heads, d)
        img_q, txt_q = q[:, :-txt_len], q[:, -txt_len:]
        img_k, txt_k = k[:, :-txt_len], k[:, -txt_len:]
        img_v, txt_v = v[:, :-txt_len], v[:, -txt_len:]
        # norm is per-token with shared scales, so splitting first and
        # fusing RoPE into the img norm pass is exact
        img_q, img_k = _qk_norm_rope(p["q_norm"], p["k_norm"], img_q, img_k,
                                     cfg, freqs_cis,
                                     chunk=cfg.mlp_chunk_tokens)
        txt_q, txt_k = _qk_norm(p["q_norm"], p["k_norm"], txt_q, txt_k, cfg)
        img_attn, txt_attn = joint_attention(
            img_q, img_k, img_v, txt_q, txt_k, txt_v, txt_bias,
            mode=cfg.attn_mode, ulysses_axis=cfg.ulysses_axis,
            ring_axis=cfg.ring_axis, token_grid=token_grid,
            sta_tile=cfg.sta_tile, sta_window=cfg.sta_window,
            bound_mode=_bound_mode(cfg), score_bound=sbound,
            flash_ring_kernel=cfg.flash_ring_kernel)
        attn = jnp.concatenate([img_attn, txt_attn], axis=1)
        out = linear(_row_slice(p["linear2"], 0, cfg.hidden_size,
                                keep_bias=True), attn)
    p1_mlp = _col_slice(p["linear1"], h3, None)
    p2_mlp = _row_slice(p["linear2"], cfg.hidden_size, None, keep_bias=False)
    out = out + _chunked_tokens(
        lambda u: linear(p2_mlp, ACT[cfg.mlp_act_type](linear(p1_mlp, u))),
        x_mod, cfg.mlp_chunk_tokens)
    return x + apply_gate(out, gate)


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------

def patchify_raw(x: jnp.ndarray, patch: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C, T, H, W] -> raw patch tokens [B, T' H' W', C*pt*ph*pw].

    Pure reshape/transpose (no params): the token axis is the flattened
    (t, h, w) patch grid in row-major order. This is the canonical sharded
    layout for sequence parallelism — the flat token count divides the mesh
    even when no single spatial axis does (720p's 45-row patch grid is not
    divisible by 8; its 118,800 tokens are).
    """
    b, c, t, hh, ww = x.shape
    pt, ph, pw = patch
    tt, th, tw = t // pt, hh // ph, ww // pw
    x = x.reshape(b, c, tt, pt, th, ph, tw, pw)
    # -> [B, tt, th, tw, C, pt, ph, pw]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, tt * th * tw, c * pt * ph * pw)


def patchify(x: jnp.ndarray, p: Params, patch: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C, T, H, W] -> tokens [B, T' H' W', hidden] via reshape+matmul.

    Equivalent to Conv3d(kernel=stride=patch) then flatten; channel ordering
    inside each patch matches the conv kernel layout (C, pt, ph, pw) so torch
    weights convert directly.
    """
    return linear(p, patchify_raw(x, patch))


def unpatchify(x: jnp.ndarray, tt: int, th: int, tw: int, c: int,
               patch: Tuple[int, int, int]) -> jnp.ndarray:
    """Tokens [B, L, pt*ph*pw*C] -> [B, C, T, H, W]
    (reference: models.py:697-710, einsum 'nthwcopq->nctohpwq')."""
    pt, ph, pw = patch
    b = x.shape[0]
    x = x.reshape(b, tt, th, tw, c, pt, ph, pw)
    x = jnp.einsum("nthwcopq->nctohpwq", x)
    return x.reshape(b, c, tt * pt, th * ph, tw * pw)


def _forward_preamble(
    params: Params,
    x_tokens: jnp.ndarray,       # [B, L(_loc), C*pt*ph*pw] raw patch tokens
    t: jnp.ndarray,
    text_states: jnp.ndarray,
    text_mask: jnp.ndarray,
    text_states_2: jnp.ndarray,
    freqs_cos: jnp.ndarray,
    freqs_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray],
    cfg: DiTConfig,
):
    """Front half of dit_forward (embedders, patch projection, token
    refiner, text padding, joint RoPE table), shared by the monolithic,
    staged, and sequence-parallel dispatches. Takes raw patch tokens
    (`patchify_raw`) so sequence-parallel callers can pass a token shard.
    Returns (img, txt, vec, txt_bias, freqs_cis_sgl)."""
    dtype = params["img_in"]["kernel"].dtype
    b = x_tokens.shape[0]
    img_len = x_tokens.shape[1]
    text_states = text_states.astype(dtype)
    text_states_2 = text_states_2.astype(dtype)

    vec = timestep_embedder(params["time_in"], t, dtype)
    vec = vec + mlp_embedder(params["vector_in"], text_states_2)
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance required for guidance-distilled model")
        vec = vec + timestep_embedder(params["guidance_in"], guidance, dtype)

    img = linear(params["img_in"], x_tokens.astype(dtype))
    if cfg.text_projection == "linear":
        txt = linear(params["txt_in"]["linear_2"], jax.nn.silu(
            linear(params["txt_in"]["linear_1"], text_states)))
    elif cfg.text_projection == "single_refiner":
        txt = token_refiner(params["txt_in"], text_states, t,
                            text_mask if cfg.use_attention_mask else None, cfg)
    else:
        raise NotImplementedError(cfg.text_projection)

    if cfg.seq_pad_multiple:
        # Align img_len + txt_len to the attention block size by padding
        # the TEXT segment with masked tokens: the key-padding bias already
        # silences masked text keys in every layer, so this is numerically
        # inert for valid positions (same argument as ops/attention.py) —
        # and it removes the flash wrapper's full-sequence pad copies,
        # ~1.4 GB of HBM peak at 720p (the difference between fitting one
        # chip and OOM).
        extra = (-(img_len + txt.shape[1])) % cfg.seq_pad_multiple
        if extra:
            txt = jnp.pad(txt, ((0, 0), (0, extra), (0, 0)))
            text_mask = (jnp.pad(text_mask, ((0, 0), (0, extra)))
                         if text_mask is not None else
                         jnp.pad(jnp.ones((b, txt.shape[1] - extra),
                                          jnp.int32),
                                 ((0, 0), (0, extra))))

    txt_len = txt.shape[1]
    txt_bias = text_key_bias(text_mask) if text_mask is not None else None
    freqs_cis = (freqs_cos, freqs_sin) if freqs_cos is not None else None

    # Joint RoPE table for the double- and single-stream blocks: identity
    # rows (cos=1,
    # sin=0) over the text segment let them rotate the whole [img|txt]
    # sequence in place instead of split -> rotate img -> re-concat (those
    # copies were ~2 GB of HBM peak at 720p). Only valid when attention
    # consumes the joint layout directly (not STA / sequence parallel).
    joint_ok = (not cfg.attn_mode.startswith("sta")
                and not cfg.ulysses_axis
                and not cfg.ring_axis)
    if freqs_cis is not None and joint_ok:
        if freqs_cos.shape[0] == img_len + txt_len:
            # caller passed a pre-extended joint table (identity rows over
            # text); using it directly avoids keeping both the img-only
            # args and the extension copies live across the whole scan
            # (117 MB at 720p) — see make_joint_freqs
            freqs_cis_sgl = freqs_cis
        else:
            fd = freqs_cos.shape[-1]
            freqs_cis_sgl = (
                jnp.concatenate(
                    [freqs_cos, jnp.ones((txt_len, fd), freqs_cos.dtype)]),
                jnp.concatenate(
                    [freqs_sin, jnp.zeros((txt_len, fd), freqs_sin.dtype)]))
    else:
        freqs_cis_sgl = freqs_cis

    return img, txt, vec, txt_bias, freqs_cis_sgl


def _forward_final_tokens(fl: Params, img: jnp.ndarray, vec: jnp.ndarray
                          ) -> jnp.ndarray:
    """Final adaLN + zero-init linear, token-pointwise (reference:
    mlp_layers.py:114-118). Returns [B, L, pt*ph*pw*out_c] tokens —
    callers unpatchify (single-chip) or keep the token shard (SP)."""
    sh_sc = linear(fl["adaLN_modulation"], jax.nn.silu(vec))
    shift, scale = jnp.split(sh_sc, 2, -1)
    img = modulate(layer_norm(img), shift, scale)
    return linear(fl["linear"], img)


def _forward_final(fl: Params, img: jnp.ndarray, vec: jnp.ndarray,
                   tt: int, th: int, tw: int, cfg: DiTConfig) -> jnp.ndarray:
    """Final adaLN + zero-init linear + unpatchify, shared by monolithic
    and staged dispatch."""
    img = _forward_final_tokens(fl, img, vec)
    return unpatchify(img, tt, th, tw, cfg.out_channels, cfg.patch_size)


def dit_forward_tokens(
    params: Params,
    x_tokens: jnp.ndarray,       # [B, L(_loc), C*pt*ph*pw] raw patch tokens
    t: jnp.ndarray,              # [B] in [0, 1000)
    text_states: jnp.ndarray,    # [B, txt_len, text_states_dim]
    text_mask: jnp.ndarray,      # [B, txt_len]
    text_states_2: jnp.ndarray,  # [B, text_states_dim_2]
    freqs_cos: jnp.ndarray,      # [L(_loc), head_dim]
    freqs_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,  # [B], cfg_scale * 1000
    cfg: DiTConfig = None,
    token_grid: Optional[Tuple[int, int, int]] = None,
    param_gather=None,
    weight_chunks: int = 4,
) -> jnp.ndarray:
    """Token-form forward: raw patch tokens in, output-patch tokens out
    ([B, L, pt*ph*pw*out_c]); no patchify/unpatchify reshapes.

    This is the sequence-parallel body (parallel/sp_dit.py): inside
    shard_map, x_tokens/freqs are the per-device shard of the flat token
    sequence and `token_grid` is the GLOBAL (T', H', W') patch grid (STA
    needs it after the Ulysses head-scatter gathers the full sequence).
    Single-chip callers use `dit_forward` below.

    param_gather: sharded-weight tier hook (parallel/sp_dit.py:
    shard_dit_params). When the stacked block params arrive weight-sharded
    over the mesh, the block stacks are traversed in `weight_chunks`
    depth chunks, each chunk's params all_gather'd just before its scan —
    persistent per-device weight memory drops to 1/sp of the stack plus
    one transient chunk. Callable: (stacked-chunk pytree) -> full pytree.
    """
    img_len = x_tokens.shape[1]

    img, txt, vec, txt_bias, freqs_cis_sgl = _forward_preamble(
        params, x_tokens, t, text_states, text_mask, text_states_2,
        freqs_cos, freqs_sin, guidance, cfg)
    txt_len = txt.shape[1]

    def make_dbl(block_cfg):
        def dbl(carry, bp):
            img, txt = carry
            img, txt = double_block(bp, img, txt, vec, txt_bias,
                                    freqs_cis_sgl, block_cfg, token_grid)
            return (img, txt), None
        return jax.checkpoint(dbl) if cfg.remat_blocks else dbl

    def make_sgl(block_cfg):
        def sgl(xx, bp):
            return single_block(bp, xx, vec, txt_len, txt_bias,
                                freqs_cis_sgl, block_cfg, token_grid), None
        return jax.checkpoint(sgl) if cfg.remat_blocks else sgl

    def scan_range(carry, stack, fn, depth, name):
        """Scan `depth` stacked blocks, optionally gathering weight-sharded
        params chunk-by-chunk (see param_gather in the docstring)."""
        if param_gather is None:
            carry, _ = jax.lax.scan(fn, carry, stack)
            return carry
        step = max(1, -(-depth // weight_chunks))
        for c0 in range(0, depth, step):
            sub = jax.tree.map(lambda x: x[c0:c0 + step], stack)
            carry, _ = jax.lax.scan(fn, carry, param_gather(sub, name))
        return carry

    def run_stack(carry, stack, make_fn, n_dense, name):
        """Scan stacked blocks; under STA, the first n_dense blocks run
        with dense flash attention (sta_dense_*_blocks, paper-style
        quality anchor layers) via a split scan."""
        depth = jax.tree.leaves(stack)[0].shape[0]
        if cfg.attn_mode.startswith("sta") and n_dense > 0:
            from dataclasses import replace as _replace

            dense_cfg = _replace(cfg, attn_mode="auto")
            head = jax.tree.map(lambda x: x[:n_dense], stack)
            tail = jax.tree.map(lambda x: x[n_dense:], stack)
            carry = scan_range(carry, head, make_fn(dense_cfg), n_dense,
                               name)
            return scan_range(carry, tail, make_fn(cfg), depth - n_dense,
                              name)
        return scan_range(carry, stack, make_fn(cfg), depth, name)

    (img, txt) = run_stack((img, txt), params["double_blocks"], make_dbl,
                           cfg.sta_dense_double_blocks, "double_blocks")
    xx = jnp.concatenate([img, txt], axis=1)
    xx = run_stack(xx, params["single_blocks"], make_sgl,
                   cfg.sta_dense_single_blocks, "single_blocks")
    img = xx[:, :img_len]
    return _forward_final_tokens(params["final_layer"], img, vec)


def dit_forward(
    params: Params,
    x: jnp.ndarray,              # [B, C, T', H', W'] latent
    t: jnp.ndarray,              # [B] in [0, 1000)
    text_states: jnp.ndarray,    # [B, txt_len, text_states_dim]
    text_mask: jnp.ndarray,      # [B, txt_len]
    text_states_2: jnp.ndarray,  # [B, text_states_dim_2]
    freqs_cos: jnp.ndarray,      # [img_len, head_dim]
    freqs_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,  # [B], cfg_scale * 1000
    cfg: DiTConfig = None,
) -> jnp.ndarray:
    """Full forward (reference: models.py:595-695). Returns [B, C, T', H', W']."""
    b, c, ot, oh, ow = x.shape
    pt, ph, pw = cfg.patch_size
    tt, th, tw = ot // pt, oh // ph, ow // pw
    out = dit_forward_tokens(
        params, patchify_raw(x, cfg.patch_size), t, text_states, text_mask,
        text_states_2, freqs_cos, freqs_sin, guidance, cfg=cfg,
        token_grid=(tt, th, tw))
    return unpatchify(out, tt, th, tw, cfg.out_channels, cfg.patch_size)


# --------------------------------------------------------------------------
# Staged (host-chunked) dispatch
# --------------------------------------------------------------------------
#
# The tunneled TPU runtime kills any single on-device program running longer
# than ~60 s (CLAUDE.md); one monolithic 720p denoise-step forward is ~75 s.
# dit_forward_staged splits the forward into several jitted programs driven
# from host — a preamble, chunked scans over slices of the stacked block
# params, and a final program — with identical numerics (test_dit.py) and
# ~30 ms dispatch overhead per chunk. The reference runs the whole step as
# one CUDA graph (hyvideo/modules/models.py:595-695); on this runtime the
# equivalent is a short pipeline of XLA programs.

_PRE_KEYS = ("img_in", "time_in", "vector_in", "guidance_in", "txt_in")


@partial(jax.jit, static_argnames=("cfg",))
def _staged_pre(pre_params, x, t, text_states, text_mask, text_states_2,
                freqs_cos, freqs_sin, guidance, cfg):
    return _forward_preamble(pre_params, patchify_raw(x, cfg.patch_size), t,
                             text_states, text_mask, text_states_2,
                             freqs_cos, freqs_sin, guidance, cfg)


@partial(jax.jit, static_argnames=("cfg", "length", "token_grid"),
         donate_argnames=("img", "txt"))
def _staged_double_chunk(stack, start, img, txt, vec, txt_bias,
                         freqs_cos, freqs_sin, cfg, length, token_grid):
    """Scan `length` double blocks starting at traced offset `start`.

    `start` is traced (dynamic_slice) so ALL chunks of one length share a
    single compiled program — a static start would recompile the whole scan
    per chunk (minutes per compile on the remote-compile backend)."""
    chunk = jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, length, 0), stack)
    freqs = (freqs_cos, freqs_sin) if freqs_cos is not None else None

    def dbl(carry, bp):
        im, tx = carry
        im, tx = double_block(bp, im, tx, vec, txt_bias, freqs, cfg,
                              token_grid)
        return (im, tx), None

    (img, txt), _ = jax.lax.scan(dbl, (img, txt), chunk)
    return img, txt


@partial(jax.jit, static_argnames=("cfg", "length", "token_grid", "txt_len"),
         donate_argnames=("xx",))
def _staged_single_chunk(stack, start, xx, vec, txt_bias,
                         freqs_cos, freqs_sin, cfg, length, token_grid,
                         txt_len):
    chunk = jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, length, 0), stack)
    freqs = (freqs_cos, freqs_sin) if freqs_cos is not None else None

    def sgl(x_c, bp):
        return single_block(bp, x_c, vec, txt_len, txt_bias, freqs, cfg,
                            token_grid), None

    xx, _ = jax.lax.scan(sgl, xx, chunk)
    return xx


@partial(jax.jit, donate_argnums=(0, 1))
def _staged_concat(img, txt):
    return jnp.concatenate([img, txt], axis=1)


@partial(jax.jit, static_argnames=("cfg", "grid", "img_len"))
def _staged_final(fl, xx, vec, cfg, grid, img_len):
    tt, th, tw = grid
    return _forward_final(fl, xx[:, :img_len], vec, tt, th, tw, cfg)


def _chunk_plan(depth, n_chunks, n_dense, cfg):
    """Cut [0, depth) into ~n_chunks (start, length, block_cfg) pieces,
    respecting the STA dense-head boundary (those blocks run with dense
    attention — see run_stack in dit_forward)."""
    if n_dense > 0 and cfg is not None and cfg.attn_mode.startswith("sta"):
        from dataclasses import replace as _replace

        segs = [(0, n_dense, _replace(cfg, attn_mode="auto")),
                (n_dense, depth - n_dense, cfg)]
    else:
        segs = [(0, depth, cfg)]
    plan = []
    for s0, slen, bcfg in segs:
        k = max(1, round(n_chunks * slen / depth)) if depth else 1
        base, rem = slen // k, slen % k
        off = s0
        for i in range(k):
            ln = base + (1 if i < rem else 0)
            if ln:
                plan.append((off, ln, bcfg))
                off += ln
    return plan


def dit_forward_staged(
    params: Params,
    x: jnp.ndarray,
    t: jnp.ndarray,
    text_states: jnp.ndarray,
    text_mask: jnp.ndarray,
    text_states_2: jnp.ndarray,
    freqs_cos: jnp.ndarray,
    freqs_sin: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    cfg: DiTConfig = None,
    double_chunks: int = 2,
    single_chunks: int = 4,
    sync=None,
) -> jnp.ndarray:
    """dit_forward as `double_chunks + single_chunks + 3` separate on-device
    programs, numerics identical (see module comment above).

    params["double_blocks"] / ["single_blocks"] may be the usual stacked
    trees or pre-chunked LISTS of stacked trees (equal-shape list entries
    reuse one compiled program and skip the in-program slice copy; list
    form assumes a uniform attn config — no STA dense-head split).

    Inference-only: the chunk programs donate their carries, which breaks
    reverse-mode autodiff. `sync`, if given, is called with each program's
    first output after dispatch (e.g. a scalar readback) to serialize
    programs on runtimes where async dispatch overlaps program workspaces
    in HBM.
    """
    b, c, ot, oh, ow = x.shape
    pt, ph, pw = cfg.patch_size
    tt, th, tw = ot // pt, oh // ph, ow // pw
    img_len = tt * th * tw
    grid = (tt, th, tw)

    def _sync(a):
        if sync is not None:
            sync(a)

    pre = {k: params[k] for k in _PRE_KEYS if k in params}
    img, txt, vec, txt_bias, freqs_sgl = _staged_pre(
        pre, x, t, text_states, text_mask, text_states_2,
        freqs_cos, freqs_sin, guidance, cfg=cfg)
    _sync(img)
    txt_len = txt.shape[1]
    fc, fs = freqs_sgl if freqs_sgl is not None else (None, None)

    def plan_for(stack, n_chunks, n_dense):
        if isinstance(stack, (list, tuple)):
            # Pre-chunked list form. STA dense-anchor blocks are honored at
            # chunk granularity: entries fully inside [0, n_dense) run with
            # dense attention; the boundary must fall between entries.
            plan, off = [], 0
            dense = (n_dense > 0 and cfg.attn_mode.startswith("sta"))
            for s in stack:
                ln = jax.tree.leaves(s)[0].shape[0]
                if dense and off < n_dense:
                    if off + ln > n_dense:
                        raise ValueError(
                            f"STA dense-block boundary {n_dense} falls "
                            f"inside a pre-chunked stack entry "
                            f"[{off}, {off + ln}) — re-chunk so a chunk "
                            f"edge lands on the boundary")
                    from dataclasses import replace as _replace

                    plan.append((s, 0, ln, _replace(cfg, attn_mode="auto")))
                else:
                    plan.append((s, 0, ln, cfg))
                off += ln
            return plan
        return [(stack, s0, ln, bcfg)
                for (s0, ln, bcfg) in _chunk_plan(
                    jax.tree.leaves(stack)[0].shape[0], n_chunks,
                    n_dense, cfg)]

    for stk, s0, ln, bcfg in plan_for(params["double_blocks"], double_chunks,
                                      cfg.sta_dense_double_blocks):
        img, txt = _staged_double_chunk(
            stk, jnp.int32(s0), img, txt, vec, txt_bias, fc, fs,
            cfg=bcfg, length=ln, token_grid=grid)
        _sync(img)

    xx = _staged_concat(img, txt)
    for stk, s0, ln, bcfg in plan_for(params["single_blocks"], single_chunks,
                                      cfg.sta_dense_single_blocks):
        xx = _staged_single_chunk(
            stk, jnp.int32(s0), xx, vec, txt_bias, fc, fs,
            cfg=bcfg, length=ln, token_grid=grid, txt_len=txt_len)
        _sync(xx)

    out = _staged_final(params["final_layer"], xx, vec, cfg=cfg, grid=grid,
                        img_len=img_len)
    _sync(out)
    return out


def rechunk_stacked(stack: Params, n_chunks: int) -> list:
    """Split a stacked block tree into a list of n_chunks stacked trees
    (host-side, one device slice per chunk). Pre-chunking params for
    dit_forward_staged avoids the per-dispatch in-program slice copy —
    worth it when HBM headroom is thin (720p)."""
    depth = jax.tree.leaves(stack)[0].shape[0]
    plan = _chunk_plan(depth, n_chunks, 0, None)
    return [jax.tree.map(lambda a: a[s0:s0 + ln], stack)
            for (s0, ln, _) in plan]


# --------------------------------------------------------------------------
# Initialization
# --------------------------------------------------------------------------

def _lin_init(key, cin, cout, dtype, bias=True, zero=False, std=None):
    if zero:
        w = jnp.zeros((cin, cout), dtype)
    elif std is not None:
        w = std * jax.random.normal(key, (cin, cout), dtype)
    else:
        bound = 1.0 / np.sqrt(cin)
        w = jax.random.uniform(key, (cin, cout), dtype, -bound, bound)
    p = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _ts_embedder_init(key, hidden, dtype, freq=256):
    k1, k2 = jax.random.split(key)
    return {"mlp_0": _lin_init(k1, freq, hidden, dtype, std=0.02),
            "mlp_2": _lin_init(k2, hidden, hidden, dtype, std=0.02)}


def _double_block_init(key, cfg: DiTConfig, dtype):
    h, d, m = cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden_dim
    ks = iter(jax.random.split(key, 12))
    def norm_p():
        return {"scale": jnp.ones((d,), dtype)}
    return {
        "img_mod": _lin_init(next(ks), h, 6 * h, dtype, zero=True),
        "txt_mod": _lin_init(next(ks), h, 6 * h, dtype, zero=True),
        "img_attn_qkv": _lin_init(next(ks), h, 3 * h, dtype, bias=cfg.qkv_bias),
        "txt_attn_qkv": _lin_init(next(ks), h, 3 * h, dtype, bias=cfg.qkv_bias),
        "img_attn_q_norm": norm_p(), "img_attn_k_norm": norm_p(),
        "txt_attn_q_norm": norm_p(), "txt_attn_k_norm": norm_p(),
        "img_attn_proj": _lin_init(next(ks), h, h, dtype, bias=cfg.qkv_bias),
        "txt_attn_proj": _lin_init(next(ks), h, h, dtype, bias=cfg.qkv_bias),
        "img_mlp": {"fc1": _lin_init(next(ks), h, m, dtype),
                    "fc2": _lin_init(next(ks), m, h, dtype)},
        "txt_mlp": {"fc1": _lin_init(next(ks), h, m, dtype),
                    "fc2": _lin_init(next(ks), m, h, dtype)},
    }


def _single_block_init(key, cfg: DiTConfig, dtype):
    h, d, m = cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden_dim
    ks = iter(jax.random.split(key, 4))
    return {
        "linear1": _lin_init(next(ks), h, 3 * h + m, dtype),
        "linear2": _lin_init(next(ks), h + m, h, dtype),
        "q_norm": {"scale": jnp.ones((d,), dtype)},
        "k_norm": {"scale": jnp.ones((d,), dtype)},
        "modulation": _lin_init(next(ks), h, 3 * h, dtype, zero=True),
    }


def _refiner_init(key, cfg: DiTConfig, dtype, depth=2):
    h, td = cfg.hidden_size, cfg.text_states_dim
    m = int(h * 4.0)
    ks = iter(jax.random.split(key, 6 + depth * 6))
    blocks = []
    for _ in range(depth):
        blocks.append({
            "norm1": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "self_attn_qkv": _lin_init(next(ks), h, 3 * h, dtype),
            "self_attn_proj": _lin_init(next(ks), h, h, dtype),
            "norm2": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "mlp": {"fc1": _lin_init(next(ks), h, m, dtype),
                    "fc2": _lin_init(next(ks), m, h, dtype)},
            "adaLN_modulation": _lin_init(next(ks), h, 2 * h, dtype, zero=True),
        })
    return {
        "input_embedder": _lin_init(next(ks), td, h, dtype),
        "t_embedder": _ts_embedder_init(next(ks), h, dtype),
        "c_embedder": {"linear_1": _lin_init(next(ks), td, h, dtype),
                       "linear_2": _lin_init(next(ks), h, h, dtype)},
        "blocks": blocks,
    }


def init_dit_params(key, cfg: DiTConfig, dtype=jnp.float32) -> Params:
    h = cfg.hidden_size
    pt, ph, pw = cfg.patch_size
    ks = iter(jax.random.split(key, 8 + cfg.mm_double_blocks_depth
                               + cfg.mm_single_blocks_depth))
    params: Params = {
        "img_in": _lin_init(next(ks), cfg.in_channels * pt * ph * pw, h, dtype),
        "time_in": _ts_embedder_init(next(ks), h, dtype),
        "vector_in": {"in_layer": _lin_init(next(ks), cfg.text_states_dim_2, h, dtype),
                      "out_layer": _lin_init(next(ks), h, h, dtype)},
        "final_layer": {
            "linear": _lin_init(next(ks), h, pt * ph * pw * cfg.out_channels,
                                dtype, zero=True),
            "adaLN_modulation": _lin_init(next(ks), h, 2 * h, dtype, zero=True),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = _ts_embedder_init(next(ks), h, dtype)
    if cfg.text_projection == "single_refiner":
        params["txt_in"] = _refiner_init(next(ks), cfg, dtype)
    else:
        params["txt_in"] = {"linear_1": _lin_init(next(ks), cfg.text_states_dim, h, dtype),
                            "linear_2": _lin_init(next(ks), h, h, dtype)}

    dbl = [_double_block_init(next(ks), cfg, dtype)
           for _ in range(cfg.mm_double_blocks_depth)]
    sgl = [_single_block_init(next(ks), cfg, dtype)
           for _ in range(cfg.mm_single_blocks_depth)]
    params["double_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *dbl)
    params["single_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *sgl)
    return params


def params_count(params: Params) -> Dict[str, int]:
    """(reference: models.py:712-735)."""
    def count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    dbl = params["double_blocks"]
    counts = {
        "double": count({k: dbl[k] for k in
                         ("img_attn_qkv", "img_attn_proj", "img_mlp",
                          "txt_attn_qkv", "txt_attn_proj", "txt_mlp")}),
        "single": count({k: params["single_blocks"][k]
                         for k in ("linear1", "linear2")}),
        "total": count(params),
    }
    counts["attn+mlp"] = counts["double"] + counts["single"]
    return counts

"""Pallas W8A8 linear: fused per-token activation quant + s8 MXU matmul.

The XLA int8 path (models/dit._int8_linear_body) runs three serialized
full-tensor passes — quantize x (VPU), s8xs8->s32 dot (MXU), dequant
epilogue (VPU) — and at 720p token counts must additionally token-chunk
via lax.map to bound the s32/f32 temps, which serializes the units across
chunks too (measured 145 TOP/s at [118.8k, 3072]x[3072, 3072] vs the v5e
s8 peak of 394). This kernel fuses all three stages per grid tile so the
VPU quant/dequant of tile i overlaps the MXU dot of tile i-1, and no
full-size s32/f32 temp ever exists (peak extra HBM = the bf16 output).

Numerics are identical to the XLA path: symmetric per-token activation
scales (amax reduced in input dtype, f32 divide + round-to-nearest-even),
per-output-channel weight scales, exact s32 accumulation
(127^2 * 15360 < 2^31).

(reference: hyvideo/modules/fp8_optimization.py quantizes weights only and
dequantizes into bf16 matmuls; this int8 compute path is beyond-reference,
see PARITY.md "Beyond-reference additions".)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# epilogue activations fusable into the kernel (VPU math on the f32 tile
# before the bf16 store — saves one full HBM round trip over the [L, 4h]
# MLP hidden vs a separate elementwise pass); keys match models/dit.ACT
_EPILOGUE_ACTS = {
    None: lambda y: y,
    "gelu": lambda y: jax.nn.gelu(y, approximate=False),
    "gelu_tanh": lambda y: jax.nn.gelu(y, approximate=True),
    "relu": lambda y: jnp.maximum(y, 0.0),
    "silu": jax.nn.silu,
}


def _w8a8_kernel(x_ref, w_ref, so_ref, b_ref, o_ref, q_scr, sx_scr, *,
                 has_bias: bool, n_tiles_n: int, act: str | None):
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _quant():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x_ref[...]), axis=-1, keepdims=True
                       ).astype(jnp.float32)
        sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        q_scr[...] = jnp.round(xf / sx).astype(jnp.int8)
        sx_scr[...] = jnp.broadcast_to(sx, sx_scr.shape)

    acc = jax.lax.dot_general(
        q_scr[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx_scr[:, 0:1] * so_ref[0:1, :]
    if has_bias:
        y = y + b_ref[0:1, :]
    o_ref[...] = _EPILOGUE_ACTS[act](y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_l", "block_n",
                                             "interpret", "act"))
def _w8a8_call(x, w8, so, bias, block_l, block_n, interpret, act=None):
    l, h = x.shape
    n = w8.shape[1]
    grid = (l // block_l, n // block_n)
    has_bias = bias is not None
    so2 = jnp.broadcast_to(so.reshape(1, n).astype(jnp.float32), (8, n))
    args = [x, w8, so2]
    in_specs = [
        pl.BlockSpec((block_l, h), lambda li, ni: (li, 0)),
        pl.BlockSpec((h, block_n), lambda li, ni: (0, ni)),
        pl.BlockSpec((8, block_n), lambda li, ni: (0, ni)),
    ]
    if has_bias:
        args.append(jnp.broadcast_to(
            bias.reshape(1, n).astype(jnp.float32), (8, n)))
        in_specs.append(pl.BlockSpec((8, block_n), lambda li, ni: (0, ni)))
    else:
        args.append(jnp.zeros((8, 128), jnp.float32))
        in_specs.append(pl.BlockSpec((8, 128), lambda li, ni: (0, 0)))

    return pl.pallas_call(
        functools.partial(_w8a8_kernel, has_bias=has_bias,
                          n_tiles_n=grid[1], act=act),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_l, block_n), lambda li, ni: (li, ni)),
        out_shape=jax.ShapeDtypeStruct((l, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_l, h), jnp.int8),
                        pltpu.VMEM((block_l, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)


def int8_linear_pallas(p, x, block_l: int = 512, block_n: int = 1536,
                       act: str | None = None):
    """y = act(dequant(quant(x) @ w8)) for p = {'kernel': int8 [h, n],
    'scale_out': [..., 1, n] f32, 'bias'?: [n]}; x [..., L, h] bf16.
    `act` (a models/dit.ACT key or None) fuses into the store epilogue.

    Pads L up to block_l and slices back; h and n must be multiples of the
    lane tiling (128), which all DiT projections satisfy. Falls back to the
    XLA path off-TPU (interpret-mode Pallas would be slow in tests).
    """
    *lead, l, h = x.shape
    n = p["kernel"].shape[1]
    xf = x.reshape(-1, h)
    rows = xf.shape[0]
    block_n = min(block_n, n)
    while n % block_n:
        block_n //= 2
    block_l_eff = min(block_l, max(128, rows))
    pad = (-rows) % block_l_eff
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = _w8a8_call(xf, p["kernel"], p["scale_out"].reshape(n),
                     p.get("bias"), block_l_eff, block_n, interpret, act)
    if pad:
        out = out[:rows]
    return out.reshape(*lead, l, n)

"""Pallas TPU flash-attention backward pass (custom VJP support).

The reference relies on FlashAttention-2's CUDA backward for training-time
attention; this is its TPU analog so fine-tuning (training.py) scales to
full video token counts where materializing [Sq, Sk] probabilities is
impossible.

Standard flash backward decomposition with recomputed probabilities:
  P  = exp(S - lse)                        (lse saved by the forward)
  dV = P^T dO
  dP = dO V^T
  dS = P * (dP - delta),   delta = rowsum(dO * O)  (precomputed in XLA)
  dQ = dS K * scale
  dK = dS^T Q * scale
Two kernels: dq accumulates over k-blocks (q-major grid), dk/dv accumulate
over q-blocks (k-major grid). Head addressing uses the same zero-transpose
[B, S, H*D] column BlockSpecs as the forward kernel.

The forward additionally writes LSE as [B, H*8, Sq] fp32 (8 sublanes
replicated — TPU tiling requires the penultimate block dim to be a multiple
of 8; 8 lanes of redundancy costs ~50 MB at 67k tokens vs. an unusable
[B, H, Sq] layout).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# --------------------------------------------------------------------------
# forward with LSE output
# --------------------------------------------------------------------------

def _fwd_kernel(kb_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, nk: int,
                n_sub: int):
    """Forward with LSE. The k block is split into `n_sub` independent
    sub-tiles (QK^T / exp / P.V chains only meet at the running-stat
    update) so VPU softmax work overlaps the next sub-tile's MXU dots —
    see ops/flash_attention.py:_flash_kernel. Dots keep the model dtype
    (bf16 single-pass MXU, fp32 accumulate); P.V casts probs to v.dtype
    like the sdpa reference path."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    bk = k_ref.shape[1]
    sub = bk // n_sub
    ss = []
    for j in range(n_sub):
        sj = jax.lax.dot_general(
            q, k_ref[0, j * sub:(j + 1) * sub], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ss.append(sj + kb_ref[0, 0:1, j * sub:(j + 1) * sub])

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    s_max = ss[0].max(axis=-1, keepdims=True)
    for sj in ss[1:]:
        s_max = jnp.maximum(s_max, sj.max(axis=-1, keepdims=True))
    m_new = jnp.maximum(m_prev, s_max)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr
    pv = None
    for j, sj in enumerate(ss):
        p = jnp.exp(sj - m_new[:, :1])
        l_new = l_new + jnp.sum(p, axis=-1, keepdims=True)
        pvj = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, j * sub:(j + 1) * sub],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pv = pvj if pv is None else pv + pvj
    m_scr[...] = m_new
    l_scr[...] = l_new
    acc_scr[...] = acc_scr[...] * corr[:, :1] + pv

    @pl.when(ki == nk - 1)
    def _finish():
        l_fin = jnp.maximum(l_scr[...], 1e-37)
        o_ref[0] = (acc_scr[...] / l_fin[:, :1]).astype(o_ref.dtype)
        lse = m_scr[...] + jnp.log(l_fin)             # [bq, 128]
        lse_ref[0] = lse[:, :8].T                     # [8, bq] sublane-bcast


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "block_q", "block_k", "interpret"))
def _fwd_with_lse(q, k, v, kb, heads, scale, block_q, block_k, interpret):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    nq, nk = sq // block_q, sk // block_k
    grid = (b, heads, nq, nk)
    n_sub = 2 if block_k % 256 == 0 else 1
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk, n_sub=n_sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, 8, block_q), lambda bi, hi, qi, ki: (bi, hi, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, heads * 8, sq), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32),
                        pltpu.VMEM((block_q, 128), jnp.float32),
                        pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kb, q, k, v)
    return out, lse


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------

def _bwd_dq_kernel(kb_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_scr, *, scale: float, nk: int):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k = k_ref[0]
    s = jax.lax.dot_general(q_ref[0], k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + kb_ref[0, 0:1, :]
    lse = lse_ref[0, 0:1, :].T                       # [bq, 1]
    p = jnp.exp(s - lse)                             # [bq, bk]
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = delta_ref[0, 0:1, :].T                   # [bq, 1]
    ds = p * (dp - delta)
    acc_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = (acc_scr[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(kb_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float, nq: int):
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    do = do_ref[0]                                   # [bq, d]
    # s^T layout: [bk, bq]
    st = jax.lax.dot_general(k_ref[0], q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    st = st + kb_ref[0, 0:1, :].T                    # bias per k row
    lse = lse_ref[0, 0:1, :]                         # [1, bq]
    pt = jnp.exp(st - lse)                           # [bk, bq]
    dv_scr[...] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(v_ref[0], do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [bk, bq]
    delta = delta_ref[0, 0:1, :]                     # [1, bq]
    dst = pt * (dpt - delta)
    dk_scr[...] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "block_q", "block_k", "interpret"))
def _bwd(q, k, v, kb, do, lse, delta, heads, scale, block_q, block_k,
         interpret):
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    nq, nk = sq // block_q, sk // block_k

    kb_spec = pl.BlockSpec((1, 8, block_k), lambda bi, hi, qi, ki: (bi, 0, ki))
    qs = pl.BlockSpec((1, block_q, d), lambda bi, hi, qi, ki: (bi, qi, hi))
    ks = pl.BlockSpec((1, block_k, d), lambda bi, hi, qi, ki: (bi, ki, hi))
    lse_spec = pl.BlockSpec((1, 8, block_q),
                            lambda bi, hi, qi, ki: (bi, hi, qi))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(b, heads, nq, nk),
        in_specs=[kb_spec, qs, ks, ks, qs, lse_spec, lse_spec],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bi, hi, qi, ki: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kb, q, k, v, do, lse, delta)

    kb_spec2 = pl.BlockSpec((1, 8, block_k),
                            lambda bi, hi, ki, qi: (bi, 0, ki))
    qs2 = pl.BlockSpec((1, block_q, d), lambda bi, hi, ki, qi: (bi, qi, hi))
    ks2 = pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi))
    lse_spec2 = pl.BlockSpec((1, 8, block_q),
                             lambda bi, hi, ki, qi: (bi, hi, qi))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(b, heads, nk, nq),
        in_specs=[kb_spec2, qs2, ks2, ks2, qs2, lse_spec2, lse_spec2],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi)),
            pl.BlockSpec((1, block_k, d), lambda bi, hi, ki, qi: (bi, ki, hi)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, sk, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, sk, hd), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kb, q, k, v, do, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------------------
# public differentiable API
# --------------------------------------------------------------------------

def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _prep(q, k, v, key_bias, block_q, block_k):
    b, sq, hh, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_p, sk_p = _round_up(sq, block_q), _round_up(sk, block_k)
    qp = q.reshape(b, sq, hh * d)
    kp = k.reshape(b, sk, hh * d)
    vp = v.reshape(b, sk, hh * d)
    if sq_p != sq:
        qp = jnp.pad(qp, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        kp = jnp.pad(kp, ((0, 0), (0, sk_p - sk), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, sk_p - sk), (0, 0)))
    kb = (key_bias.reshape(b, sk).astype(jnp.float32)
          if key_bias is not None else jnp.zeros((b, sk), jnp.float32))
    if sk_p != sk:
        kb = jnp.pad(kb, ((0, 0), (0, sk_p - sk)), constant_values=NEG_INF)
    kb = jnp.broadcast_to(kb[:, None, :], (b, 8, sk_p))
    return qp, kp, vp, kb, block_q, block_k, sq_p, sk_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_vjp(q, k, v, key_bias, score_bound=None, scale=None,
                        block_q=1024, block_k=2048, bound_mode="auto"):
    """Differentiable flash attention; q/k/v [B, S, H, D] -> [B, Sq, H*D].

    The primal (inference) path runs the LSE-free kernel — writing the
    [B, H*8, Sq] LSE costs ~7% at 67k tokens; `jax.custom_vjp` only invokes
    `_fwd_rule` (which saves LSE) under differentiation, so training pays
    for the residual and inference does not. Identical forward numerics.

    bound_mode: static kernel choice for the primal (see
    flash_attention); the LSE-saving training forward always uses the
    running-max kernel and is unaffected."""
    from .flash_attention import flash_attention

    return flash_attention(q, k, v, key_bias, scale, block_q, block_k,
                           bound_mode, score_bound)


def _fwd_rule(q, k, v, key_bias, score_bound, scale, block_q, block_k,
              bound_mode):
    b, sq, hh, d = q.shape
    sc = scale if scale is not None else d ** -0.5
    interpret = jax.default_backend() != "tpu"
    qp, kp, vp, kb, bq, bk, sq_p, sk_p = _prep(q, k, v, key_bias,
                                               block_q, block_k)
    out_p, lse = _fwd_with_lse(qp, kp, vp, kb, hh, float(sc), bq, bk,
                               interpret)
    out = out_p[:, :sq]
    res = (q, k, v, key_bias, out, lse)
    return out, res


def _bwd_rule(scale, block_q, block_k, bound_mode, res, g):
    q, k, v, key_bias, out, lse = res
    b, sq, hh, d = q.shape
    sk = k.shape[1]
    sc = scale if scale is not None else d ** -0.5
    interpret = jax.default_backend() != "tpu"
    # the backward kernels do 5 dots per tile (lower VPU fraction), where a
    # 1024 k-block measures faster than the forward's sub-tiled 2048
    qp, kp, vp, kb, bq, bk, sq_p, sk_p = _prep(q, k, v, key_bias,
                                               block_q, min(block_k, 1024))
    gp = g.reshape(b, sq, hh * d)
    if sq_p != sq:
        gp = jnp.pad(gp, ((0, 0), (0, sq_p - sq), (0, 0)))
        outp = jnp.pad(out.reshape(b, sq, hh * d),
                       ((0, 0), (0, sq_p - sq), (0, 0)))
    else:
        outp = out.reshape(b, sq, hh * d)
    # delta_i = rowsum(dO_i * O_i), per head -> [B, H*8, Sq] like lse
    do_h = gp.reshape(b, sq_p, hh, d).astype(jnp.float32)
    o_h = outp.reshape(b, sq_p, hh, d).astype(jnp.float32)
    delta = jnp.sum(do_h * o_h, axis=-1)             # [B, Sq, H]
    delta = jnp.moveaxis(delta, 1, 2)                # [B, H, Sq]
    delta = jnp.repeat(delta, 8, axis=1)             # [B, H*8, Sq]

    dq, dk, dv = _bwd(qp, kp, vp, kb, gp, lse, delta, hh, float(sc), bq, bk,
                      interpret)
    dq = dq[:, :sq].reshape(b, sq, hh, d).astype(q.dtype)
    dk = dk[:, :sk].reshape(b, sk, hh, d).astype(k.dtype)
    dv = dv[:, :sk].reshape(b, sk, hh, d).astype(v.dtype)
    return dq, dk, dv, None, None


flash_attention_vjp.defvjp(_fwd_rule, _bwd_rule)

"""Attention ops: XLA reference paths + mask construction.

Replaces the reference's FlashAttention-2 varlen packing
(reference: hyvideo/modules/attenion.py:34-156) with TPU-idiomatic static
shapes + masking:

* The reference packs [img_tokens, valid_text, padding] into varlen sequences
  so padding tokens attend only among themselves. Because (a) padding KEYS are
  masked out for valid queries in every layer, and (b) only img/text token
  outputs that are themselves valid ever reach the final layer, the values at
  padding positions can never influence valid outputs. We therefore use a
  *key-padding bias* only — numerically identical on every valid position and
  O(L) instead of O(L^2) memory.

* `sdpa_attention` is the plain XLA path (small sequences: token refiner, VAE
  tiles, CPU tests). `chunked_attention` is an online-softmax flash-style scan
  used as the large-sequence fallback wherever the Pallas kernel is not
  available (CPU). The Pallas TPU kernel lives in ops/flash_attention.py.

Layout convention matches the reference pre-dispatch layout: [B, S, H, D]
(seq-second). Outputs are [B, S, H*D].
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def padding_key_bias(text_mask: jnp.ndarray, img_len: int) -> jnp.ndarray:
    """Additive key bias [B, 1, 1, img_len + text_len] from text mask.

    text_mask: [B, text_len], 1 for valid prompt tokens. All img tokens are
    valid. Invalid keys receive NEG_INF.
    """
    b = text_mask.shape[0]
    img_valid = jnp.ones((b, img_len), dtype=jnp.bool_)
    valid = jnp.concatenate([img_valid, text_mask.astype(jnp.bool_)], axis=1)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    return bias[:, None, None, :]


def sdpa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention; q/k/v [B, S, H, D] -> [B, Sq, H*D].

    Softmax in fp32 (the reference's SDPA upcasts likewise).
    """
    b, sq, h, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    qf = jnp.einsum("bqhd->bhqd", q).astype(jnp.float32)
    kf = jnp.einsum("bkhd->bhkd", k).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf * scale, kf)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.reshape(b, sq, h * d)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int):
    s = x.shape[axis]
    pad = (-s) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_bias: Optional[jnp.ndarray] = None,
    block_bias_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
    scale: Optional[float] = None,
    q_chunk: int = 1024,
    k_chunk: int = 1024,
) -> jnp.ndarray:
    """Online-softmax attention over key chunks; O(Sq·k_chunk) live memory.

    key_bias: [B, 1, 1, Sk] additive bias (key padding).
    block_bias_fn(q_idx, k_idx): optional fn from absolute query/key index
    vectors to an additive [q_chunk, k_chunk] bias block (e.g. frame-causal).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d ** -0.5

    q_p, q_pad = _pad_to(q, 1, q_chunk)
    k_p, k_pad = _pad_to(k, 1, k_chunk)
    v_p, _ = _pad_to(v, 1, k_chunk)
    sq_p, sk_p = q_p.shape[1], k_p.shape[1]

    # Fold key padding-from-chunking into the key bias.
    kb = jnp.zeros((1, 1, 1, sk_p), jnp.float32)
    if key_bias is not None:
        kb = jnp.pad(key_bias.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, 0), (0, sk_p - sk)),
                     constant_values=NEG_INF)
    elif k_pad:
        kb = kb.at[..., sk:].set(NEG_INF)
    kb = jnp.broadcast_to(kb, (q.shape[0], 1, 1, sk_p))

    nq = sq_p // q_chunk
    nk = sk_p // k_chunk

    qc = q_p.reshape(b, nq, q_chunk, h, d)
    kc = k_p.reshape(b, nk, k_chunk, h, d)
    vc = v_p.reshape(b, nk, k_chunk, h, d)
    kbc = kb.reshape(b, 1, 1, nk, k_chunk)

    def q_block(carry_qi):
        qi, q_blk, kb_all = carry_qi
        # q_blk: [B, q_chunk, H, D]
        qf = jnp.einsum("bqhd->bhqd", q_blk).astype(jnp.float32) * scale

        def k_step(carry, inputs):
            m, l, acc = carry
            ki, k_blk, v_blk, kb_blk = inputs
            kf = jnp.einsum("bkhd->bhkd", k_blk).astype(jnp.float32)
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
            s = s + kb_blk[:, :, :, :]  # [B,1,1,k_chunk] broadcast
            if block_bias_fn is not None:
                q_idx = qi * q_chunk + lax.broadcasted_iota(jnp.int32, (q_chunk, 1), 0)
                k_idx = ki * k_chunk + lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)
                s = s + block_bias_fn(q_idx, k_idx)[None, None]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32))
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((b, h, q_chunk), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, q_chunk), jnp.float32)
        a0 = jnp.zeros((b, h, q_chunk, d), jnp.float32)
        ks = (jnp.arange(nk),
              jnp.moveaxis(kc, 1, 0), jnp.moveaxis(vc, 1, 0),
              jnp.moveaxis(kbc, 3, 0))
        (m, l, acc), _ = lax.scan(k_step, (m0, l0, a0), ks)
        out = acc / jnp.maximum(l, 1e-37)[..., None]
        return jnp.einsum("bhqd->bqhd", out)  # [B, q_chunk, H, D]

    outs = lax.map(
        lambda i: q_block((i, lax.dynamic_index_in_dim(qc, i, 1, keepdims=False), kb)),
        jnp.arange(nq))
    out = jnp.moveaxis(outs, 0, 1).reshape(b, sq_p, h, d)[:, :sq]
    return out.astype(v.dtype).reshape(b, sq, h * d)


def frame_causal_block_bias(n_hw: int) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Bias fn for the VAE mid-block: token i may attend token j iff
    frame(j) <= frame(i) (reference: unet_causal_3d_blocks.py:38-46)."""

    def fn(q_idx: jnp.ndarray, k_idx: jnp.ndarray) -> jnp.ndarray:
        q_frame = q_idx // n_hw
        k_frame = k_idx // n_hw
        return jnp.where(k_frame <= q_frame, 0.0, NEG_INF).astype(jnp.float32)

    return fn


def text_key_bias(text_mask: jnp.ndarray) -> jnp.ndarray:
    """Additive key bias [B, 1, 1, text_len] over text keys only."""
    valid = text_mask.astype(jnp.bool_)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    return bias[:, None, None, :]


def joint_attention(
    img_q: jnp.ndarray,  # [B, S_img(_loc), H, D]
    img_k: jnp.ndarray,
    img_v: jnp.ndarray,
    txt_q: jnp.ndarray,  # [B, L_txt, H, D]
    txt_k: jnp.ndarray,
    txt_v: jnp.ndarray,
    txt_bias: Optional[jnp.ndarray],  # [B, 1, 1, L_txt]
    mode: str = "auto",
    ulysses_axis: Optional[str] = None,
    ring_axis: Optional[str] = None,
    scale: Optional[float] = None,
    token_grid=None,
    sta_tile=(4, 8, 8),
    sta_window=(3, 3, 3),
    bound_mode: str = "auto",
    score_bound: Optional[jnp.ndarray] = None,
    flash_ring_kernel: bool = True,
):
    """Joint attention over [img | txt] tokens; returns (img_out, txt_out)
    each [B, S, H*D].

    mode="sta" uses Sliding Tile Attention (ops/sta.py) for the img queries
    — requires `token_grid` = the (T, H, W) patch-grid sizes.

    Single-device: concatenates and dispatches to `attention`. With axis
    names (inside shard_map): Ulysses x ring sequence parallelism — the
    TPU-native analog of the reference's parallel_attention
    (reference: hyvideo/modules/attenion.py:159-212).
    """
    if mode in ("sta", "sta_int8"):
        if token_grid is None:
            raise ValueError("attn_mode='sta' requires token_grid")
        # ring_axis: handled by usp_joint_attention via t-slab halo
        # exchange (parallel/sp_attention._ring_sta_halo); geometry is
        # validated by check_sp_compat at pipeline construction.
        if not ulysses_axis and not ring_axis:
            # "sta_int8" = STA with in-kernel int8 QK^T; needs the static
            # score bound, which _bound_mode grants whenever QK-norm is on.
            # The trainable wrapper keeps the kernel forward and adds a
            # sparse gathered-form backward (custom VJP), so fine-tuning
            # with attn_mode="sta" inherits the >10x attention FLOP cut.
            from .sta import sta_joint_attention_trainable

            return sta_joint_attention_trainable(
                img_q, img_k, img_v, txt_q, txt_k, txt_v, txt_bias,
                grid=tuple(token_grid), tile=tuple(sta_tile),
                window=tuple(sta_window), scale=scale, bound_mode=bound_mode,
                qk_int8=(mode == "sta_int8"), score_bound=score_bound)
        # STA under pure Ulysses: fall through to usp_joint_attention,
        # which runs the same STA kernel per device after the head-scatter
        # gathers the full sequence (token_grid = the GLOBAL patch grid).
    if ulysses_axis or ring_axis:
        from ..parallel.sp_attention import usp_joint_attention

        return usp_joint_attention(
            img_q, img_k, img_v, txt_q, txt_k, txt_v, txt_bias,
            ulysses_axis=ulysses_axis, ring_axis=ring_axis, scale=scale,
            attn_mode=mode, bound_mode=bound_mode, score_bound=score_bound,
            token_grid=token_grid, sta_tile=sta_tile, sta_window=sta_window,
            flash_ring_kernel=flash_ring_kernel)
    img_len = img_q.shape[1]
    q = jnp.concatenate([img_q, txt_q], axis=1)
    k = jnp.concatenate([img_k, txt_k], axis=1)
    v = jnp.concatenate([img_v, txt_v], axis=1)
    if txt_bias is not None:
        b = txt_bias.shape[0]
        key_bias = jnp.concatenate(
            [jnp.zeros((b, 1, 1, img_len), jnp.float32),
             txt_bias.astype(jnp.float32)], axis=-1)
    else:
        key_bias = None
    out = attention(q, k, v, mode=mode, key_bias=key_bias, scale=scale,
                    bound_mode=bound_mode, score_bound=score_bound)
    return out[:, :img_len], out[:, img_len:]


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: str = "auto",
    bias: Optional[jnp.ndarray] = None,
    key_bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    bound_mode: str = "auto",
    score_bound: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch: 'sdpa' (full-matrix), 'chunked' (online softmax), 'flash'
    (Pallas TPU kernel), or 'auto' (pick by sequence length / backend).

    bound_mode: static softmax-kernel choice for the flash path (see
    ops/flash_attention.flash_attention) — "static" halves Pallas compile
    work when QK-norm bounds the scores."""
    if mode == "auto":
        on_tpu = jax.default_backend() == "tpu"
        if q.shape[1] >= 4096 and on_tpu:
            mode = "flash"
        elif q.shape[1] >= 8192:
            mode = "chunked"
        else:
            mode = "sdpa"
    if mode == "sdpa":
        if bias is None and key_bias is not None:
            bias = key_bias
        return sdpa_attention(q, k, v, bias=bias, scale=scale)
    if mode == "chunked":
        return chunked_attention(q, k, v, key_bias=key_bias, scale=scale)
    if mode == "flash":
        # custom-VJP variant: identical forward numerics, Pallas backward
        # (ops/flash_backward.py) so training works through the same path
        from .flash_backward import flash_attention_vjp

        # custom_vjp functions take positional args only
        return flash_attention_vjp(q, k, v, key_bias, score_bound, scale,
                                   1024, 2048, bound_mode)
    if mode == "flash_int8":
        # int8-QK SageAttention-style kernel (inference only: no VJP).
        # bound_mode "static" (QK-norm models) also drops the running max,
        # letting the 2x s8 MXU rate show (see _flash_int8_nomax_kernel);
        # "auto" has no traced dispatch here — it means the safe running-max.
        from .flash_attention import flash_attention_int8

        return flash_attention_int8(
            q, k, v, key_bias=key_bias, scale=scale,
            bound_mode="static" if bound_mode == "static" else "running",
            score_bound=score_bound)
    raise NotImplementedError(f"Unsupported attention mode: {mode}")

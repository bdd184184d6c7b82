"""Sequence-parallel joint img+txt attention: Ulysses x ring over ICI.

First-party TPU replacement for xfuser's `xFuserLongContextAttention`
(reference: hyvideo/modules/attenion.py:159-212, hyvideo/inference.py:80-83):

* **Ulysses**: `lax.all_to_all` reshards img q/k/v from sequence-sharded
  [B, S/sp, H, D] to head-sharded [B, S/r, H/u, D] (head scatter / seq
  gather), runs attention locally, and reshards back. The NCCL all-to-all
  becomes one ICI collective each way.
* **Ring**: K/V img chunks rotate around the `ring` axis via `lax.ppermute`;
  each hop folds one chunk into a running online-softmax state (m, l, acc) —
  the flash recurrence distributed across chips.
* **Joint text, "rear" strategy**: text tokens are replicated. Each device
  slices its local heads of the text K/V and folds them into the softmax
  state exactly once, so text participates in every ring step's normalizer —
  semantics identical to xfuser's joint_tensor_key/value with
  joint_strategy="rear" (attenion.py:185-207). Text-query outputs are
  computed redundantly per ring rank (replicated, like the reference) and
  head-gathered across the ulysses axis.

All functions here are called INSIDE `shard_map` (they use axis names).
Online-softmax merging is order-invariant, so ring rotation order does not
affect results beyond fp round-off.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _partial_attn_block(q, k, v, bias, state, scale):
    m, l, acc = state
    qf = jnp.einsum("bqhd->bhqd", q).astype(jnp.float32) * scale
    kf = jnp.einsum("bkhd->bhkd", k).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1)
    acc_new = acc * corr[..., None] + jnp.einsum(
        "bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return m_new, l_new, acc_new


def _partial_attn(q, k, v, bias, state, scale, k_chunk: int = 2048):
    """Fold one K/V chunk into the online-softmax state.

    q: [B, Sq, Hl, D]; k/v: [B, Sk, Hl, D]; bias: [B, 1, 1, Sk] or None.
    state (m, l, acc): [B, Hl, Sq], [B, Hl, Sq], [B, Hl, Sq, D], fp32.

    Large Sk is folded in sub-chunks via lax.scan so the fp32 score block
    never exceeds [B, Hl, Sq, k_chunk] — at 720p ring shards the full block
    would be several GB.
    """
    sk = k.shape[1]
    if sk <= k_chunk:
        return _partial_attn_block(q, k, v, bias, state, scale)
    pad = (-sk) % k_chunk
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        pad_bias = jnp.zeros((k.shape[0], 1, 1, sk + pad), jnp.float32)
        pad_bias = pad_bias.at[..., sk:].set(NEG_INF)
        bias = pad_bias if bias is None else (
            jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, 0), (0, 0),
                                               (0, pad)),
                    constant_values=NEG_INF))
    elif bias is None:
        bias = jnp.zeros((k.shape[0], 1, 1, k.shape[1]), jnp.float32)
    b, skp, hl, d = k.shape
    nc = skp // k_chunk
    kc = jnp.moveaxis(k.reshape(b, nc, k_chunk, hl, d), 1, 0)
    vc = jnp.moveaxis(v.reshape(b, nc, k_chunk, hl, d), 1, 0)
    bc = jnp.moveaxis(bias.reshape(b, 1, 1, nc, k_chunk), 3, 0)

    def fold(st, inputs):
        kb, vb, bb = inputs
        return _partial_attn_block(q, kb, vb, bb, st, scale), None

    state, _ = lax.scan(fold, state, (kc, vc, bc))
    return state


def _init_state(b, h, sq, d):
    return (jnp.full((b, h, sq), NEG_INF, jnp.float32),
            jnp.zeros((b, h, sq), jnp.float32),
            jnp.zeros((b, h, sq, d), jnp.float32))


def _finish(state, dtype):
    m, l, acc = state
    out = acc / jnp.maximum(l, 1e-37)[..., None]
    return jnp.einsum("bhqd->bqhd", out).astype(dtype)


def _ring_sta_halo(img_q, img_k, img_v, txt_q_l, txt_k_l, txt_v_l,
                   txt_bias, *, ring_axis, scale, attn_mode, token_grid,
                   sta_tile, sta_window, bound_mode):
    """Sliding Tile Attention across ring shards via t-slab HALO exchange.

    Each ring rank holds a contiguous global t-slab of tokens (ring-major
    SP_AXES + Ulysses gather). A q tile's window reaches at most wt//2
    tile-slabs beyond the local range, so ONE `lax.ppermute` each way of
    the boundary (wt//2)*tt t-planes of q/k/v builds an extended slab on
    which the single-device STA dispatch computes every LOCAL query's
    full window exactly — no per-hop rotation, no softmax-state merging
    for img queries at all. The cyclic-wrap halo segments received by the
    global-edge ranks are invalidated with `img_key_bias` (NEG_INF),
    which reproduces the global window clipping exactly; halo-query
    outputs are computed locally and discarded (2*(wt//2)/gt_local
    overhead). Txt queries need GLOBAL img keys: each rank emits a
    partial flash softmax state over its LOCAL (halo-free) keys, the r
    states all-gather over the ring and merge, and the replicated
    txt-key state folds once (xfuser "rear" semantics; reference:
    hyvideo/modules/attenion.py:159-212 — which supports none of this
    for sparse attention).

    Inference path (the STA kernel dispatch has no VJP here; training
    with sta x ring is rejected upstream). Returns local-heads
    (img_out [B, S_loc, hl*d], txt_out [B, Lt, hl*d])."""
    from ..ops.flash_attention import flash_attention, merge_flash_states
    from ..ops.sta import sta_joint_attention

    b, s_loc, hl, d = img_q.shape
    r = lax.axis_size(ring_axis)
    ridx = lax.axis_index(ring_axis)
    t, hh, ww_ = token_grid
    tt = sta_tile[0]
    wt = sta_window[0]
    t_loc = t // r
    halo_p = (wt // 2) * tt            # t-planes of halo per side
    halo_s = halo_p * hh * ww_         # tokens per halo
    up = [(i, (i + 1) % r) for i in range(r)]
    down = [(i, (i - 1) % r) for i in range(r)]

    def ext(x):
        if halo_p == 0:
            return x
        prev = lax.ppermute(x[:, -halo_s:], ring_axis, up)
        nxt = lax.ppermute(x[:, :halo_s], ring_axis, down)
        return jnp.concatenate([prev, x, nxt], axis=1)

    q_e, k_e, v_e = ext(img_q), ext(img_k), ext(img_v)
    grid_ext = (t_loc + 2 * halo_p, hh, ww_)
    kb = None
    if halo_p:
        ones = jnp.ones((b, halo_s), jnp.float32)
        kb = jnp.concatenate(
            [ones * jnp.where(ridx == 0, NEG_INF, 0.0),
             jnp.zeros((b, s_loc), jnp.float32),
             ones * jnp.where(ridx == r - 1, NEG_INF, 0.0)], axis=1)

    img_out_e, _ = sta_joint_attention(
        q_e, k_e, v_e, txt_q_l, txt_k_l, txt_v_l, txt_bias,
        grid=grid_ext, tile=tuple(sta_tile), window=tuple(sta_window),
        scale=scale, bound_mode=bound_mode,
        qk_int8=attn_mode.endswith("int8"), img_key_bias=kb)
    img_out = img_out_e[:, halo_s:halo_s + s_loc]

    # txt queries over the GLOBAL img keys: local partial states merged
    # across the ring, txt-key state folded exactly once
    st_loc = flash_attention(txt_q_l, img_k, img_v, scale=scale,
                             return_state=True)
    o_g, m_g, l_g = jax.tree.map(
        lambda x: lax.all_gather(x, ring_axis), st_loc)
    st = (o_g[0], m_g[0], l_g[0])
    for i in range(1, r):
        st = merge_flash_states(st, (o_g[i], m_g[i], l_g[i]))
    st_txt = flash_attention(txt_q_l, txt_k_l, txt_v_l, key_bias=txt_bias,
                             scale=scale, return_state=True)
    txt_out, _, _ = merge_flash_states(st, st_txt)
    return (img_out.astype(img_q.dtype),
            txt_out.astype(img_q.dtype).reshape(b, -1, hl * d))


def usp_joint_attention(
    img_q: jnp.ndarray,  # [B, S_loc, H, D] sequence-sharded over (u, r)
    img_k: jnp.ndarray,
    img_v: jnp.ndarray,
    txt_q: jnp.ndarray,  # [B, Lt, H, D] replicated
    txt_k: jnp.ndarray,
    txt_v: jnp.ndarray,
    txt_bias: Optional[jnp.ndarray],  # [B, 1, 1, Lt] key-padding bias
    ulysses_axis: Optional[str] = None,
    ring_axis: Optional[str] = None,
    scale: Optional[float] = None,
    attn_mode: str = "auto",
    bound_mode: str = "auto",
    score_bound: Optional[jnp.ndarray] = None,
    token_grid: Optional[Tuple[int, int, int]] = None,
    sta_tile: Tuple[int, int, int] = (4, 8, 8),
    sta_window: Tuple[int, int, int] = (3, 3, 3),
    flash_ring_kernel: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (img_out [B, S_loc, H*D] seq-sharded, txt_out [B, Lt, H*D]
    replicated). Must run inside shard_map with the given axis names.

    attn_mode reaches the local kernel only on the pure-Ulysses path
    (ring_degree == 1) — including "flash_int8" (int8-QK) and "sta"/
    "sta_int8" (Sliding Tile Attention: after the head-scatter all_to_all
    each device holds the FULL img sequence for its head group, in global
    (t, h, w) order when token shards are contiguous ranges — see
    parallel/sp_dit.py — so the single-device STA kernel applies per
    device unchanged; `token_grid` is the GLOBAL patch grid). With ring > 1
    the streaming ring recurrence below runs in bf16/fp32 regardless, and
    STA raises (tile neighborhoods span the rotating K/V shards)."""
    b, _, h, d = img_q.shape
    lt = txt_q.shape[1]
    scale = scale if scale is not None else d ** -0.5
    u = lax.axis_size(ulysses_axis) if ulysses_axis else 1
    r = lax.axis_size(ring_axis) if ring_axis else 1

    # ---- Ulysses head-scatter / seq-gather ----
    if u > 1:
        a2a = partial(lax.all_to_all, axis_name=ulysses_axis,
                      split_axis=2, concat_axis=1, tiled=True)
        img_q, img_k, img_v = a2a(img_q), a2a(img_k), a2a(img_v)
        uidx = lax.axis_index(ulysses_axis)
        hl = h // u
        sl = lambda x: lax.dynamic_slice_in_dim(x, uidx * hl, hl, axis=2)
        txt_q_l, txt_k_l, txt_v_l = sl(txt_q), sl(txt_k), sl(txt_v)
    else:
        hl = h
        txt_q_l, txt_k_l, txt_v_l = txt_q, txt_k, txt_v

    s_r = img_q.shape[1]  # img seq per ring rank

    if r == 1:
        # Pure-Ulysses fast path (the production v5e-8 config): each device
        # holds the FULL sequence for its local heads — run the single-
        # device flash/SDPA/STA kernel directly instead of the streaming
        # recurrence.
        from ..ops.attention import joint_attention

        if attn_mode.startswith("sta"):
            if token_grid is None:
                raise ValueError("attn_mode='sta' under Ulysses requires "
                                 "the global token_grid")
            import numpy as _np

            if int(_np.prod(token_grid)) != s_r:
                raise ValueError(
                    f"gathered sequence length {s_r} != prod(token_grid "
                    f"{tuple(token_grid)}) — pass the GLOBAL patch grid")
        img_out, txt_out = joint_attention(
            img_q, img_k, img_v, txt_q_l, txt_k_l, txt_v_l, txt_bias,
            mode=attn_mode, scale=scale, bound_mode=bound_mode,
            score_bound=score_bound, token_grid=token_grid,
            sta_tile=sta_tile, sta_window=sta_window)
        if u > 1:
            img_out = img_out.reshape(b, s_r, hl, d)
            img_out = lax.all_to_all(img_out, axis_name=ulysses_axis,
                                     split_axis=1, concat_axis=2, tiled=True)
            img_out = img_out.reshape(b, img_out.shape[1], h * d)
            txt_out = txt_out.reshape(b, lt, hl, d)
            txt_out = lax.all_gather(txt_out, ulysses_axis, axis=2,
                                     tiled=True).reshape(b, lt, h * d)
        return img_out, txt_out

    if attn_mode.startswith("sta"):
        # ring x STA via t-slab halo exchange (beyond-reference: xfuser's
        # USP is dense-only). Requires the ring-major token sharding
        # (parallel/mesh.SP_AXES) so this rank's gathered tokens are one
        # contiguous global t-slab; geometry is validated upstream by
        # check_sp_compat.
        img_out, txt_out = _ring_sta_halo(
            img_q, img_k, img_v, txt_q_l, txt_k_l, txt_v_l, txt_bias,
            ring_axis=ring_axis, scale=scale, attn_mode=attn_mode,
            token_grid=token_grid, sta_tile=sta_tile, sta_window=sta_window,
            bound_mode=bound_mode)
        if u > 1:
            img_out = img_out.reshape(b, s_r, hl, d)
            img_out = lax.all_to_all(img_out, axis_name=ulysses_axis,
                                     split_axis=1, concat_axis=2, tiled=True)
            img_out = img_out.reshape(b, img_out.shape[1], h * d)
            txt_out = txt_out.reshape(b, lt, hl, d)
            txt_out = lax.all_gather(txt_out, ulysses_axis, axis=2,
                                     tiled=True).reshape(b, lt, h * d)
        return img_out, txt_out

    q = jnp.concatenate([img_q, txt_q_l], axis=1)  # [B, s_r + Lt, hl, D]
    sq = s_r + lt

    if attn_mode == "flash" and flash_ring_kernel:
        # Ring hops through the Pallas flash kernel: each hop runs the
        # 85%-of-peak kernel over its K/V shard with `return_state`, and
        # the (out, m, l) partial-softmax states merge pairwise
        # (ops/flash_attention.py:merge_flash_states). Hop 0 folds the
        # local img shard AND the replicated text keys (with the padding
        # bias) in one kernel call; hops 1..r-1 rotate img K/V only.
        # In the static-offset regime (qk_norm) the hops go through
        # `flash_attention_state` — a custom-VJP wrapper, so this path
        # also DIFFERENTIATES (kernel forward, chunked-XLA transpose).
        # Running-max/auto configs use the raw kernel (no JVP rule);
        # training those sets flash_ring_kernel=False and grads flow
        # through the einsum recurrence below.
        from ..ops.flash_attention import (flash_attention,
                                           flash_attention_state,
                                           merge_flash_states)

        if bound_mode == "static":
            flash_state = partial(flash_attention_state, scale=scale,
                                  score_bound=score_bound)
        else:
            flash_state = partial(flash_attention, scale=scale,
                                  bound_mode=bound_mode,
                                  score_bound=score_bound,
                                  return_state=True)

        kb0 = jnp.zeros((b, 1, 1, s_r), jnp.float32)
        if txt_bias is not None:
            kb0 = jnp.concatenate(
                [kb0, txt_bias.astype(jnp.float32)], axis=-1)
        else:
            kb0 = jnp.concatenate(
                [kb0, jnp.zeros((b, 1, 1, lt), jnp.float32)], axis=-1)
        k0 = jnp.concatenate([img_k, txt_k_l], axis=1)
        v0 = jnp.concatenate([img_v, txt_v_l], axis=1)
        state = flash_state(q, k0, v0, kb0)
        perm = [(i, (i + 1) % r) for i in range(r)]

        def ring_step(carry, _):
            st, k_blk, v_blk = carry
            k_blk = lax.ppermute(k_blk, ring_axis, perm)
            v_blk = lax.ppermute(v_blk, ring_axis, perm)
            st_i = flash_state(q, k_blk, v_blk, None)
            return (merge_flash_states(st, st_i), k_blk, v_blk), None

        (state, _, _), _ = lax.scan(
            ring_step, (state, img_k, img_v), None, length=r - 1)
        out = state[0].reshape(b, sq, hl, d)
    else:
        # Streaming XLA einsum recurrence — the fallback for modes without
        # a stats-returning kernel (sdpa/auto; flash_int8's in-kernel int8
        # QK has no state output).
        # ---- fold replicated text K/V exactly once ----
        state = _init_state(b, hl, sq, d)
        state = _partial_attn(q, txt_k_l, txt_v_l, txt_bias, state, scale)

        # ---- ring rotation of img K/V ----
        perm = [(i, (i + 1) % r) for i in range(r)]

        def ring_step(carry, _):
            state, k_blk, v_blk = carry
            state = _partial_attn(q, k_blk, v_blk, None, state, scale)
            k_blk = lax.ppermute(k_blk, ring_axis, perm)
            v_blk = lax.ppermute(v_blk, ring_axis, perm)
            return (state, k_blk, v_blk), None

        (state, _, _), _ = lax.scan(
            ring_step, (state, img_k, img_v), None, length=r)

        out = _finish(state, img_v.dtype)  # [B, s_r + Lt, hl, D]
    img_out, txt_out = out[:, :s_r], out[:, s_r:]

    # ---- Ulysses seq-scatter / head-gather back ----
    if u > 1:
        img_out = lax.all_to_all(img_out, axis_name=ulysses_axis,
                                 split_axis=1, concat_axis=2, tiled=True)
        txt_out = lax.all_gather(txt_out, ulysses_axis, axis=2, tiled=True)

    return (img_out.reshape(b, img_out.shape[1], h * d),
            txt_out.reshape(b, lt, h * d))

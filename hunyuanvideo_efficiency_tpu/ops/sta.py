"""Sliding Tile Attention (STA) — block-sparse local video attention.

Implements the sliding-tile scheme of "Fast Video Generation with Sliding
Tile Attention" (arXiv 2502.04507, PAPERS.md), which demonstrated large
attention speedups on HunyuanVideo-class DiTs: video tokens are re-ordered
into 3D tiles; each query tile attends only the key tiles inside a 3D
sliding window around it (plus all text tokens), so attention cost drops
from O(S^2) to O(S * window).

TPU-native realization: the tile is exactly one Pallas block, and the
sparse tile neighborhood is driven by a *scalar-prefetched* neighbor table —
the BlockSpec index map reads `nbr[q_tile, slot]` to pick which key tile to
DMA next, and border slots are skipped entirely with `pl.when` (no wasted
FLOPs, no ragged masks inside blocks).

Opt-in (attn_mode="sta"): sparse attention changes outputs; the paper shows
quality holds with suitable windows, often keeping a few full-attention
layers. Text queries keep FULL attention over [img|txt] via the dense flash
kernel (they are ~256 tokens — negligible cost).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# --------------------------------------------------------------------------
# tile geometry (host-side, static per resolution)
# --------------------------------------------------------------------------

def _ceil(a, b):
    return -(-a // b)


@functools.lru_cache(maxsize=64)
def tile_plan(grid: Tuple[int, int, int], tile: Tuple[int, int, int],
              window: Tuple[int, int, int], txt_pad: int):
    """Static STA plan for a (T, H, W) token grid.

    Returns dict with:
      perm / inv_perm: token permutation row-major -> tile-major (padded)
      nbr:   [n_tiles, n_slots] int32 — key BLOCK index per slot; the img
             tiles come first, the text block(s) last; -1 = skip
      n_tiles, s_img_pad, tokens_per_tile
    """
    t, h, w = grid
    tt, th, tw = tile
    gt, gh, gw = _ceil(t, tt), _ceil(h, th), _ceil(w, tw)
    tp, hp, wp = gt * tt, gh * th, gw * tw
    n_tiles = gt * gh * gw
    tokens_per_tile = tt * th * tw

    # permutation: padded row-major index for each tile-major position
    idx = np.arange(tp * hp * wp, dtype=np.int32).reshape(tp, hp, wp)
    tiles = idx.reshape(gt, tt, gh, th, gw, tw).transpose(0, 2, 4, 1, 3, 5)
    perm = tiles.reshape(-1)  # tile-major -> padded-row-major src index
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(perm.size, dtype=np.int32)

    wt, wh, ww = window
    n_img_slots = wt * wh * ww
    n_txt_blocks = _ceil(txt_pad, tokens_per_tile)
    n_slots = n_img_slots + n_txt_blocks
    nbr = np.full((n_tiles, n_slots), -1, np.int32)
    coords = np.stack(np.meshgrid(np.arange(gt), np.arange(gh),
                                  np.arange(gw), indexing="ij"),
                      -1).reshape(-1, 3)
    for i, (a, b, c) in enumerate(coords):
        s = 0
        for da in range(-(wt // 2), wt // 2 + 1):
            for db in range(-(wh // 2), wh // 2 + 1):
                for dc in range(-(ww // 2), ww // 2 + 1):
                    aa, bb, cc = a + da, b + db, c + dc
                    if 0 <= aa < gt and 0 <= bb < gh and 0 <= cc < gw:
                        nbr[i, s] = (aa * gh + bb) * gw + cc
                    s += 1
        for jblk in range(n_txt_blocks):
            nbr[i, n_img_slots + jblk] = n_tiles + jblk
    # valid-first compaction: slot order is irrelevant to the math (the
    # kernel folds slots commutatively under one softmax), but packing the
    # -1 skips at the tail means a border tile's trailing slot GROUPS are
    # entirely invalid, letting the kernel skip their compute wholesale
    # (~22% of computed pairs at 720p are border waste otherwise).
    order = np.argsort(nbr < 0, axis=1, kind="stable")
    nbr = np.take_along_axis(nbr, order, axis=1)
    return {
        "perm": perm, "inv_perm": inv_perm, "nbr": nbr,
        "n_tiles": n_tiles, "tokens_per_tile": tokens_per_tile,
        "padded_grid": (tp, hp, wp), "n_slots": n_slots, "tile": tile,
    }


@functools.lru_cache(maxsize=64)
def rotation_plan(grid: Tuple[int, int, int], tile: Tuple[int, int, int],
                  window: Tuple[int, int, int]):
    """Lane-stable neighbor/DMA tables for the sliding-window direct path.

    The direct kernel is DMA-bound: every key tile is refetched once per
    neighboring q-tile (~35 GB/layer at 720p, docs/KERNELS.md). This plan
    turns Mosaic's revisiting elision into a K/V *sliding window*: the img
    neighborhood rides ONE slot group of wt*wh*ww operand lanes, and lane
    ``((da+wt//2)*wh + (db+wh//2))*ww + (w+dw) % ww`` holds the neighbor at
    w-column w+dw. Because the Pallas grid iterates q-tiles w-innermost,
    stepping w -> w+1 changes the index of only wt*wh of the lanes (the
    leading column); the other wt*wh*(ww-1) lanes keep the SAME block index
    between consecutive grid steps, so Mosaic elides their copies — the
    window slides, cutting key/value DMA ~ww-fold on interior rows.

    Invalid lanes (grid borders) inherit the previous q-tile's index in the
    ``dma`` table (copy elided; their compute is masked by the per-lane
    -inf bias), and the txt grid step repeats the img lanes so the window
    survives it untouched.

    Returns ``(nbr [n_tiles, S], dma [n_tiles, 2*S])`` int32 numpy arrays,
    with S = wt*wh*ww lanes in kernel order (q-tiles w-innermost row-major,
    matching the direct kernel's qi decomposition)."""
    t, h, w = grid
    tt, th, tw = tile
    gt, gh, gw = _ceil(t, tt), _ceil(h, th), _ceil(w, tw)
    n_tiles = gt * gh * gw
    wt, wh, ww = window
    n_slots = wt * wh * ww
    nbr = np.full((n_tiles, n_slots), -1, np.int32)
    for a in range(gt):
        for bb_ in range(gh):
            for cw in range(gw):
                i = (a * gh + bb_) * gw + cw
                for da in range(-(wt // 2), wt // 2 + 1):
                    for db in range(-(wh // 2), wh // 2 + 1):
                        for dc in range(-(ww // 2), ww // 2 + 1):
                            aa, bb, cc = a + da, bb_ + db, cw + dc
                            lane = (((da + wt // 2) * wh + (db + wh // 2))
                                    * ww + (cw + dc) % ww)
                            if 0 <= aa < gt and 0 <= bb < gh and 0 <= cc < gw:
                                nbr[i, lane] = (aa * gh + bb) * gw + cc
    dma = nbr.copy()
    dma[0] = np.maximum(dma[0], 0)
    for i in range(1, n_tiles):
        dma[i] = np.where(nbr[i] < 0, dma[i - 1], nbr[i])
    return nbr, np.concatenate([dma, dma], axis=1)


@functools.lru_cache(maxsize=64)
def rotation_plan_grouped(grid: Tuple[int, int, int],
                          tile: Tuple[int, int, int],
                          window: Tuple[int, int, int]):
    """Grouped variant of rotation_plan: ww slot GROUPS of wt*wh lanes, one
    per neighborhood w-column, keeping the per-step granularity the mega
    single-group layout gives up (measured: one 27-slot step loses Mosaic's
    cross-step VPU/MXU/DMA pipelining, docs/KERNELS.md).

    Group order per q-tile is ``[col w, ..., col w+1 LAST]`` so the LAST
    img group of tile w, the txt step (which repeats it), and the FIRST
    group of tile w+1 all carry col w+1 in the same lanes — Mosaic's
    revisiting check elides that group's fetches across the tile boundary:
    ~1/3 of key/value DMA gone on interior rows, with head grouping and
    step granularity unchanged.

    Returns ``(nbr [n_tiles, ww*wt*wh], dma [n_tiles, (ww+1)*wt*wh],
    gate_lane)`` — gate_lane is the (da=0, db=0) lane whose validity is
    exactly "this group's column exists", letting the kernel skip fully
    out-of-grid column groups on w-border tiles."""
    t, h, w = grid
    tt, th, tw = tile
    gt, gh, gw = _ceil(t, tt), _ceil(h, th), _ceil(w, tw)
    n_tiles = gt * gh * gw
    wt, wh, ww = window
    lanes = wt * wh
    # column visit order: current first, +1 last (the handoff column);
    # middles in any fixed order
    dcs = ([0] + [-k for k in range(1, ww // 2 + 1)]
           + [k for k in range(ww // 2, 1, -1)] + ([1] if ww > 1 else []))
    assert len(dcs) == ww and (ww == 1 or dcs[-1] == 1)
    nbr = np.full((n_tiles, ww * lanes), -1, np.int32)
    for a in range(gt):
        for b_ in range(gh):
            for cw in range(gw):
                i = (a * gh + b_) * gw + cw
                for gi, dc in enumerate(dcs):
                    cc = cw + dc
                    if not 0 <= cc < gw:
                        continue
                    for da in range(-(wt // 2), wt // 2 + 1):
                        for db in range(-(wh // 2), wh // 2 + 1):
                            aa, bb = a + da, b_ + db
                            if 0 <= aa < gt and 0 <= bb < gh:
                                lane = (gi * lanes
                                        + (da + wt // 2) * wh
                                        + (db + wh // 2))
                                nbr[i, lane] = (aa * gh + bb) * gw + cc
    # per-STEP forward fill (global (qi, group) order): invalid lanes
    # inherit the previous step's same-lane index -> copy elided
    dma = np.zeros((n_tiles, (ww + 1) * lanes), np.int32)
    prev = np.zeros(lanes, np.int32)
    for i in range(n_tiles):
        for gi in range(ww):
            cur = nbr[i, gi * lanes:(gi + 1) * lanes]
            prev = np.where(cur < 0, prev, cur).astype(np.int32)
            dma[i, gi * lanes:(gi + 1) * lanes] = prev
        dma[i, ww * lanes:] = prev  # txt step repeats -> window survives
    gate_lane = (wt // 2) * wh + (wh // 2)
    return nbr, dma, gate_lane


def _permute_tokens(x, grid, tile, plan):
    """[B, S_img, H, D] row-major -> [B, S_pad, H, D] tile-major.

    Expressed as pad + reshape + transpose (the tiling permutation is
    regular) — an XLA gather over the precomputed `perm` index ran at
    ~95 GB/s on v5e while the transpose form runs near HBM bandwidth."""
    b, s, hh, d = x.shape
    tp, hp, wp = plan["padded_grid"]
    t, h, w = grid
    tt, th, tw = tile
    xg = x.reshape(b, t, h, w, hh * d)
    xg = jnp.pad(xg, ((0, 0), (0, tp - t), (0, hp - h), (0, wp - w), (0, 0)))
    xg = xg.reshape(b, tp // tt, tt, hp // th, th, wp // tw, tw, hh * d)
    xg = xg.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xg.reshape(b, tp * hp * wp, hh * d)


def _pad_tokens_5d(x, grid, padded_grid):
    """[B, S_img, H, D] row-major -> [B, Tp, Hp, Wp, HD] zero-padded.

    The direct STA kernel (r5) gathers neighbor K/V tiles straight out of
    this layout via 5-d BlockSpecs, so the tile-major transpose
    (_permute_tokens) is replaced by a contiguous pad — free when the grid
    is already tile-aligned, and fusable into the producer otherwise."""
    b, s, hh, d = x.shape
    t, h, w = grid
    tp, hp, wp = padded_grid
    xg = x.reshape(b, t, h, w, hh * d)
    if (tp, hp, wp) == (t, h, w):
        return xg
    return jnp.pad(xg, ((0, 0), (0, tp - t), (0, hp - h), (0, wp - w),
                        (0, 0)))


def _unpermute_tokens(y, grid, plan, tile=None):
    """[B, S_pad, HD] tile-major -> [B, S_img, HD] row-major (inverse
    transpose of _permute_tokens)."""
    b, sp, hd = y.shape
    tp, hp, wp = plan["padded_grid"]
    t, h, w = grid
    if tile is None:
        tile = plan["tile"]
    tt, th, tw = tile
    yg = y.reshape(b, tp // tt, hp // th, wp // tw, tt, th, tw, hd)
    yg = yg.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    xg = yg.reshape(b, tp, hp, wp, hd)
    return xg[:, :t, :h, :w].reshape(b, t * h * w, hd)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _sta_kernel(nbr_ref, dma_ref, *refs, scale: float, n_groups: int,
                slot_block: int, head_block: int, d: int):
    """One (batch, head-group, q-tile, slot-group) grid step.

    Folds `slot_block` key tiles x `head_block` heads per step. A one-tile/
    one-head step (the v1 kernel) does only ~0.2 us of MXU work, so the
    per-grid-step fixed cost dominated and STA ran barely faster than dense
    flash (~242k steps at 544p); grouping raises per-step work to ~5 us and
    cuts the grid 32x. Per-head softmax stats live one LANE per head in the
    m/l scratch tiles."""
    kb_refs = refs[:slot_block]
    q_ref = refs[slot_block]
    k_refs = refs[slot_block + 1:2 * slot_block + 1]
    v_refs = refs[2 * slot_block + 1:3 * slot_block + 1]
    o_ref = refs[3 * slot_block + 1]
    m_scr, l_scr, acc_scr = refs[3 * slot_block + 2:]

    qi = pl.program_id(2)
    g = pl.program_id(3)

    @pl.when(g == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for i in range(slot_block):
        @pl.when(nbr_ref[qi, g * slot_block + i] >= 0)
        def _fold(i=i):
            kb = kb_refs[i][0, 0:1, :]
            for h in range(head_block):
                cs = slice(h * d, (h + 1) * d)
                # dots keep the model dtype (bf16 -> single-pass MXU,
                # fp32 accumulate)
                s = jax.lax.dot_general(
                    q_ref[0][:, cs], k_refs[i][0][:, cs],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s + kb
                m_prev = m_scr[:, h:h + 1]
                l_prev = l_scr[:, h:h + 1]
                m_new = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
                p = jnp.exp(s - m_new)
                corr = jnp.exp(m_prev - m_new)
                pv = jax.lax.dot_general(
                    p.astype(v_refs[i].dtype), v_refs[i][0][:, cs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_scr[:, h:h + 1] = m_new
                l_scr[:, h:h + 1] = (l_prev * corr
                                     + jnp.sum(p, -1, keepdims=True))
                acc_scr[:, cs] = acc_scr[:, cs] * corr + pv

    @pl.when(g == n_groups - 1)
    def _finish():
        denom = jnp.concatenate(
            [jnp.broadcast_to(jnp.maximum(l_scr[:, h:h + 1], 1e-37),
                              (l_scr.shape[0], d))
             for h in range(head_block)], axis=1)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _sta_nomax_kernel(nbr_ref, dma_ref, c_ref, *refs, scale: float,
                      n_groups: int, slot_block: int, head_block: int,
                      d: int, quant: bool):
    """Static-offset STA fold (optionally int8-QK) — see _sta_kernel for
    the grid/ref layout.

    Like the dense flash `_flash_nomax_kernel`: with QK-norm bounding the
    scores, `exp(s - C)` is overflow/underflow-safe for a per-(batch, head)
    Cauchy-Schwarz bound C, so the running-max reduce, the `corr` rescales
    of l/acc, and the m scratch all drop — the accumulators become pure
    adds that overlap the next slot's MXU dot. `quant` additionally runs
    QK^T as s8 x s8 -> s32 (2x the bf16 MXU rate); the caller inflates C
    by (1 + sqrt(d)/254)^2 to also bound the int8-rounded scores."""
    kb_refs = refs[:slot_block]
    q_ref = refs[slot_block]
    k_refs = refs[slot_block + 1:2 * slot_block + 1]
    v_refs = refs[2 * slot_block + 1:3 * slot_block + 1]
    o_ref = refs[3 * slot_block + 1]
    l_scr, acc_scr = refs[3 * slot_block + 2:]

    bi = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = pl.program_id(3)

    @pl.when(g == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for i in range(slot_block):
        @pl.when(nbr_ref[qi, g * slot_block + i] >= 0)
        def _fold(i=i):
            kb = kb_refs[i][0, 0:1, :]
            for h in range(head_block):
                cs = slice(h * d, (h + 1) * d)
                c = c_ref[bi, hg * head_block + h]
                if quant:
                    qf = q_ref[0][:, cs].astype(jnp.float32)
                    sq = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-6) / 127.0
                    q8 = jnp.round(qf * (1.0 / sq)).astype(jnp.int8)
                    kf = k_refs[i][0][:, cs].astype(jnp.float32)
                    sk = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-6) / 127.0
                    k8 = jnp.round(kf * (1.0 / sk)).astype(jnp.int8)
                    s32 = jax.lax.dot_general(
                        q8, k8, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    s = s32.astype(jnp.float32) * (sq * sk * scale)
                else:
                    s = jax.lax.dot_general(
                        q_ref[0][:, cs], k_refs[i][0][:, cs],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                p = jnp.exp(s + (kb - c))
                pv = jax.lax.dot_general(
                    p.astype(v_refs[i].dtype), v_refs[i][0][:, cs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                l_scr[:, h:h + 1] = (l_scr[:, h:h + 1]
                                     + jnp.sum(p, -1, keepdims=True))
                acc_scr[:, cs] = acc_scr[:, cs] + pv

    @pl.when(g == n_groups - 1)
    def _finish():
        denom = jnp.concatenate(
            [jnp.broadcast_to(jnp.maximum(l_scr[:, h:h + 1], 1e-37),
                              (l_scr.shape[0], d))
             for h in range(head_block)], axis=1)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _sta_nomax_fused_kernel(nbr_ref, dma_ref, c_ref, *refs, scale: float,
                            n_groups: int, slot_block: int, head_block: int,
                            d: int, quant: bool):
    """Wide-exp variant of _sta_nomax_kernel (same grid/ref layout).

    The per-slot `pl.when`-guarded fold produces a serial
    QK-dot -> exp -> PV-dot chain per (slot, head) on tiny [tile, tile]
    blocks, leaving both the MXU and the VPU mostly idle (measured
    ~57 TFLOP/s vs 167 for dense flash). Here every slot's QK dot runs
    unconditionally (border slots cost ~21% extra dots but their scores are
    killed by a scalar -inf mask read from the neighbor table), the exp/sum
    runs ONCE over the [tile, slot_block*tile] concatenated scores, and the
    PV dots accumulate afterwards — fewer, wider VPU ops and back-to-back
    independent MXU dots. `quant` quantizes q once per head (not per
    slot-fold) and each key tile once."""
    kb_refs = refs[:slot_block]
    q_ref = refs[slot_block]
    k_refs = refs[slot_block + 1:2 * slot_block + 1]
    v_refs = refs[2 * slot_block + 1:3 * slot_block + 1]
    o_ref = refs[3 * slot_block + 1]
    l_scr, acc_scr = refs[3 * slot_block + 2:]

    bi = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = pl.program_id(3)

    @pl.when(g == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # tile_plan packs valid slots first, so a group whose FIRST slot is
    # invalid is entirely invalid — skip its compute wholesale (border
    # tiles' trailing groups; ~22% of padded pairs at 720p)
    @pl.when(nbr_ref[qi, g * slot_block] >= 0)
    def _group():
        # bias row for the whole slot group: key bias ++ scalar slot mask
        kbias = jnp.concatenate(
            [kb_refs[i][0, 0:1, :]
             + jnp.where(nbr_ref[qi, g * slot_block + i] >= 0, 0.0, NEG_INF)
             for i in range(slot_block)], axis=-1)

        for h in range(head_block):
            cs = slice(h * d, (h + 1) * d)
            c = c_ref[bi, hg * head_block + h]
            if quant:
                qf = q_ref[0][:, cs].astype(jnp.float32)
                sq = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-6) / 127.0
                q8 = jnp.round(qf * (1.0 / sq)).astype(jnp.int8)
                parts = []
                for i in range(slot_block):
                    kf = k_refs[i][0][:, cs].astype(jnp.float32)
                    sk = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-6) / 127.0
                    k8 = jnp.round(kf * (1.0 / sk)).astype(jnp.int8)
                    s32 = jax.lax.dot_general(
                        q8, k8, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    parts.append(s32.astype(jnp.float32) * (sq * sk * scale))
                s = jnp.concatenate(parts, axis=-1)
            else:
                s = jnp.concatenate(
                    [jax.lax.dot_general(
                        q_ref[0][:, cs], k_refs[i][0][:, cs],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     for i in range(slot_block)], axis=-1) * scale
            p = jnp.exp(s + (kbias - c))
            l_scr[:, h:h + 1] = (l_scr[:, h:h + 1]
                                 + jnp.sum(p, -1, keepdims=True))
            blk = p.shape[-1] // slot_block
            pv = None
            for i in range(slot_block):
                pvi = jax.lax.dot_general(
                    p[:, i * blk:(i + 1) * blk].astype(v_refs[i].dtype),
                    v_refs[i][0][:, cs], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pv = pvi if pv is None else pv + pvi
            acc_scr[:, cs] = acc_scr[:, cs] + pv

    @pl.when(g == n_groups - 1)
    def _finish():
        denom = jnp.concatenate(
            [jnp.broadcast_to(jnp.maximum(l_scr[:, h:h + 1], 1e-37),
                              (l_scr.shape[0], d))
             for h in range(head_block)], axis=1)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _pick_head_block(heads: int, d: int, block: int, slot_block: int,
                     txt_tokens: int = 0) -> int:
    """Largest whole divisor of `heads` whose per-step working set fits a
    conservative VMEM budget. Bigger head groups fetch each K/V tile fewer
    times (head_block == heads fetches once per (tile, slot) instead of
    heads/hb times). On-chip sweep at 720p (24 heads, d=128, block=256,
    slot_block=4): hb=24 90.5 ms (104.5 TFLOP/s) vs hb=8 94.0 ms.
    txt_tokens: resident text K/V operands of the direct kernel."""
    for hb in range(heads, 0, -1):
        if heads % hb:
            continue
        hb_d = hb * d
        # (K slots + V slots + q + out) bf16 blocks, double-buffered,
        # plus f32 accumulator scratch and resident txt K/V
        step = (2 * slot_block + 2) * block * hb_d * 2
        scratch = block * hb_d * 4 + 2 * block * 128 * 4
        txt = 2 * txt_tokens * hb_d * 2
        if 2 * step + scratch + txt <= 80 * 2 ** 20:
            return hb
    return 1


def _dma_indices(nbr, slot_block):
    """DMA block index per slot. Valid slots use their neighbor index;
    invalid (-1) slots REPEAT the same operand lane's index from the
    previous slot group. The grid iterates groups innermost, so a repeated
    index matches the previous grid step's block for that operand and
    Mosaic's revisiting check elides the copy — border tiles' trailing
    all-invalid groups (~19% of padded slot fetches at 720p) cost no HBM
    traffic (their compute is already skipped via `pl.when`). Group 0 falls
    back to clamp-to-0 (slot 0 — the tile itself — is always valid)."""
    dma = jnp.maximum(nbr, 0)
    n_groups = nbr.shape[1] // slot_block
    cols = [dma[:, :slot_block]]
    for g in range(1, n_groups):
        sl = slice(g * slot_block, (g + 1) * slot_block)
        cols.append(jnp.where(nbr[:, sl] < 0, cols[-1], dma[:, sl]))
    return jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "block", "n_slots",
                              "interpret", "quant", "slot_block",
                              "head_block", "fused"))
def _sta_call_nomax(nbr, kb, q, kcat, vcat, c, heads, scale, block, n_slots,
                    interpret, quant, slot_block=None, head_block=None,
                    fused=True):
    """Static-offset variant of _sta_call; c [B, H] f32 score bounds ride
    SMEM via scalar prefetch (inflated by the caller when quant=True)."""
    b, sq, hd = q.shape
    d = hd // heads
    n_tiles = sq // block

    if slot_block is None:
        slot_block = 4
    if head_block is None:
        head_block = _pick_head_block(heads, d, block, slot_block)
    n_groups = _ceil(n_slots, slot_block)
    if n_slots % slot_block:
        pad = n_groups * slot_block - n_slots
        nbr = jnp.pad(nbr, ((0, 0), (0, pad)), constant_values=-1)
    grid = (b, heads // head_block, n_tiles, n_groups)

    nbr_dma = _dma_indices(nbr, slot_block)
    hb_d = head_block * d

    def kb_spec(i):
        return pl.BlockSpec(
            (1, 8, block),
            lambda bi, hi, qi, g, nbr_s, dma_s, c_s, i=i:
                (bi, 0, dma_s[qi, g * slot_block + i]))

    def kv_spec(i):
        return pl.BlockSpec(
            (1, block, hb_d),
            lambda bi, hi, qi, g, nbr_s, dma_s, c_s, i=i:
                (bi, dma_s[qi, g * slot_block + i], hi))

    q_spec = pl.BlockSpec(
        (1, block, hb_d),
        lambda bi, hi, qi, g, nbr_s, dma_s, c_s: (bi, qi, hi))

    body = _sta_nomax_fused_kernel if fused else _sta_nomax_kernel
    out = pl.pallas_call(
        functools.partial(body, scale=scale, n_groups=n_groups,
                          slot_block=slot_block, head_block=head_block, d=d,
                          quant=quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # nbr (kernel), nbr_dma (maps), c (kernel)
            grid=grid,
            in_specs=(
                [kb_spec(i) for i in range(slot_block)]
                + [q_spec]
                + [kv_spec(i) for i in range(slot_block)]
                + [kv_spec(i) for i in range(slot_block)]
            ),
            out_specs=pl.BlockSpec(
                (1, block, hb_d),
                lambda bi, hi, qi, g, nbr_s, dma_s, c_s: (bi, qi, hi)),
            scratch_shapes=[pltpu.VMEM((block, 128), jnp.float32),
                            pltpu.VMEM((block, hb_d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(nbr, nbr_dma, c, *([kb] * slot_block), q,
      *([kcat] * slot_block), *([vcat] * slot_block))
    return out


def _sta_nomax_direct_kernel(nbr_ref, dma_ref, c_ref, *refs, scale: float,
                             n_groups_img: int, slot_block: int,
                             head_block: int, d: int, quant: bool,
                             tile: Tuple[int, int, int],
                             grid3: Tuple[int, int, int],
                             gate_lane: Optional[int] = 0):
    """Direct-grid variant of _sta_nomax_fused_kernel.

    q is read STRAIGHT from the row-major [B, T, H, W, hd] token grid as a
    (1, tt, th, tw, hb_d) block and the output is written back the same way
    — no tile-major permute of q and no un-permute of out ever exist in
    HBM. Partial edge blocks are safe without masks: input padding garbage
    only produces garbage in its own SCORE ROWS (softmax is row-local) and
    those rows' output stores land in the masked-off pad region. Text keys/
    values ride as small RESIDENT operands (index map constant in qi/g, so
    Mosaic fetches them once per (batch, head-group)) folded in a dedicated
    final grid group — kcat/vcat concatenated copies are gone too. K/V are
    read from the ZERO-PADDED row-major grid [B, Tp, Hp, Wp, hd] (r5):
    each slot's index map decomposes the neighbor tile index into its
    (t, h, w) tile coordinates and the (1, tt, th, tw, hb_d) block gathers
    the tile exactly like the q block does — the DMA granularity (tt*th*tw
    runs of hb_d elements) is byte-identical to the former tile-major
    fetch, so the two transposing _permute_tokens copies are replaced by
    one contiguous jnp.pad (key-side pad tokens are ZEROS, masked by the
    tile-major kb bias as before)."""
    kb_refs = refs[:slot_block]
    q_ref = refs[slot_block]
    k_refs = refs[slot_block + 1:2 * slot_block + 1]
    v_refs = refs[2 * slot_block + 1:3 * slot_block + 1]
    tk_ref, tv_ref, tb_ref = refs[3 * slot_block + 1:3 * slot_block + 4]
    o_ref = refs[3 * slot_block + 4]
    l_scr, acc_scr = refs[3 * slot_block + 5:]

    bi = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = pl.program_id(3)
    block = tile[0] * tile[1] * tile[2]
    hb_d = head_block * d

    @pl.when(g == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # img slot groups: identical math to _sta_nomax_fused_kernel
    if quant:
        # partial edge q tiles carry unspecified pad rows; the tile-WIDE
        # activation absmax would couple that garbage into every valid
        # row's scale (bf16 garbage rows are harmless — score garbage is
        # row-local — but a scalar scale is not). Zero invalid rows first.
        tt_, th_, tw_ = tile
        f = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        toff = f // (th_ * tw_)
        hoff = (f // tw_) % th_
        woff = f % tw_
        gh_ = _ceil(grid3[1], th_)
        gw_ = _ceil(grid3[2], tw_)
        vt = grid3[0] - (qi // (gh_ * gw_)) * tt_
        vh = grid3[1] - ((qi // gw_) % gh_) * th_
        vw = grid3[2] - (qi % gw_) * tw_
        row_valid = (toff < vt) & (hoff < vh) & (woff < vw)

    # Group skipping: gate_lane is the slot whose validity decides whether
    # the whole group runs. Non-rotate tables are valid-first-compacted so
    # lane 0 works; grouped-rotation tables are lane-assigned and pass the
    # (da=0, db=0) lane ("this column exists"); the mega single-group
    # layout passes None (always run — invalid lanes are masked by the
    # per-lane -inf bias below either way).
    if gate_lane is None:
        img_gate = g < n_groups_img
    else:
        img_gate = jnp.logical_and(
            g < n_groups_img, nbr_ref[qi, g * slot_block + gate_lane] >= 0)

    @pl.when(img_gate)
    def _group():
        qblk = q_ref[0].reshape(block, hb_d)
        # row-major (1, tt, th, tw, hb_d) K/V blocks collapse to the tile-
        # major (block, hb_d) matrix exactly like the q block — a free
        # leading-dim reshape in VMEM
        kblks = [k_refs[i][0].reshape(block, hb_d) for i in range(slot_block)]
        vblks = [v_refs[i][0].reshape(block, hb_d) for i in range(slot_block)]
        kbias = jnp.concatenate(
            [kb_refs[i][0, 0:1, :]
             + jnp.where(nbr_ref[qi, g * slot_block + i] >= 0, 0.0, NEG_INF)
             for i in range(slot_block)], axis=-1)

        for h in range(head_block):
            cs = slice(h * d, (h + 1) * d)
            c = c_ref[bi, hg * head_block + h]
            if quant:
                qf = jnp.where(row_valid, qblk[:, cs].astype(jnp.float32),
                               0.0)
                sq = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-6) / 127.0
                q8 = jnp.round(qf * (1.0 / sq)).astype(jnp.int8)
                parts = []
                for i in range(slot_block):
                    kf = kblks[i][:, cs].astype(jnp.float32)
                    sk = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-6) / 127.0
                    k8 = jnp.round(kf * (1.0 / sk)).astype(jnp.int8)
                    s32 = jax.lax.dot_general(
                        q8, k8, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    parts.append(s32.astype(jnp.float32) * (sq * sk * scale))
                s = jnp.concatenate(parts, axis=-1)
            else:
                s = jnp.concatenate(
                    [jax.lax.dot_general(
                        qblk[:, cs], kblks[i][:, cs],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                     for i in range(slot_block)], axis=-1) * scale
            p = jnp.exp(s + (kbias - c))
            l_scr[:, h:h + 1] = (l_scr[:, h:h + 1]
                                 + jnp.sum(p, -1, keepdims=True))
            blk = p.shape[-1] // slot_block
            pv = None
            for i in range(slot_block):
                pvi = jax.lax.dot_general(
                    p[:, i * blk:(i + 1) * blk].astype(v_refs[i].dtype),
                    vblks[i][:, cs], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pv = pvi if pv is None else pv + pvi
            acc_scr[:, cs] = acc_scr[:, cs] + pv

    # final group: fold the resident text keys (bf16 dot even under quant —
    # txt is ~0.2% of the key tokens; the inflated c stays a valid bound),
    # then normalize and store the tile back into the row-major grid.
    @pl.when(g == n_groups_img)
    def _txt_and_finish():
        qblk = q_ref[0].reshape(block, hb_d)
        tb = tb_ref[0, 0:1, :]
        for h in range(head_block):
            cs = slice(h * d, (h + 1) * d)
            c = c_ref[bi, hg * head_block + h]
            s = jax.lax.dot_general(
                qblk[:, cs], tk_ref[0][:, cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = jnp.exp(s + (tb - c))
            l_scr[:, h:h + 1] = (l_scr[:, h:h + 1]
                                 + jnp.sum(p, -1, keepdims=True))
            acc_scr[:, cs] = acc_scr[:, cs] + jax.lax.dot_general(
                p.astype(tv_ref.dtype), tv_ref[0][:, cs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        denom = jnp.concatenate(
            [jnp.broadcast_to(jnp.maximum(l_scr[:, h:h + 1], 1e-37),
                              (block, d))
             for h in range(head_block)], axis=1)
        o_ref[0] = ((acc_scr[...] / denom)
                    .astype(o_ref.dtype)
                    .reshape(tile[0], tile[1], tile[2], hb_d))


@functools.partial(
    jax.jit, static_argnames=("grid3", "heads", "scale", "block", "n_slots",
                              "interpret", "quant", "slot_block",
                              "head_block", "tile", "rotate", "gate_lane",
                              "qi_sem"))
def _sta_call_nomax_direct(nbr, kb, q5, kp, vp, txt_k, txt_v, tb, c, grid3,
                           heads, scale, block, n_slots, interpret, quant,
                           tile, slot_block=None, head_block=None,
                           rotate=False, nbr_dma=None, gate_lane=None,
                           qi_sem=None):
    """Direct-grid static-offset STA dispatch.

    q5 [B, T, H, W, hd] row-major token grid (reshape view — never copied);
    kp/vp [B, Tp, Hp, Wp, hd] ZERO-PADDED row-major img K/V (r5 — the
    former tile-major permuted form is gone; each slot's index map picks
    the neighbor tile's (t, h, w) block coordinates directly); txt_k/txt_v
    [B, Ltp, hd]; tb [B, 8, Ltp] text key bias; kb [B, 8, S_pad] img key
    bias (TILE-major order — it is indexed by flat tile like before);
    c [B, H] static score bounds. Returns [B, T, H, W, hd]."""
    b = q5.shape[0]
    hd = q5.shape[-1]
    d = hd // heads
    t, h, w = grid3
    tt, th, tw = tile
    gt, gh, gw = _ceil(t, tt), _ceil(h, th), _ceil(w, tw)
    n_tiles = gt * gh * gw
    ltp = txt_k.shape[1]

    if rotate:
        # lane-rotation (sliding-window) dispatch: nbr/nbr_dma come
        # prebuilt from rotation_plan / rotation_plan_grouped (the dma
        # forward-fill runs over n_tiles rows — host numpy, not traced).
        # "mega": ONE img group of n_slots lanes; "grouped": one group per
        # neighborhood w-column (per-step granularity kept, boundary-group
        # elision).
        assert nbr_dma is not None
        assert slot_block is None, (
            "slot_block is derived from the rotation plan when rotate is "
            "set; pass slot_block=None (callers normalize — see "
            "sta_joint_attention)")
        if rotate == "grouped":
            lanes = nbr_dma.shape[1] - nbr.shape[1]
            slot_block = lanes
            n_groups_img = n_slots // lanes
            assert n_groups_img * lanes == n_slots
        else:
            slot_block = n_slots
            n_groups_img = 1
            gate_lane = None  # single always-valid group
        # keep the kernel's nbr reads in bounds at the txt grid step
        nbr = jnp.pad(nbr, ((0, 0), (0, slot_block)), constant_values=-1)
    else:
        gate_lane = 0  # valid-first-compacted tables
        if slot_block is None:
            # On-chip sweep at 720p bf16 (r4, full layer): sb=1 107.2 ms,
            # sb=2 104.1, sb=3 105.9, sb=4 112.0, sb=8 134.3 — smaller
            # slot groups pipeline DMA/compute across more grid steps and
            # skip border waste at finer grain; 2 is the sweet spot.
            slot_block = 2
        n_groups_img = _ceil(n_slots, slot_block)
        width = (n_groups_img + 1) * slot_block  # +1 = the txt group
        nbr = jnp.pad(nbr, ((0, 0), (0, width - nbr.shape[1])),
                      constant_values=-1)
        # forward-fill: invalid/txt-group slots repeat the previous group's
        # index so Mosaic's revisiting check elides their K/V copies
        nbr_dma = _dma_indices(nbr, slot_block)
    if head_block is None:
        head_block = _pick_head_block(heads, d, block, slot_block,
                                      txt_tokens=ltp)
    grid = (b, heads // head_block, n_tiles, n_groups_img + 1)
    hb_d = head_block * d

    def kb_spec(i):
        return pl.BlockSpec(
            (1, 8, block),
            lambda bi, hi, qi, g, nbr_s, dma_s, c_s, i=i:
                (bi, 0, dma_s[qi, g * slot_block + i]))

    def kv_spec(i):
        # decompose the forward-filled flat tile index into its (t, h, w)
        # tile coordinates in the padded row-major grid; identical flat
        # indices on consecutive steps decompose to identical coordinate
        # triples, so Mosaic's revisiting elision still skips their copies
        def idx(bi, hi, qi, g, nbr_s, dma_s, c_s, i=i):
            ti = dma_s[qi, g * slot_block + i]
            return (bi, ti // (gh * gw), (ti // gw) % gh, ti % gw, hi)
        return pl.BlockSpec((1, tt, th, tw, hb_d), idx)

    def qo_idx(bi, hi, qi, g, nbr_s, dma_s, c_s):
        return (bi, qi // (gh * gw), (qi // gw) % gh, qi % gw, hi)

    qo_spec = pl.BlockSpec((1, tt, th, tw, hb_d), qo_idx)
    tkv_spec = pl.BlockSpec(
        (1, ltp, hb_d),
        lambda bi, hi, qi, g, nbr_s, dma_s, c_s: (bi, 0, hi))
    tb_spec = pl.BlockSpec(
        (1, 8, ltp),
        lambda bi, hi, qi, g, nbr_s, dma_s, c_s: (bi, 0, 0))

    # rotate: the sliding-window elision needs consecutive grid steps along
    # the q-tile dim to be issued in order — mark qi "arbitrary" so Mosaic
    # cannot reorder across the lane handoff. `qi_sem` overrides for
    # measurement (isolating the semantics cost from the table layout); it
    # is a STATIC jit arg read from STA_QI_SEM by the unjitted caller
    # (sta_joint_attention) so a changed env var can never alias a cached
    # trace.
    qi_arb = (qi_sem == "arbitrary") if qi_sem else bool(rotate)
    sem = ("parallel", "parallel",
           "arbitrary" if qi_arb else "parallel", "arbitrary")
    out = pl.pallas_call(
        functools.partial(_sta_nomax_direct_kernel, scale=scale,
                          n_groups_img=n_groups_img, slot_block=slot_block,
                          head_block=head_block, d=d, quant=quant,
                          tile=tile, grid3=grid3, gate_lane=gate_lane),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # nbr (kernel), nbr_dma (maps), c
            grid=grid,
            in_specs=(
                [kb_spec(i) for i in range(slot_block)]
                + [qo_spec]
                + [kv_spec(i) for i in range(slot_block)]
                + [kv_spec(i) for i in range(slot_block)]
                + [tkv_spec, tkv_spec, tb_spec]
            ),
            out_specs=qo_spec,
            scratch_shapes=[pltpu.VMEM((block, 128), jnp.float32),
                            pltpu.VMEM((block, hb_d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, hd), q5.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(nbr, nbr_dma, c, *([kb] * slot_block), q5,
      *([kp] * slot_block), *([vp] * slot_block), txt_k, txt_v, tb)
    return out


def _permute_tokens_cols(x, grid, tile, padded_grid):
    """[B, S_img, H, D] row-major -> [B, S_pad, HD] in w-MAJOR tile order
    (tile index s = (c*gt + a)*gh + b): one window COLUMN of a q-row —
    tiles {(a+da, clamp-run of wh rows, c)} — is wt contiguous runs of wh
    tiles, so the ring kernel fetches it with wt DMAs instead of wt*wh."""
    b, s, hh, d = x.shape
    tp, hp, wp = padded_grid
    t, h, w = grid
    tt, th, tw = tile
    xg = x.reshape(b, t, h, w, hh * d)
    xg = jnp.pad(xg, ((0, 0), (0, tp - t), (0, hp - h), (0, wp - w), (0, 0)))
    xg = xg.reshape(b, tp // tt, tt, hp // th, th, wp // tw, tw, hh * d)
    xg = xg.transpose(0, 5, 1, 3, 2, 4, 6, 7)  # b, gw, gt, gh, tt, th, tw
    return xg.reshape(b, tp * hp * wp, hh * d)


def _cols_img_bias(grid, tile, padded_grid):
    """Token-validity bias (0 / NEG_INF) over the w-major tile order of
    _permute_tokens_cols — host numpy, static per shape."""
    t, h, w = grid
    tt, th, tw = tile
    tp, hp, wp = padded_grid
    v = np.zeros((tp, hp, wp), np.float32)
    v[:t, :h, :w] = 1.0
    v = v.reshape(tp // tt, tt, hp // th, th, wp // tw, tw)
    v = v.transpose(4, 0, 2, 1, 3, 5).reshape(-1)
    return np.where(v > 0, 0.0, NEG_INF).astype(np.float32)


def _pick_head_block_ring(heads: int, d: int, block: int,
                          window: Tuple[int, int, int], itemsize: int = 2,
                          budget: int = 64 * 2 ** 20) -> int:
    """Largest divisor of `heads` whose K+V ring fits the VMEM budget.

    Ring bytes = 2 (K,V) * (ww+1) slots * wt*wh*block tokens * hb*d * 2B.
    At 720p/24 heads/(3,3,3)/256-token tiles: hb=24 needs 113 MB -> picks
    hb=12 (56.6 MB), two head groups."""
    wt, wh, ww = window
    colrows = wt * wh * block
    for hb in range(heads, 0, -1):
        if heads % hb:
            continue
        if 2 * (ww + 1) * colrows * hb * d * itemsize <= budget:
            return hb
    return 1


_RING_PROBE = ""
"""Bench-only stage isolation for the ring kernel (trace-time; see
set_sta_lane_rotate's retrace note): "" production; "noexp" replaces the
softmax exp with identity (isolates VPU transcendental cost); "nodma"
skips all issue/wait (stale ring data — isolates DMA stalls); "dots"
both. Set via scripts/sta_kernel_bench.py --probe=..."""


def _sta_ring_kernel(c_ref, kp_hbm, vp_hbm, q_ref, tk_ref, tv_ref, tb_ref,
                     o_ref, kring, vring, l_scr, acc_scr, sems, *,
                     scale: float, grid3: Tuple[int, int, int],
                     tgrid: Tuple[int, int, int],
                     tile: Tuple[int, int, int],
                     window: Tuple[int, int, int], head_block: int, d: int,
                     probe: str = ""):
    """Manual K/V ring-buffer STA: one grid step = ONE whole q-tile.

    The BlockSpec-driven direct kernel refetches each key tile once per
    neighboring q-tile (~35 GB/layer at 720p) and its measured 88 ms =
    ~48 ms MXU floor + ~43 ms K/V DMA barely overlapping
    (docs/KERNELS.md). Here the wt*wh*ww-tile neighborhood lives in an
    explicit VMEM ring of ww+1 window COLUMNS: sweeping the q-tiles
    w-innermost, each step waits one previously-issued column (wt runs of
    wh contiguous tiles in the w-major kp/vp layout,
    _permute_tokens_cols), issues the column two steps ahead, and reuses
    the other ww-1 columns in place — K/V HBM traffic drops ~ww-fold on
    interior rows, and the double-buffered issue distance keeps the DMA
    under the compute. Border validity (t/h/w window edges + ragged-grid
    zero padding) is a lane bias computed in-kernel from iota/scalars, so
    no kb operand or neighbor table exists at all; out-of-range runs fetch
    a clamped valid tile (never uninitialized VMEM) and are masked -inf.
    Static-offset softmax only (pure-add accumulators, as
    _sta_nomax_direct_kernel)."""
    t, h, w = grid3
    gt, gh, gw = tgrid
    tt, th, tw = tile
    wt, wh, ww = window
    block = tt * th * tw
    hb_d = head_block * d
    nring = ww + 1
    seg = wh * block          # tokens per (column, da) run
    colrows = wt * seg        # tokens per window column

    bi = pl.program_id(0)
    hg = pl.program_id(1)
    ri = pl.program_id(2)
    cw = pl.program_id(3)
    a = ri // gh
    bh = ri - a * gh
    sb = jnp.clip(bh - wh // 2, 0, gh - wh)  # clamped h-run start

    def col_dma(cc, kind, da):
        slot = jax.lax.rem(cc, nring)
        aa = jnp.clip(a + da - wt // 2, 0, gt - 1)
        s0 = ((cc * gt) + aa) * gh + sb
        src, dst = ((kp_hbm, kring), (vp_hbm, vring))[kind]
        return pltpu.make_async_copy(
            src.at[bi, pl.ds(s0 * block, seg), pl.ds(hg * hb_d, hb_d)],
            dst.at[slot, pl.ds(da * seg, seg), :],
            sems.at[slot, kind, da])

    def issue(cc):
        for kind in range(2):
            for da in range(wt):
                col_dma(cc, kind, da).start()

    def wait(cc):
        for kind in range(2):
            for da in range(wt):
                col_dma(cc, kind, da).wait()

    # Pipeline: at step cw the window {cw-1, cw, cw+1} must be resident.
    # Column cc is issued at step cc-2 and waited at step cc-1; the row
    # prologue (cw == 0) seeds columns 0 and 1. Ring slot cc % (ww+1) is
    # last read at step cc+1 and next written at step cc+ww+1 (issued at
    # cc+ww-1 >= cc+2) — no overlap for ww >= 2; ww == 1 windows are
    # degenerate (tw-wide attention) and not routed here.
    if probe != "nodma" and probe != "dots":
        @pl.when(jnp.logical_and(jnp.logical_and(bi == 0, hg == 0),
                                 jnp.logical_and(ri == 0, cw == 0)))
        def _zero_ring_once():
            # the very first row reads ring slots never written (the left
            # column at cw=0, the right column at cw=gw-1 when gw < ww+1);
            # uninitialized VMEM may hold NaN patterns that would poison
            # the unconditional masked folds below (NaN * 0 = NaN). One
            # memset per kernel invocation, BEFORE the prologue's DMAs.
            kring[...] = jnp.zeros_like(kring)
            vring[...] = jnp.zeros_like(vring)

        @pl.when(cw == 0)
        def _prologue():
            issue(0)
            if gw > 1:
                issue(1)
            wait(0)

        @pl.when(cw + 2 < gw)
        def _issue_ahead():
            issue(cw + 2)

        @pl.when(cw + 1 < gw)
        def _wait_next():
            wait(cw + 1)

    qblk = q_ref[0].reshape(block, hb_d)

    def col_bias(dc):
        """Lane-validity bias for window column cw+dc: window membership
        in t/h, ragged-grid token validity, and whole-column range — all
        from iota/scalars, so no kb operand or neighbor table exists."""
        cc = cw + dc
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, colrows), 1)
        tile_i = lane // block
        da_i = tile_i // wh
        r_i = tile_i - da_i * wh
        tok = lane - tile_i * block
        to = tok // (th * tw)
        ho = (tok // tw) - to * th
        wo = tok - (tok // tw) * tw
        aa = a + da_i - wt // 2
        bb = sb + r_i
        valid = jnp.logical_and(
            jnp.logical_and(aa >= 0, aa < gt),
            jnp.abs(bb - bh) <= wh // 2)
        valid = jnp.logical_and(
            valid,
            jnp.logical_and(
                jnp.logical_and(aa * tt + to < t, bb * th + ho < h),
                cc * tw + wo < w))
        valid = jnp.logical_and(
            valid, jnp.logical_and(cc >= 0, cc < gw))
        return jnp.where(valid, 0.0, NEG_INF)

    # Best-measured fold form (see the ablation table in docs/KERNELS.md):
    # per-column pl.when border skip + scratch accumulators + per-da-run
    # sub-tiling. Measured alternatives at 720p, all worse: whole-column
    # [256, wt*wh*block] folds 137.5 ms (score block exceeds the ~2 MB
    # vector register file), unconditional straight-line 157.8 (border
    # waste), phase-unrolled static slots 168.5, pure-register SSA
    # accumulation 141.8, all-parallel semantics 143.9 — vs 131.4 for
    # this form and 104-108 for the BlockSpec kernel.
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    def fold_column(dc, slot):
        cc = cw + dc
        extra = col_bias(dc)
        for hh_ in range(head_block):
            cs = slice(hh_ * d, (hh_ + 1) * d)
            cb = c_ref[bi, hg * head_block + hh_]
            for ci in range(wt):
                rs = slice(ci * seg, (ci + 1) * seg)
                s = jax.lax.dot_general(
                    qblk[:, cs], kring[slot, rs, cs],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if probe in ("noexp", "dots"):
                    p = s + (extra[:, rs] - cb)
                else:
                    p = jnp.exp(s + (extra[:, rs] - cb))
                l_scr[:, hh_:hh_ + 1] = (l_scr[:, hh_:hh_ + 1]
                                         + jnp.sum(p, -1, keepdims=True))
                acc_scr[:, cs] = acc_scr[:, cs] + jax.lax.dot_general(
                    p.astype(vring.dtype), vring[slot, rs, cs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    for dc in range(-(ww // 2), ww // 2 + 1):
        cc = cw + dc

        @pl.when(jnp.logical_and(cc >= 0, cc < gw))
        def _col(dc=dc):
            if probe == "static0":  # perf probe: wrong data, static slots
                fold_column(dc, (dc + nring) % nring)
            else:
                # +nring before rem: lax.rem keeps sign, cw+dc can be -1
                fold_column(dc, jax.lax.rem(cw + dc + nring, nring))

    # fold the resident text keys, normalize, store the tile
    tb = tb_ref[0, 0:1, :]
    for hh_ in range(head_block):
        cs = slice(hh_ * d, (hh_ + 1) * d)
        cb = c_ref[bi, hg * head_block + hh_]
        s = jax.lax.dot_general(
            qblk[:, cs], tk_ref[0][:, cs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s + (tb - cb))
        l_scr[:, hh_:hh_ + 1] = (l_scr[:, hh_:hh_ + 1]
                                 + jnp.sum(p, -1, keepdims=True))
        acc_scr[:, cs] = acc_scr[:, cs] + jax.lax.dot_general(
            p.astype(tv_ref.dtype), tv_ref[0][:, cs],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    denom = jnp.concatenate(
        [jnp.broadcast_to(jnp.maximum(l_scr[:, hh_:hh_ + 1], 1e-37),
                          (block, d))
         for hh_ in range(head_block)], axis=1)
    o_ref[0] = ((acc_scr[...] / denom)
                .astype(o_ref.dtype)
                .reshape(tt, th, tw, hb_d))


@functools.partial(
    jax.jit, static_argnames=("grid3", "heads", "scale", "block",
                              "interpret", "tile", "window", "head_block"))
def _sta_call_ring(q5, kp, vp, txt_k, txt_v, tb, c, grid3, heads, scale,
                   block, interpret, tile, window, head_block=None):
    """Ring-buffer direct-grid STA dispatch (static-bound, bf16 QK).

    q5 [B, T, H, W, hd] row-major; kp/vp [B, S_pad, hd] w-MAJOR tile order
    (_permute_tokens_cols); txt_k/txt_v [B, Ltp, hd]; tb [B, 8, Ltp] text
    key bias; c [B, H] static score bounds. Returns [B, T, H, W, hd]."""
    b = q5.shape[0]
    hd = q5.shape[-1]
    d = hd // heads
    t, h, w = grid3
    tt, th, tw = tile
    wt, wh, ww = window
    gt, gh, gw = _ceil(t, tt), _ceil(h, th), _ceil(w, tw)
    ltp = txt_k.shape[1]
    if head_block is None:
        head_block = _pick_head_block_ring(heads, d, block, window)
    hb_d = head_block * d
    colrows = wt * wh * block

    def qo_idx(bi, hg, ri, cw, c_s):
        return (bi, ri // gh, ri - (ri // gh) * gh, cw, hg)

    qo_spec = pl.BlockSpec((1, tt, th, tw, hb_d), qo_idx)
    tkv_spec = pl.BlockSpec((1, ltp, hb_d),
                            lambda bi, hg, ri, cw, c_s: (bi, 0, hg))
    tb_spec = pl.BlockSpec((1, 8, ltp),
                           lambda bi, hg, ri, cw, c_s: (bi, 0, 0))

    out = pl.pallas_call(
        functools.partial(_sta_ring_kernel, scale=scale, grid3=grid3,
                          tgrid=(gt, gh, gw), tile=tile, window=window,
                          head_block=head_block, d=d, probe=_RING_PROBE),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # c (score bounds)
            grid=(b, heads // head_block, gt * gh, gw),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # kp
                pl.BlockSpec(memory_space=pl.ANY),  # vp
                qo_spec, tkv_spec, tkv_spec, tb_spec,
            ],
            out_specs=qo_spec,
            scratch_shapes=[
                pltpu.VMEM((ww + 1, colrows, hb_d), q5.dtype),  # K ring
                pltpu.VMEM((ww + 1, colrows, hb_d), q5.dtype),  # V ring
                pltpu.VMEM((block, 128), jnp.float32),          # l
                pltpu.VMEM((block, hb_d), jnp.float32),         # acc
                pltpu.SemaphoreType.DMA((ww + 1, 2, wt)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q5.shape, q5.dtype),
        compiler_params=pltpu.CompilerParams(
            # rows/w must execute in issue order (the ring hand-off is a
            # cross-step scratch dependency); b/heads stay parallel.
            # probe="par" measures the arbitrary-semantics cost (ordering
            # unsound in principle — perf diagnosis only).
            dimension_semantics=(("parallel",) * 4 if _RING_PROBE == "par"
                                 else ("parallel", "parallel", "arbitrary",
                                       "arbitrary")),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(c, kp, vp, q5, txt_k, txt_v, tb)
    return out


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "block", "n_slots",
                              "interpret", "slot_block", "head_block"))
def _sta_call(nbr, kb, q, kcat, vcat, heads, scale, block, n_slots,
              interpret, slot_block=None, head_block=None):
    """q [B, S_img_pad, HD] tile-major; kcat/vcat [B, S_img_pad + S_txt_pad,
    HD] (img tile-major ++ txt); kb [B, 8, S_cat] key bias; nbr int32
    [n_tiles, n_slots] block indices (-1 skip)."""
    b, sq, hd = q.shape
    d = hd // heads
    n_tiles = sq // block

    # head grouping: whole-number of head-groups; prefer one big group so
    # each K/V tile is fetched once per (tile, slot) — see _pick_head_block
    if slot_block is None:
        slot_block = 4
    if head_block is None:
        head_block = _pick_head_block(heads, d, block, slot_block)
    n_groups = _ceil(n_slots, slot_block)
    if n_slots % slot_block:
        pad = n_groups * slot_block - n_slots
        nbr = jnp.pad(nbr, ((0, 0), (0, pad)), constant_values=-1)
    grid = (b, heads // head_block, n_tiles, n_groups)

    # invalid slots repeat the previous group's index so their copies are
    # elided by the pipeline's revisiting check (see _dma_indices)
    nbr_dma = _dma_indices(nbr, slot_block)

    hb_d = head_block * d

    def kb_spec(i):
        return pl.BlockSpec(
            (1, 8, block),
            lambda bi, hi, qi, g, nbr_s, dma_s, i=i:
                (bi, 0, dma_s[qi, g * slot_block + i]))

    def kv_spec(i):
        return pl.BlockSpec(
            (1, block, hb_d),
            lambda bi, hi, qi, g, nbr_s, dma_s, i=i:
                (bi, dma_s[qi, g * slot_block + i], hi))

    q_spec = pl.BlockSpec((1, block, hb_d),
                          lambda bi, hi, qi, g, nbr_s, dma_s: (bi, qi, hi))

    out = pl.pallas_call(
        functools.partial(_sta_kernel, scale=scale, n_groups=n_groups,
                          slot_block=slot_block, head_block=head_block, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # nbr (for kernel), nbr_dma (for maps)
            grid=grid,
            in_specs=(
                [kb_spec(i) for i in range(slot_block)]
                + [q_spec]
                + [kv_spec(i) for i in range(slot_block)]
                + [kv_spec(i) for i in range(slot_block)]
            ),
            out_specs=pl.BlockSpec(
                (1, block, hb_d),
                lambda bi, hi, qi, g, nbr_s, dma_s: (bi, qi, hi)),
            scratch_shapes=[pltpu.VMEM((block, 128), jnp.float32),
                            pltpu.VMEM((block, 128), jnp.float32),
                            pltpu.VMEM((block, hb_d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(nbr, nbr_dma, *([kb] * slot_block), q,
      *([kcat] * slot_block), *([vcat] * slot_block))
    return out


def txt_merge_attention(txt_q, kp, vp, img_bias, txt_k, txt_v, txt_bias,
                        c, scale):
    """txt queries attend over [img | txt] as a merge of two partial-softmax
    flash states (img keys read from the padded kp/vp [B, S_pad, H*D]
    already in HBM — any token order works as long as img_bias masks the
    pad positions in the SAME order: full attention is key-order
    invariant; the merge with a SHARED static offset `c` is exact — no
    kcat concat needed). Factored out of the TPU-only direct STA branch so
    interpret-mode tests can oracle the merge on CPU."""
    from .flash_attention import flash_attention, merge_flash_states

    b, _, hh, d = txt_q.shape
    s_pad = kp.shape[1]
    s1 = flash_attention(
        txt_q, kp.reshape(b, s_pad, hh, d), vp.reshape(b, s_pad, hh, d),
        key_bias=img_bias[:, None, None, :], scale=scale,
        bound_mode="static", score_bound=c, return_state=True)
    s2 = flash_attention(
        txt_q, txt_k, txt_v,
        key_bias=(txt_bias if txt_bias is not None else None),
        scale=scale, bound_mode="static", score_bound=c,
        return_state=True)
    txt_out, _, _ = merge_flash_states(s1, s2)
    return txt_out


_STA_RING = False


def set_sta_ring(on: bool) -> None:
    """Default for sta_joint_attention(ring=None) — route the static-bound
    direct path through the manual K/V ring-buffer kernel (_sta_call_ring)
    when the geometry admits it. Read at TRACE time (see
    set_sta_lane_rotate's retrace note). Default set by on-chip
    measurement (docs/KERNELS.md)."""
    global _STA_RING
    _STA_RING = bool(on)


_LANE_ROTATE = False


def set_sta_lane_rotate(on) -> None:
    """Default for sta_joint_attention(lane_rotate=None) — the sliding-
    window K/V dispatch of the direct kernel: False, "grouped"
    (rotation_plan_grouped; True is an alias), or "mega" (rotation_plan).
    Module-level so the production model path needs no plumbing; set by
    measurement (docs/KERNELS.md).

    Read at TRACE time (it selects the dispatched variant inside
    sta_joint_attention): a jit-cached outer step keeps the variant it was
    traced with until a retrace. Flip it BEFORE building the jitted step;
    harnesses that rebuild their jit per measurement are unaffected."""
    global _LANE_ROTATE
    _LANE_ROTATE = on if isinstance(on, str) else bool(on)


def sta_joint_attention(
    img_q: jnp.ndarray,  # [B, S_img, H, D] row-major (t, h, w) tokens
    img_k: jnp.ndarray,
    img_v: jnp.ndarray,
    txt_q: jnp.ndarray,  # [B, Lt, H, D]
    txt_k: jnp.ndarray,
    txt_v: jnp.ndarray,
    txt_bias: Optional[jnp.ndarray],  # [B, 1, 1, Lt]
    grid: Tuple[int, int, int],
    tile: Tuple[int, int, int] = (4, 8, 8),
    window: Tuple[int, int, int] = (3, 3, 3),
    scale: Optional[float] = None,
    bound_mode: str = "auto",
    qk_int8: bool = False,
    slot_block: Optional[int] = None,
    head_block: Optional[int] = None,
    fused: bool = True,
    score_bound: Optional[jnp.ndarray] = None,
    direct: bool = True,
    lane_rotate: Optional[bool] = None,
    ring: Optional[bool] = None,
    img_key_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STA for img queries + dense flash for txt queries.

    direct (static-bound path only): the zero-copy kernel — q read from and
    out written to the row-major token grid via 5D blocks, txt K/V resident
    in the kernel. Eliminates the q permute, the out un-permute, and the
    kcat/vcat concats (~6.5 of ~9.7 GB/layer of plumbing HBM traffic at
    720p); K/V too are read from the row-major grid via 5-d slot blocks
    (r5) — the former tile-major K/V permutes are now a single contiguous
    zero-pad (poison-free edge loads, same DMA granularity per tile).
    direct=False keeps the original permuted+concatenated dispatch
    (parity oracle in tests).
    `fused=False` (an ablation knob of the permuted dispatch) takes
    precedence over `direct`: it routes to the permuted unfused kernel, so
    benchmarking callers always get the variant they asked for.

    lane_rotate (direct path only): the sliding-window K/V dispatch — all
    img slots ride one lane-rotated group (rotation_plan) so consecutive
    q-tiles along w reuse wt*wh*(ww-1)/n_slots of their key DMA via
    Mosaic's revisiting elision. Numerically identical math (slot order
    only permutes commutative softmax folds). None = module default
    (set_sta_lane_rotate).

    img_key_bias: optional ADDITIVE f32 bias [B, S_img] on the img keys
    (row-major token order), folded into every query's softmax — img and
    txt queries alike. Used by ring x STA halo exchange to invalidate the
    cyclic-wrap halo segments on edge ranks
    (parallel/sp_attention._ring_sta_halo); NEG_INF masks a key exactly.

    score_bound: optional precomputed upper bound on |q.k|*scale
    (broadcastable to [B, H]; see ops/flash_attention.flash_attention).
    Skips the per-step Cauchy-Schwarz norm reduction (a full extra HBM
    read of q/k per layer) when the caller derives the bound from the
    QK-RMSNorm weights.

    Returns (img_out [B, S_img, H*D], txt_out [B, Lt, H*D]).

    bound_mode "static" (valid under QK-norm; see ops/flash_attention)
    switches to the static-offset kernel — no running max, pure-add
    accumulators. qk_int8 additionally quantizes QK^T to s8 inside the
    kernel (requires bound_mode="static"; the bound is inflated for the
    rounding error as in flash_attention_int8).
    """
    from .attention import attention

    b, s_img, hh, d = img_q.shape
    lt = txt_q.shape[1]
    scale = scale if scale is not None else d ** -0.5
    interpret = jax.default_backend() != "tpu"
    if qk_int8 and bound_mode != "static":
        raise ValueError("sta qk_int8 requires bound_mode='static' "
                         "(QK-norm score bound)")

    block = tile[0] * tile[1] * tile[2]
    assert block % 8 == 0, "tile token count must be a multiple of 8"
    if not interpret and block % 128 != 0:
        raise ValueError(
            f"STA tile {tile} has {block} tokens; the TPU kernel needs a "
            "multiple of 128 (Pallas lane-dim constraint). Production "
            "tiles (4, 8, 8) = 256 satisfy this; CPU interpret mode "
            "accepts any multiple of 8.")
    def static_bound(txt_keys=True):
        infl = (1.0 + d ** 0.5 / 254.0) ** 2 if qk_int8 else 1.0
        if score_bound is not None:
            return jnp.broadcast_to(
                jnp.asarray(score_bound, jnp.float32), (b, hh)) * infl
        # per-(batch, head) Cauchy-Schwarz score bound over img queries
        # vs ALL keys (img + txt); computed on the un-permuted tensors
        # (the permutation only reorders rows)
        qn = jnp.max(jnp.sqrt(jnp.sum(
            jnp.square(img_q.astype(jnp.float32)), axis=-1)), axis=1)
        kn = jnp.max(jnp.sqrt(jnp.sum(
            jnp.square(img_k.astype(jnp.float32)), axis=-1)), axis=1)
        if txt_keys:
            kn = jnp.maximum(kn, jnp.max(jnp.sqrt(jnp.sum(
                jnp.square(txt_k.astype(jnp.float32)), axis=-1)), axis=1))
        return qn * kn * scale * infl  # [B, H]

    if bound_mode == "static" and direct and fused:
        plan = tile_plan(tuple(grid), tuple(tile), tuple(window), 0)
        rot = _LANE_ROTATE if lane_rotate is None else lane_rotate
        rot = "grouped" if rot is True else (rot or False)

        # ring-buffer dispatch: manual K/V DMA with cross-q-tile window
        # reuse — the geometry gate needs >= wh h-tile rows for the
        # clamped contiguous runs and a ww >= 2 window for the slot-reuse
        # analysis in _sta_ring_kernel; qk_int8 and lane-rotation keep the
        # BlockSpec-driven kernel.
        wt_, wh_, ww_ = window
        gt_g, gh_g, gw_g = (_ceil(grid[0], tile[0]), _ceil(grid[1], tile[1]),
                            _ceil(grid[2], tile[2]))
        use_ring = ((_STA_RING if ring is None else ring)
                    and not rot and not qk_int8
                    and gh_g >= wh_ and ww_ >= 2
                    and slot_block is None
                    # the ring kernel derives its key bias in-kernel from
                    # grid geometry alone — no hook for a caller bias
                    and img_key_bias is None)
        if use_ring:
            pg = (gt_g * tile[0], gh_g * tile[1], gw_g * tile[2])
            kp = _permute_tokens_cols(img_k, grid, tile, pg)
            vp = _permute_tokens_cols(img_v, grid, tile, pg)
            img_bias = jnp.broadcast_to(
                jnp.asarray(_cols_img_bias(tuple(grid), tuple(tile), pg),
                            jnp.float32)[None], (b, kp.shape[1]))

            lane = 8 if interpret else 128
            ltp = _ceil(lt, lane) * lane
            txt_k_f = txt_k.reshape(b, lt, hh * d)
            txt_v_f = txt_v.reshape(b, lt, hh * d)
            tb = (txt_bias.reshape(b, lt).astype(jnp.float32)
                  if txt_bias is not None
                  else jnp.zeros((b, lt), jnp.float32))
            if ltp != lt:
                txt_k_f = jnp.pad(txt_k_f, ((0, 0), (0, ltp - lt), (0, 0)))
                txt_v_f = jnp.pad(txt_v_f, ((0, 0), (0, ltp - lt), (0, 0)))
                tb = jnp.pad(tb, ((0, 0), (0, ltp - lt)),
                             constant_values=NEG_INF)
            tbb = jnp.broadcast_to(tb[:, None, :], (b, 8, ltp))

            c = static_bound()
            q5 = img_q.reshape(b, grid[0], grid[1], grid[2], hh * d)
            out5 = _sta_call_ring(
                q5, kp, vp, txt_k_f, txt_v_f, tbb, c, tuple(grid), hh,
                float(scale), block, interpret, tuple(tile), tuple(window),
                head_block=head_block)
            img_out = out5.reshape(b, s_img, hh * d)

            if interpret:
                full_kb = jnp.concatenate(
                    [jnp.zeros((b, 1, 1, s_img), jnp.float32),
                     txt_bias.astype(jnp.float32) if txt_bias is not None
                     else jnp.zeros((b, 1, 1, lt), jnp.float32)], axis=-1)
                k_all = jnp.concatenate([img_k, txt_k], axis=1)
                v_all = jnp.concatenate([img_v, txt_v], axis=1)
                txt_out = attention(txt_q, k_all, v_all, mode="chunked",
                                    key_bias=full_kb, scale=scale)
                return img_out, txt_out
            txt_out = txt_merge_attention(txt_q, kp, vp, img_bias, txt_k,
                                          txt_v, txt_bias, c, scale)
            return img_out, txt_out
        gate_lane = None
        if rot == "grouped":
            rnbr, rdma, gate_lane = rotation_plan_grouped(
                tuple(grid), tuple(tile), tuple(window))
            nbr = jnp.asarray(rnbr)
            nbr_dma = jnp.asarray(rdma)
        elif rot == "mega":
            rnbr, rdma = rotation_plan(tuple(grid), tuple(tile),
                                       tuple(window))
            nbr = jnp.asarray(rnbr)  # lane-assigned img slots
            nbr_dma = jnp.asarray(rdma)
        elif rot:
            raise ValueError(f"lane_rotate must be False/True/'mega'/"
                             f"'grouped', got {rot!r}")
        else:
            nbr = jnp.asarray(plan["nbr"])  # img-only neighbor slots
            nbr_dma = None
        # r5: K/V stay in the row-major grid, zero-padded to tile-aligned
        # bounds — a contiguous pad instead of two transposing
        # _permute_tokens copies (~15 ms/layer at 720p); the kernel's slot
        # index maps gather neighbor tiles from the 5-d layout directly.
        tgrid = plan["padded_grid"]
        kp5 = _pad_tokens_5d(img_k, grid, tgrid)
        vp5 = _pad_tokens_5d(img_v, grid, tgrid)
        s_pad = tgrid[0] * tgrid[1] * tgrid[2]

        tvalid = np.zeros(tgrid, np.float32)
        tvalid[:grid[0], :grid[1], :grid[2]] = 1.0
        # kernel key bias: TILE-major order (indexed by flat tile inside
        # the kernel); txt-merge bias: row-major (kp5's flat token order)
        kb = jnp.broadcast_to(jnp.asarray(
            np.where(tvalid.reshape(-1)[plan["perm"]] > 0, 0.0, NEG_INF),
            jnp.float32)[None], (b, s_pad))
        img_bias = jnp.broadcast_to(jnp.asarray(
            np.where(tvalid.reshape(-1) > 0, 0.0, NEG_INF),
            jnp.float32)[None], (b, s_pad))
        if img_key_bias is not None:
            ikb = img_key_bias.astype(jnp.float32)
            kb = kb + _permute_tokens(ikb[..., None, None],
                                      grid, tile, plan)[..., 0]
            img_bias = img_bias + _pad_tokens_5d(
                ikb[..., None, None], grid, tgrid).reshape(b, s_pad)
        kb = jnp.broadcast_to(kb[:, None, :], (b, 8, s_pad))

        lane = 8 if interpret else 128
        ltp = _ceil(lt, lane) * lane
        txt_k_f = txt_k.reshape(b, lt, hh * d)
        txt_v_f = txt_v.reshape(b, lt, hh * d)
        tb = (txt_bias.reshape(b, lt).astype(jnp.float32)
              if txt_bias is not None else jnp.zeros((b, lt), jnp.float32))
        if ltp != lt:
            txt_k_f = jnp.pad(txt_k_f, ((0, 0), (0, ltp - lt), (0, 0)))
            txt_v_f = jnp.pad(txt_v_f, ((0, 0), (0, ltp - lt), (0, 0)))
            tb = jnp.pad(tb, ((0, 0), (0, ltp - lt)),
                         constant_values=NEG_INF)
        tbb = jnp.broadcast_to(tb[:, None, :], (b, 8, ltp))

        c = static_bound()
        q5 = img_q.reshape(b, grid[0], grid[1], grid[2], hh * d)
        out5 = _sta_call_nomax_direct(
            nbr, kb, q5, kp5, vp5, txt_k_f, txt_v_f, tbb, c, tuple(grid), hh,
            float(scale), block, plan["n_slots"], interpret, qk_int8,
            tuple(tile),
            # rotation plans fix their own slot grouping — normalize a
            # caller-provided slot_block away so it can neither be silently
            # ignored nor mint redundant jit traces
            slot_block=None if rot else slot_block, head_block=head_block,
            rotate=rot, nbr_dma=nbr_dma, gate_lane=gate_lane,
            qi_sem=os.environ.get("STA_QI_SEM") or None)
        img_out = out5.reshape(b, s_img, hh * d)

        if interpret:
            # CPU tests: the chunked online-softmax path (no Pallas).
            ib_row = (img_key_bias.astype(jnp.float32)[:, None, None, :]
                      if img_key_bias is not None
                      else jnp.zeros((b, 1, 1, s_img), jnp.float32))
            full_kb = jnp.concatenate(
                [ib_row,
                 txt_bias.astype(jnp.float32) if txt_bias is not None
                 else jnp.zeros((b, 1, 1, lt), jnp.float32)], axis=-1)
            k_all = jnp.concatenate([img_k, txt_k], axis=1)
            v_all = jnp.concatenate([img_v, txt_v], axis=1)
            txt_out = attention(txt_q, k_all, v_all, mode="chunked",
                                key_bias=full_kb, scale=scale)
            return img_out, txt_out
        txt_out = txt_merge_attention(
            txt_q, kp5.reshape(b, s_pad, hh * d),
            vp5.reshape(b, s_pad, hh * d), img_bias, txt_k,
            txt_v, txt_bias, c, scale)
        return img_out, txt_out

    txt_pad = _ceil(lt, block) * block
    plan = tile_plan(tuple(grid), tuple(tile), tuple(window), txt_pad)
    nbr = jnp.asarray(plan["nbr"])
    n_slots = plan["n_slots"]

    qp = _permute_tokens(img_q, grid, tile, plan)   # [B, S_pad, HD]
    kp = _permute_tokens(img_k, grid, tile, plan)
    vp = _permute_tokens(img_v, grid, tile, plan)
    s_pad = qp.shape[1]

    txt_k_f = txt_k.reshape(b, lt, hh * d)
    txt_v_f = txt_v.reshape(b, lt, hh * d)
    if txt_pad != lt:
        txt_k_f = jnp.pad(txt_k_f, ((0, 0), (0, txt_pad - lt), (0, 0)))
        txt_v_f = jnp.pad(txt_v_f, ((0, 0), (0, txt_pad - lt), (0, 0)))
    kcat = jnp.concatenate([kp, txt_k_f], axis=1)
    vcat = jnp.concatenate([vp, txt_v_f], axis=1)

    # key bias over the concatenated keys: padded img tokens invalid; text
    # bias from the mask; txt padding invalid
    tgrid = plan["padded_grid"]
    tvalid = np.zeros(tgrid, np.float32)
    tvalid[:grid[0], :grid[1], :grid[2]] = 1.0
    img_bias = np.where(tvalid.reshape(-1)[plan["perm"]] > 0, 0.0, NEG_INF)
    img_bias = jnp.broadcast_to(
        jnp.asarray(img_bias, jnp.float32)[None], (b, s_pad))
    if img_key_bias is not None:
        img_bias = img_bias + _permute_tokens(
            img_key_bias.astype(jnp.float32)[..., None, None],
            grid, tile, plan)[..., 0]
    tb = (txt_bias.reshape(b, lt).astype(jnp.float32) if txt_bias is not None
          else jnp.zeros((b, lt), jnp.float32))
    if txt_pad != lt:
        tb = jnp.pad(tb, ((0, 0), (0, txt_pad - lt)), constant_values=NEG_INF)
    kb = jnp.concatenate([img_bias, tb], axis=1)
    kb = jnp.broadcast_to(kb[:, None, :], (b, 8, kb.shape[1]))

    if bound_mode == "static":
        c = static_bound()
        img_out_p = _sta_call_nomax(nbr, kb, qp, kcat, vcat, c, hh,
                                    float(scale), block, n_slots, interpret,
                                    qk_int8, slot_block=slot_block,
                                    head_block=head_block, fused=fused)
    else:
        img_out_p = _sta_call(nbr, kb, qp, kcat, vcat, hh, float(scale),
                              block, n_slots, interpret,
                              slot_block=slot_block, head_block=head_block)
    img_out = _unpermute_tokens(img_out_p, grid, plan)

    # Text queries: FULL attention over [img | txt]. Reuse the tile-major
    # kcat/vcat already materialized for the STA kernel (full attention is
    # key-order invariant; kb masks the tile-padding and txt-padding keys)
    # — the previous chunked path re-concatenated row-major k/v (2 extra
    # ~700 MB copies at 720p) and ran ~40 ms/layer vs ~6 ms for flash.
    if interpret:
        # CPU tests: the chunked online-softmax path (no Pallas).
        ib_row = (img_key_bias.astype(jnp.float32)[:, None, None, :]
                  if img_key_bias is not None
                  else jnp.zeros((b, 1, 1, s_img), jnp.float32))
        full_kb = jnp.concatenate(
            [ib_row,
             txt_bias.astype(jnp.float32) if txt_bias is not None
             else jnp.zeros((b, 1, 1, lt), jnp.float32)], axis=-1)
        k_all = jnp.concatenate([img_k, txt_k], axis=1)
        v_all = jnp.concatenate([img_v, txt_v], axis=1)
        txt_out = attention(txt_q, k_all, v_all, mode="chunked",
                            key_bias=full_kb, scale=scale)
        return img_out, txt_out
    from .flash_attention import flash_attention
    s_cat = kcat.shape[1]
    txt_out = flash_attention(
        txt_q, kcat.reshape(b, s_cat, hh, d), vcat.reshape(b, s_cat, hh, d),
        key_bias=kb[:, 0][:, None, None, :], scale=scale,
        bound_mode="static" if bound_mode == "static" else "auto",
        score_bound=(c if bound_mode == "static" else None))
    return img_out, txt_out


def sta_reference_mask(grid, tile, window, s_img):
    """Dense boolean mask [S_img, S_img] equivalent to the STA pattern
    (oracle for tests): q attends k iff their tiles are within the window."""
    t, h, w = grid
    tt, th, tw = tile
    wt, wh, ww = window
    coords = np.stack(np.meshgrid(np.arange(t), np.arange(h), np.arange(w),
                                  indexing="ij"), -1).reshape(-1, 3)
    tiles = coords // np.array([tt, th, tw])
    dq = tiles[:, None, :] - tiles[None, :, :]
    half = np.array([wt // 2, wh // 2, ww // 2])
    return (np.abs(dq) <= half).all(-1)


# --------------------------------------------------------------------------
# trainable STA: differentiable gathered form + custom-VJP wrapper
# --------------------------------------------------------------------------

def sta_gathered_attention(img_q, img_k, img_v, txt_q, txt_k, txt_v,
                           txt_bias, *, grid, tile=(4, 8, 8),
                           window=(3, 3, 3), scale=None, tile_chunk=32):
    """Differentiable pure-XLA STA with the SAME tile plan as the kernel.

    Per query tile, the neighbor key/value blocks are GATHERED into a
    [chunk, n_slots*block] key set (plus the replicated text keys) and a
    dense fp32 softmax runs per tile — O(valid pairs) like the kernel, but
    built from jnp gathers/einsums only, so `jax.grad` derives the sparse
    backward automatically (the gather's transpose scatter-adds dk/dv).
    This is the TRAINING form: fine-tuning inherits STA's >10x FLOP cut
    over differentiating dense flash (the reference has no training stack
    at all). `lax.map` over tile chunks bounds the gathered working set.

    Returns (img_out [B, S_img, H*D], txt_out [B, Lt, H*D]) — txt queries
    keep full differentiable attention over [img | txt].
    """
    from .attention import attention

    b, s_img, hh, d = img_q.shape
    lt = txt_q.shape[1]
    scale = scale if scale is not None else d ** -0.5
    block = tile[0] * tile[1] * tile[2]

    plan = tile_plan(tuple(grid), tuple(tile), tuple(window), 0)
    nbr = jnp.asarray(plan["nbr"])              # [n_tiles, n_slots] (img)
    n_tiles, n_slots = plan["n_tiles"], plan["n_slots"]

    qp = _permute_tokens(img_q, grid, tile, plan)
    kp = _permute_tokens(img_k, grid, tile, plan)
    vp = _permute_tokens(img_v, grid, tile, plan)
    hd = hh * d
    qt = qp.reshape(b, n_tiles, block, hd)
    kt = kp.reshape(b, n_tiles, block, hd)
    vt = vp.reshape(b, n_tiles, block, hd)

    # token-validity bias (zero-padded tokens of edge tiles must not be
    # attended as keys) + slot-validity bias, both static host arrays
    tp, hp, wp = plan["padded_grid"]
    tvalid = np.zeros((tp, hp, wp), np.float32)
    tvalid[:grid[0], :grid[1], :grid[2]] = 1.0
    tok_bias = np.where(tvalid.reshape(-1)[plan["perm"]] > 0, 0.0, NEG_INF)
    tok_bias = jnp.asarray(tok_bias, jnp.float32).reshape(n_tiles, block)
    slot_bias = jnp.where(nbr >= 0, 0.0, NEG_INF).astype(jnp.float32)
    idx = jnp.maximum(nbr, 0)

    tb_row = (txt_bias.reshape(b, lt).astype(jnp.float32)
              if txt_bias is not None else jnp.zeros((b, lt), jnp.float32))

    nc = _ceil(n_tiles, tile_chunk)
    pad_tiles = nc * tile_chunk - n_tiles
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    if pad_tiles:
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((pad_tiles,), jnp.int32)])
    tile_ids = tile_ids.reshape(nc, tile_chunk)

    def one_chunk(ids):                          # ids [C]
        nb = idx[ids]                            # [C, n_slots]
        q_c = qt[:, ids].reshape(b, -1, block, hh, d)
        kg = kt[:, nb].reshape(b, -1, n_slots * block, hh, d)
        vg = vt[:, nb].reshape(b, -1, n_slots * block, hh, d)
        # bias per gathered key: token validity of the SOURCE tile + slot
        # validity of this (tile, slot)
        kb = (tok_bias[nb] + slot_bias[ids][..., None]
              ).reshape(ids.shape[0], n_slots * block)   # [C, S_k]
        s_img_scores = jnp.einsum(
            "bcqhd,bckhd->bchqk", q_c.astype(jnp.float32),
            kg.astype(jnp.float32)) * scale
        s_img_scores = s_img_scores + kb[None, :, None, None, :]
        s_txt = jnp.einsum(
            "bcqhd,blhd->bchql", q_c.astype(jnp.float32),
            txt_k.astype(jnp.float32)) * scale
        s_txt = s_txt + tb_row[:, None, None, None, :]
        s = jnp.concatenate([s_img_scores, s_txt], axis=-1)
        p = jax.nn.softmax(s, axis=-1)
        p_img = p[..., :n_slots * block].astype(vg.dtype)
        p_txt = p[..., n_slots * block:].astype(txt_v.dtype)
        o = (jnp.einsum("bchqk,bckhd->bcqhd", p_img, vg)
             + jnp.einsum("bchql,blhd->bcqhd", p_txt, txt_v))
        return o.reshape(b, -1, block, hd).astype(img_q.dtype)

    out_chunks = jax.lax.map(one_chunk, tile_ids)     # [nc, B, C, blk, hd]
    out_t = jnp.moveaxis(out_chunks, 0, 1).reshape(b, nc * tile_chunk,
                                                   block, hd)[:, :n_tiles]
    img_out = _unpermute_tokens(out_t.reshape(b, n_tiles * block, hd),
                                grid, plan, tile)

    # txt queries: full differentiable attention over [img | txt]
    full_kb = jnp.concatenate(
        [jnp.zeros((b, 1, 1, s_img), jnp.float32),
         tb_row[:, None, None, :]], axis=-1)
    k_all = jnp.concatenate([img_k, txt_k], axis=1)
    v_all = jnp.concatenate([img_v, txt_v], axis=1)
    txt_out = attention(txt_q, k_all, v_all,
                        mode="chunked" if s_img > 8192 else "sdpa",
                        key_bias=full_kb, scale=scale)
    return img_out, txt_out


@functools.lru_cache(maxsize=32)
def _make_sta_trainable(grid, tile, window, scale, bound_mode, qk_int8,
                        has_bias, has_bound):
    """custom-VJP STA: kernel forward, gathered-form backward.

    Forward value comes from `sta_joint_attention` (the Pallas kernel
    path); gradients come from `jax.vjp` of `sta_gathered_attention` over
    the saved inputs (flash-style rematerialization — both compute the
    same math, so the cotangents are the sparse attention gradients).
    score_bound only shifts the kernel's exponent offset; the output is
    mathematically invariant to it, so its cotangent is zero."""

    def primal(iq, ik, iv, tq, tk, tv, tb, sb):
        return sta_joint_attention(
            iq, ik, iv, tq, tk, tv, tb if has_bias else None,
            grid=grid, tile=tile, window=window, scale=scale,
            bound_mode=bound_mode, qk_int8=qk_int8,
            score_bound=sb if has_bound else None)

    f = jax.custom_vjp(primal)

    def fwd(iq, ik, iv, tq, tk, tv, tb, sb):
        return primal(iq, ik, iv, tq, tk, tv, tb, sb), \
            (iq, ik, iv, tq, tk, tv, tb, sb)

    def bwd(res, ct):
        iq, ik, iv, tq, tk, tv, tb, sb = res
        _, vjp = jax.vjp(
            lambda a, bq, c, dd, e, g: sta_gathered_attention(
                a, bq, c, dd, e, g, tb if has_bias else None,
                grid=grid, tile=tile, window=window, scale=scale),
            iq, ik, iv, tq, tk, tv)
        giq, gik, giv, gtq, gtk, gtv = vjp(ct)
        return (giq, gik, giv, gtq, gtk, gtv, jnp.zeros_like(tb),
                jnp.zeros_like(sb))

    f.defvjp(fwd, bwd)
    return f


def sta_joint_attention_trainable(img_q, img_k, img_v, txt_q, txt_k, txt_v,
                                  txt_bias, *, grid, tile=(4, 8, 8),
                                  window=(3, 3, 3), scale=None,
                                  bound_mode="auto", qk_int8=False,
                                  score_bound=None):
    """sta_joint_attention with a sparse backward: identical forward (the
    Pallas kernel dispatch), differentiable via the gathered form. This is
    what `joint_attention(mode="sta")` routes through, so fine-tuning with
    STA simply works (ops/attention.py)."""
    f = _make_sta_trainable(
        tuple(grid), tuple(tile), tuple(window),
        None if scale is None else float(scale), bound_mode, bool(qk_int8),
        txt_bias is not None, score_bound is not None)
    tb = (txt_bias if txt_bias is not None
          else jnp.zeros((img_q.shape[0], 1, 1, txt_q.shape[1]),
                         jnp.float32))
    sb = (score_bound if score_bound is not None
          else jnp.zeros((), jnp.float32))
    return f(img_q, img_k, img_v, txt_q, txt_k, txt_v, tb, sb)

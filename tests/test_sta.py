"""Sliding Tile Attention vs dense masked-SDPA oracle (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.ops.attention import (sdpa_attention,
                                                       text_key_bias)
from hunyuanvideo_efficiency_tpu.ops.sta import (sta_joint_attention,
                                                 sta_reference_mask,
                                                 tile_plan)

NEG_INF = -1e30


def _data(grid, lt, h=2, d=128, seed=0):
    b = 1
    s = grid[0] * grid[1] * grid[2]
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    img = [jax.random.normal(k, (b, s, h, d), jnp.float32) * 0.5
           for k in ks[:3]]
    txt = [jax.random.normal(k, (b, lt, h, d), jnp.float32) * 0.5
           for k in ks[3:]]
    mask = jnp.asarray(np.random.RandomState(seed).rand(b, lt) > 0.3,
                       jnp.int32).at[:, 0].set(1)
    return img, txt, text_key_bias(mask)


def _oracle(img, txt, tb, grid, tile, window):
    """Dense attention with the STA tile-window mask for img queries and
    full attention for txt queries."""
    img_q, img_k, img_v = img
    txt_q, txt_k, txt_v = txt
    b, s, h, d = img_q.shape
    lt = txt_q.shape[1]
    m = sta_reference_mask(grid, tile, window, s)  # [S, S]
    img_img_bias = jnp.where(jnp.asarray(m), 0.0, NEG_INF)[None, None]
    # img queries: keys = [img (windowed) | txt (bias by mask)]
    bias_q_img = jnp.concatenate(
        [jnp.broadcast_to(img_img_bias, (b, 1, s, s)),
         jnp.broadcast_to(tb, (b, 1, 1, lt)) * jnp.ones((b, 1, s, lt))],
        axis=-1)
    k_all = jnp.concatenate([img_k, txt_k], axis=1)
    v_all = jnp.concatenate([img_v, txt_v], axis=1)
    img_out = sdpa_attention(img_q, k_all, v_all, bias=bias_q_img)
    bias_txt = jnp.concatenate(
        [jnp.zeros((b, 1, 1, s), jnp.float32), tb.astype(jnp.float32)],
        axis=-1)
    txt_out = sdpa_attention(txt_q, k_all, v_all, bias=bias_txt)
    return img_out, txt_out


@pytest.mark.parametrize("grid,tile,window", [
    ((4, 8, 8), (2, 4, 4), (3, 3, 3)),   # even grid
    ((3, 9, 10), (2, 4, 4), (3, 3, 3)),  # ragged grid -> padding path
    ((4, 8, 8), (2, 4, 4), (1, 3, 3)),   # anisotropic window
])
def test_sta_matches_masked_oracle(grid, tile, window):
    img, txt, tb = _data(grid, lt=24)
    got_img, got_txt = sta_joint_attention(
        *img, *txt, tb, grid=grid, tile=tile, window=window)
    want_img, want_txt = _oracle(img, txt, tb, grid, tile, window)
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("qk_int8", [False, True])
def test_sta_static_offset_matches_oracle(qk_int8):
    # bound_mode="static" (no running max; optional in-kernel int8 QK) must
    # track the masked oracle; this is the path cfg.qk_norm enables
    grid, tile, window = (3, 9, 10), (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=1)
    got_img, got_txt = sta_joint_attention(
        *img, *txt, tb, grid=grid, tile=tile, window=window,
        bound_mode="static", qk_int8=qk_int8)
    want_img, want_txt = _oracle(img, txt, tb, grid, tile, window)
    tol = 2.5e-2 if qk_int8 else 2e-3  # int8 QK^T rounding
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt),
                               rtol=2e-3, atol=2e-3)


def test_sta_int8_requires_static_bound():
    grid = (4, 8, 8)
    img, txt, tb = _data(grid, lt=24)
    with pytest.raises(ValueError):
        sta_joint_attention(*img, *txt, tb, grid=grid, tile=(2, 4, 4),
                            window=(3, 3, 3), qk_int8=True)


def test_sta_int8_dit_forward_dispatch():
    # attn_mode="sta_int8" end-to-end through dit_forward: close to the
    # attn_mode="sta" output (same sparsity, int8-rounded QK^T)
    from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward,
                                                        init_dit_params)
    from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    kw = dict(hidden_size=128, heads_num=4,
              mm_double_blocks_depth=1, mm_single_blocks_depth=1,
              rope_dim_list=(8, 12, 12), text_states_dim=64,
              text_states_dim_2=32, sta_tile=(2, 4, 4),
              sta_window=(3, 3, 3), sta_dense_double_blocks=0,
              sta_dense_single_blocks=0)
    cfg8 = DiTConfig(attn_mode="sta_int8", **kw)
    cfg = DiTConfig(attn_mode="sta", **kw)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    x = jax.random.normal(ks[0], (1, 16, 4, 16, 12), jnp.float32)
    t = jnp.full((1,), 500.0)
    pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32)
    pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (4, 8, 6),
                                       theta=cfg.rope_theta)
    ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
    out = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg8)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.05, f"sta_int8 rel err too large: {err / scale}"
    assert np.isfinite(np.asarray(out)).all()


def test_sta_head_groups_match_ungrouped():
    # attn_head_chunks > 1 on the split img/txt (STA) path: per-head-group
    # qkv column slices + row-sliced projections must reproduce the
    # all-heads-at-once result exactly (same math, smaller working set —
    # the restructure that lets 720p STA fit HBM)
    from dataclasses import replace

    from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward,
                                                        init_dit_params)
    from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    cfg = DiTConfig(hidden_size=128, heads_num=4,
                    mm_double_blocks_depth=1, mm_single_blocks_depth=1,
                    rope_dim_list=(8, 12, 12), text_states_dim=64,
                    text_states_dim_2=32, attn_mode="sta",
                    sta_tile=(2, 4, 4), sta_window=(3, 3, 3),
                    sta_dense_double_blocks=0, sta_dense_single_blocks=0)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(ks[0], (1, 16, 4, 16, 12), jnp.float32)
    t = jnp.full((1,), 500.0)
    pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32)
    pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (4, 8, 6),
                                       theta=cfg.rope_theta)
    ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
    out = dit_forward(params, x, t, pe, mask, pe2, cos, sin,
                      cfg=replace(cfg, attn_head_chunks=2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tile_plan_neighbor_counts():
    # tile grid (4, 4, 4): has interior tiles
    plan = tile_plan((8, 16, 16), (2, 4, 4), (3, 3, 3), 32)
    nbr = plan["nbr"]
    # interior tile has full 27 neighbors + 1 text block
    assert (nbr >= 0).sum(axis=1).max() == 28
    # corner tile has 8 neighbors + 1 text block
    assert (nbr >= 0).sum(axis=1).min() == 9
    assert plan["n_slots"] == 28


def test_sta_flops_note():
    """Sanity: sparse slot count is far below the dense tile count at
    production scale (the speedup driver)."""
    plan = tile_plan((33, 34, 60), (4, 8, 8), (3, 3, 3), 256)
    dense_tiles = plan["n_tiles"]
    assert plan["n_slots"] <= 28
    assert dense_tiles > 300  # 10x+ reduction vs dense


@pytest.mark.parametrize("grid", [
    (3, 9, 10),   # ragged in every axis -> partial edge blocks
    (4, 8, 8),    # exact tiling
])
def test_sta_direct_matches_permuted(grid):
    # the zero-copy direct-grid kernel (q/out live in the row-major token
    # grid; txt K/V resident operands) must match the original
    # permuted+concatenated dispatch bit-for-bit up to fp32 fold order
    tile, window = (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=2)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static")
    d_img, d_txt = sta_joint_attention(*img, *txt, tb, direct=True, **kw)
    p_img, p_txt = sta_joint_attention(*img, *txt, tb, direct=False, **kw)
    np.testing.assert_allclose(np.asarray(d_img), np.asarray(p_img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_txt), np.asarray(p_txt),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grid", [
    (3, 9, 10),   # ragged in every axis -> partial edge blocks
    (4, 8, 8),    # exact tiling
])
@pytest.mark.parametrize("qk_int8", [False, True])
@pytest.mark.parametrize("mode", ["mega", "grouped"])
def test_sta_lane_rotate_matches_permuted(grid, qk_int8, mode):
    # the sliding-window (lane-rotation) dispatches only permute the slot
    # order of commutative softmax folds — they must match the permuted
    # oracle path like the plain direct kernel does
    tile, window = (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=3)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static",
              qk_int8=qk_int8)
    r_img, r_txt = sta_joint_attention(*img, *txt, tb, direct=True,
                                       lane_rotate=mode, **kw)
    p_img, p_txt = sta_joint_attention(*img, *txt, tb, direct=False, **kw)
    tol = 5e-2 if qk_int8 else 1e-5
    np.testing.assert_allclose(np.asarray(r_img), np.asarray(p_img),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(r_txt), np.asarray(p_txt),
                               rtol=tol, atol=tol)


def test_rotation_plan_slides_one_column_per_step():
    # along a w-row sweep, exactly wt*wh lanes may change their DMA index
    # per step (the leading column); all other lanes keep the same index so
    # Mosaic's revisiting check elides their copies — this IS the sliding
    # window, so regressions here silently triple the kernel's key DMA
    from hunyuanvideo_efficiency_tpu.ops.sta import rotation_plan
    grid, tile, window = (8, 8, 32), (2, 4, 4), (3, 3, 3)
    nbr, dma = rotation_plan(grid, tile, window)
    gt, gh, gw = 4, 2, 8
    wt, wh, ww = window
    assert nbr.shape == (gt * gh * gw, wt * wh * ww)
    assert dma.shape == (gt * gh * gw, 2 * wt * wh * ww)
    # txt-step columns repeat the img lanes (window survives the txt step)
    np.testing.assert_array_equal(dma[:, wt * wh * ww:], dma[:, :wt * wh * ww])
    for i in range(1, gt * gh * gw):
        if i % gw == 0:
            continue  # row restart: full refetch allowed
        changed = int((dma[i, :wt * wh * ww] != dma[i - 1, :wt * wh * ww])
                      .sum())
        assert changed <= wt * wh, (i, changed)
    # the lane tables must cover exactly the tile_plan neighbor sets
    plan = tile_plan(grid, tile, window, 0)
    for i in range(gt * gh * gw):
        assert (set(nbr[i][nbr[i] >= 0].tolist())
                == set(plan["nbr"][i][plan["nbr"][i] >= 0].tolist())), i


def test_rotation_plan_grouped_boundary_elision():
    # the grouped layout's contract: the LAST img group of tile w, the txt
    # step, and the FIRST group of tile w+1 carry identical lane indices
    # (col w+1), so Mosaic elides that group's fetches across the boundary
    from hunyuanvideo_efficiency_tpu.ops.sta import rotation_plan_grouped
    grid, tile, window = (8, 8, 32), (2, 4, 4), (3, 3, 3)
    nbr, dma, gate_lane = rotation_plan_grouped(grid, tile, window)
    gt, gh, gw = 4, 2, 8
    wt, wh, ww = window
    L = wt * wh
    assert nbr.shape == (gt * gh * gw, ww * L)
    assert dma.shape == (gt * gh * gw, (ww + 1) * L)
    assert gate_lane == (wt // 2) * wh + (wh // 2)
    # txt step repeats the last img group
    np.testing.assert_array_equal(dma[:, ww * L:], dma[:, (ww - 1) * L:ww * L])
    for i in range(1, gt * gh * gw):
        if i % gw == 0:
            continue
        # boundary handoff: first group of tile i == last group of tile i-1
        np.testing.assert_array_equal(dma[i, :L], dma[i - 1, ww * L:],
                                      err_msg=str(i))
    # gate_lane validity == "column exists": group g of tile (.., cw)
    # is gated off exactly when cw + dc is out of grid
    dcs = [0, -1, 1]
    for i in range(gt * gh * gw):
        cw = i % gw
        for g, dc in enumerate(dcs):
            valid = 0 <= cw + dc < gw
            assert (nbr[i, g * L + gate_lane] >= 0) == valid, (i, g)
    # coverage: same neighbor sets as tile_plan
    plan = tile_plan(grid, tile, window, 0)
    for i in range(gt * gh * gw):
        assert (set(nbr[i][nbr[i] >= 0].tolist())
                == set(plan["nbr"][i][plan["nbr"][i] >= 0].tolist())), i


def test_txt_merge_attention_matches_dense_oracle():
    """Interpret-mode oracle for the TPU-only txt path of the direct STA
    branch (sta.py: txt_merge_attention — two flash states with a shared
    static offset merged via merge_flash_states). On CPU the direct branch
    returns the chunked fallback instead, so this drives the merge helper
    itself against dense full attention over [img | txt]."""
    from hunyuanvideo_efficiency_tpu.ops.sta import (_permute_tokens,
                                                     txt_merge_attention)

    grid, tile, window = (3, 9, 10), (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=4)
    img_q, img_k, img_v = img
    txt_q, txt_k, txt_v = txt
    b, s, h, d = img_q.shape

    plan = tile_plan(grid, tile, window, 0)
    kp = _permute_tokens(img_k, grid, tile, plan)
    vp = _permute_tokens(img_v, grid, tile, plan)
    s_pad = kp.shape[1]
    tgrid = plan["padded_grid"]
    tvalid = np.zeros(tgrid, np.float32)
    tvalid[:grid[0], :grid[1], :grid[2]] = 1.0
    img_bias = np.where(tvalid.reshape(-1)[plan["perm"]] > 0, 0.0, NEG_INF)
    img_bias = jnp.broadcast_to(
        jnp.asarray(img_bias, jnp.float32)[None], (b, s_pad))

    # shared static score bound (Cauchy-Schwarz over all keys), as the
    # direct branch computes it
    scale = d ** -0.5
    qn = jnp.max(jnp.linalg.norm(txt_q, axis=-1), axis=1)
    kn = jnp.maximum(jnp.max(jnp.linalg.norm(img_k, axis=-1), axis=1),
                     jnp.max(jnp.linalg.norm(txt_k, axis=-1), axis=1))
    c = qn * kn * scale  # [B, H]

    out = txt_merge_attention(txt_q, kp, vp, img_bias, txt_k, txt_v, tb,
                              c, scale)

    k_all = jnp.concatenate([img_k, txt_k], axis=1)
    v_all = jnp.concatenate([img_v, txt_v], axis=1)
    bias_txt = jnp.concatenate(
        [jnp.zeros((b, 1, 1, s), jnp.float32), tb.astype(jnp.float32)],
        axis=-1)
    ref = sdpa_attention(txt_q, k_all, v_all, bias=bias_txt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("grid", [(3, 9, 10), (4, 8, 8)])
def test_sta_direct_qk_int8_close_to_fp(grid):
    """qk_int8 in the DIRECT kernel (incl. the row_valid iota masking that
    zeroes pad q rows before the tile-wide absmax on ragged edge tiles)
    must stay close to the fp path. Looser tolerance: s8 QK^T rounding."""
    tile, window = (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=3)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static")
    ref_img, _ = sta_joint_attention(*img, *txt, tb, direct=True,
                                     qk_int8=False, **kw)
    q_img, _ = sta_joint_attention(*img, *txt, tb, direct=True,
                                   qk_int8=True, **kw)
    ref_img, q_img = np.asarray(ref_img), np.asarray(q_img)
    assert np.isfinite(q_img).all()
    err = np.abs(q_img - ref_img).max() / (np.abs(ref_img).max() + 1e-9)
    assert err < 0.05, err


def test_sta_fused_false_still_selects_unfused_kernel():
    """`fused=False` must route to the permuted unfused dispatch even with
    the direct=True default (ablation callers rely on it)."""
    grid, tile, window = (4, 8, 8), (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=5)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static")
    a_img, a_txt = sta_joint_attention(*img, *txt, tb, fused=False, **kw)
    b_img, b_txt = sta_joint_attention(*img, *txt, tb, direct=False,
                                       fused=False, **kw)
    np.testing.assert_allclose(np.asarray(a_img), np.asarray(b_img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_txt), np.asarray(b_txt),
                               rtol=1e-5, atol=1e-5)


class TestTrainableSTA:
    """Sparse backward: gathered differentiable form + custom-VJP wrapper
    (fine-tuning inherits STA's FLOP cut; VERDICT r3 stretch item)."""

    GRID, TILE, WINDOW = (3, 9, 10), (2, 4, 4), (3, 3, 3)

    def test_gathered_forward_matches_oracle(self):
        from hunyuanvideo_efficiency_tpu.ops.sta import (
            sta_gathered_attention)

        img, txt, tb = _data(self.GRID, lt=24, seed=6)
        g_img, g_txt = sta_gathered_attention(
            *img, *txt, tb, grid=self.GRID, tile=self.TILE,
            window=self.WINDOW, tile_chunk=7)
        o_img, o_txt = _oracle(img, txt, tb, self.GRID, self.TILE,
                               self.WINDOW)
        np.testing.assert_allclose(np.asarray(g_img), np.asarray(o_img),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g_txt), np.asarray(o_txt),
                                   rtol=2e-3, atol=2e-3)

    def test_gathered_grads_match_oracle(self):
        from hunyuanvideo_efficiency_tpu.ops.sta import (
            sta_gathered_attention)

        img, txt, tb = _data(self.GRID, lt=24, seed=7)
        w1 = jax.random.normal(jax.random.PRNGKey(9),
                               (1, 1, img[0].shape[2] * img[0].shape[3]))

        def loss_g(iq, ik, iv, tq, tk, tv):
            a, b2 = sta_gathered_attention(
                iq, ik, iv, tq, tk, tv, tb, grid=self.GRID,
                tile=self.TILE, window=self.WINDOW, tile_chunk=8)
            return jnp.sum(a * w1) + 0.5 * jnp.sum(b2 * w1)

        def loss_o(iq, ik, iv, tq, tk, tv):
            a, b2 = _oracle((iq, ik, iv), (tq, tk, tv), tb, self.GRID,
                            self.TILE, self.WINDOW)
            return jnp.sum(a * w1) + 0.5 * jnp.sum(b2 * w1)

        g_g = jax.grad(loss_g, argnums=(0, 1, 2, 3, 4, 5))(*img, *txt)
        g_o = jax.grad(loss_o, argnums=(0, 1, 2, 3, 4, 5))(*img, *txt)
        for a, b2 in zip(g_g, g_o):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=5e-3, atol=5e-3)

    def test_trainable_wrapper_forward_and_grads(self):
        from hunyuanvideo_efficiency_tpu.ops.sta import (
            sta_gathered_attention, sta_joint_attention_trainable)

        img, txt, tb = _data(self.GRID, lt=24, seed=8)
        kw = dict(grid=self.GRID, tile=self.TILE, window=self.WINDOW)
        f_img, f_txt = sta_joint_attention_trainable(*img, *txt, tb,
                                                     bound_mode="static",
                                                     **kw)
        k_img, k_txt = sta_joint_attention(*img, *txt, tb,
                                           bound_mode="static", **kw)
        np.testing.assert_allclose(np.asarray(f_img), np.asarray(k_img),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_txt), np.asarray(k_txt),
                                   rtol=1e-5, atol=1e-5)

        def loss_t(iq, ik, iv):
            a, b2 = sta_joint_attention_trainable(
                iq, ik, iv, *txt, tb, bound_mode="static", **kw)
            return jnp.sum(a ** 2) + jnp.sum(b2 ** 2)

        def loss_g(iq, ik, iv):
            a, b2 = sta_gathered_attention(iq, ik, iv, *txt, tb, **kw)
            return jnp.sum(a ** 2) + jnp.sum(b2 ** 2)

        g_t = jax.grad(loss_t, argnums=(0, 1, 2))(*img)
        g_g = jax.grad(loss_g, argnums=(0, 1, 2))(*img)
        for a, b2 in zip(g_t, g_g):
            # fwd comes from the kernel, cotangents from the gathered form:
            # identical math, fp fold order differs
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=2e-3, atol=2e-3)

    def test_dit_sta_forward_differentiates(self):
        """jax.grad through a tiny DiT with attn_mode='sta' (the
        joint_attention route) produces finite nonzero grads."""
        from dataclasses import replace

        from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward,
                                                            init_dit_params)
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
        from hunyuanvideo_efficiency_tpu.ops.rope import (
            get_nd_rotary_pos_embed)

        cfg = DiTConfig(hidden_size=64, heads_num=2,
                        mm_double_blocks_depth=1, mm_single_blocks_depth=1,
                        rope_dim_list=(8, 12, 12), text_states_dim=32,
                        text_states_dim_2=16, attn_mode="sta",
                        sta_tile=(2, 4, 4), sta_window=(3, 3, 3))
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        # zero-init gates block gradient flow to qkv (reference zero-init
        # behavior); randomize them so the attention branch carries grads
        rk = iter(jax.random.split(jax.random.PRNGKey(42), 8))
        for stack in (params["double_blocks"], params["single_blocks"]):
            for mk in ("modulation", "img_mod", "txt_mod"):
                if mk in stack:
                    k = stack[mk]["kernel"]
                    stack[mk]["kernel"] = 0.05 * jax.random.normal(
                        next(rk), k.shape, k.dtype)
        for leaf in ("linear", "adaLN_modulation"):
            k = params["final_layer"][leaf]["kernel"]
            params["final_layer"][leaf]["kernel"] = (
                0.05 * jax.random.normal(next(rk), k.shape, k.dtype))
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        x = jax.random.normal(ks[0], (1, 16, 4, 16, 12), jnp.float32)
        t = jnp.full((1,), 500.0)
        pe = jax.random.normal(ks[1], (1, 8, 32), jnp.float32)
        mask = jnp.ones((1, 8), jnp.int32)
        pe2 = jax.random.normal(ks[2], (1, 16), jnp.float32)
        cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (4, 8, 6),
                                           theta=cfg.rope_theta)

        def loss(p):
            out = dit_forward(p, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
            return jnp.mean(out ** 2)

        grads = jax.grad(loss)(params)
        qkv_g = grads["double_blocks"]["img_attn_qkv"]["kernel"]
        assert np.isfinite(np.asarray(qkv_g)).all()
        assert float(jnp.max(jnp.abs(qkv_g))) > 0


@pytest.mark.parametrize("grid", [
    (3, 12, 10),   # ragged t/w -> partial tiles; gh=3 (ring minimum)
    (4, 16, 16),   # exact tiling everywhere
    (2, 12, 4),    # gw=1: the w window fully clamped
    (5, 20, 7),    # ragged h/w, gh=5, gw=2 (prologue-only pipeline)
])
def test_sta_ring_matches_permuted(grid):
    # the manual K/V ring-buffer kernel (explicit double-buffered column
    # DMA, no neighbor tables) only reorders commutative softmax folds —
    # it must match the permuted oracle path like the direct kernel does
    tile, window = (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=4)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static")
    r_img, r_txt = sta_joint_attention(*img, *txt, tb, ring=True, **kw)
    p_img, p_txt = sta_joint_attention(*img, *txt, tb, direct=False, **kw)
    np.testing.assert_allclose(np.asarray(r_img), np.asarray(p_img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_txt), np.asarray(p_txt),
                               rtol=1e-5, atol=1e-5)


def test_sta_ring_matches_masked_oracle():
    # end-to-end against the dense masked-SDPA oracle (not just the other
    # kernel): ragged grid, anisotropic window with wt=1
    grid, tile, window = (3, 13, 9), (2, 4, 4), (1, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=5)
    got_img, got_txt = sta_joint_attention(
        *img, *txt, tb, grid=grid, tile=tile, window=window,
        bound_mode="static", ring=True)
    want_img, want_txt = _oracle(img, txt, tb, grid, tile, window)
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt),
                               rtol=2e-3, atol=2e-3)


def test_sta_ring_head_groups_match_ungrouped():
    grid, tile, window = (3, 12, 8), (2, 4, 4), (3, 3, 3)
    img, txt, tb = _data(grid, lt=24, seed=6)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static",
              ring=True)
    full = sta_joint_attention(*img, *txt, tb, head_block=2, **kw)
    grouped = sta_joint_attention(*img, *txt, tb, head_block=1, **kw)
    np.testing.assert_allclose(np.asarray(grouped[0]), np.asarray(full[0]),
                               rtol=1e-5, atol=1e-5)


def test_sta_ring_geometry_fallback():
    # gh < wh cannot run the clamped contiguous h-runs: ring=True must
    # silently fall back to the BlockSpec direct kernel, same numerics
    grid, tile, window = (3, 8, 10), (2, 4, 4), (3, 3, 3)  # gh=2 < 3
    img, txt, tb = _data(grid, lt=24, seed=7)
    kw = dict(grid=grid, tile=tile, window=window, bound_mode="static")
    r = sta_joint_attention(*img, *txt, tb, ring=True, **kw)
    d = sta_joint_attention(*img, *txt, tb, ring=False, **kw)
    np.testing.assert_allclose(np.asarray(r[0]), np.asarray(d[0]),
                               rtol=1e-6, atol=1e-6)

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

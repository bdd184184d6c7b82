"""Flash attention custom VJP vs autodiff-of-SDPA oracle (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.ops.attention import (padding_key_bias,
                                                       sdpa_attention)
from hunyuanvideo_efficiency_tpu.ops.flash_backward import flash_attention_vjp


def _data(b=2, s=160, h=2, d=128, txt=24, seed=0):
    key = jax.random.PRNGKey(seed)
    q, k, v = [jax.random.normal(kk, (b, s, h, d), jnp.float32) * 0.5
               for kk in jax.random.split(key, 3)]
    if txt == 0:
        return q, k, v, None
    mask = jnp.asarray(np.random.RandomState(seed).rand(b, txt) > 0.3,
                       jnp.int32).at[:, 0].set(1)
    bias = padding_key_bias(mask, s - txt)
    return q, k, v, bias


class TestFlashVJP:
    @pytest.mark.parametrize("s,bq,bk", [
        (160, 128, 128),   # n_sub=1 path (block_k % 256 != 0)
        (330, 128, 256),   # n_sub=2 sub-tiled path + ragged key padding
    ])
    def test_forward_matches_sdpa(self, s, bq, bk):
        q, k, v, bias = _data(s=s)
        out = flash_attention_vjp(q, k, v, bias, None, None, bq, bk)
        ref = sdpa_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("s", [128, 200])
    def test_grads_match_sdpa_autodiff(self, s):
        q, k, v, bias = _data(s=s)

        def loss_flash(q, k, v):
            o = flash_attention_vjp(q, k, v, bias, None, None, 128, 128)
            return jnp.sum(jnp.sin(o) * 0.1)

        def loss_ref(q, k, v):
            o = sdpa_attention(q, k, v, bias=bias)
            return jnp.sum(jnp.sin(o) * 0.1)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3,
                err_msg=f"d{name} mismatch")

    def test_no_bias_grads(self):
        q, k, v, _ = _data(s=128, txt=0)

        def f(q, k, v):
            return jnp.sum(flash_attention_vjp(q, k, v, None, None,
                                               None, 128, 128) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(sdpa_attention(q, k, v) ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-3, atol=5e-3)


def test_dit_training_grad_through_flash():
    """Full DiT flow-match loss differentiates through the flash VJP path
    (tiny shapes, interpret mode) and matches the sdpa-mode gradients."""
    from dataclasses import replace

    from hunyuanvideo_efficiency_tpu.models.dit import (init_dit_params,
                                                        patchify_raw)
    from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
    from hunyuanvideo_efficiency_tpu.training import flow_match_loss

    cfg = DiTConfig(hidden_size=128, heads_num=1, mm_double_blocks_depth=1,
                    mm_single_blocks_depth=1, rope_dim_list=(32, 48, 48),
                    text_states_dim=32, text_states_dim_2=16,
                    attn_mode="sdpa")
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    # flow_match_loss runs on token-form latents (parallel/sp_dit.py layout)
    x0 = patchify_raw(
        jax.random.normal(ks[0], (1, 16, 2, 4, 4), jnp.float32),
        cfg.patch_size)
    noise = jax.random.normal(ks[1], x0.shape, jnp.float32)
    t = jnp.full((1,), 0.4, jnp.float32)
    pe = jax.random.normal(ks[2], (1, 8, 32), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32)
    pe2 = jax.random.normal(ks[3], (1, 16), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (2, 2, 2),
                                       theta=cfg.rope_theta)

    def loss(params, mode):
        return flow_match_loss(params, x0, noise, t, pe, mask, pe2,
                               cos, sin, None, replace(cfg, attn_mode=mode))

    g_sdpa = jax.grad(lambda p: loss(p, "sdpa"))(params)
    g_flash = jax.grad(lambda p: loss(p, "flash"))(params)
    for a, b in zip(jax.tree.leaves(g_sdpa), jax.tree.leaves(g_flash)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


class TestFlashStateVJP:
    """`flash_attention_state`: differentiable partial-softmax states
    (ring sequence-parallel training hops, parallel/sp_attention.py)."""

    def test_primal_matches_kernel(self):
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            _state_reference, flash_attention, flash_attention_state)

        q, k, v, bias = _data(s=200, seed=3)
        bound = jnp.asarray(6.0, jnp.float32)  # > max|s| for 0.5-scaled N(0,1)
        o_k, m_k, l_k = flash_attention(
            q, k, v, bias, bound_mode="static", score_bound=bound,
            return_state=True)
        o_w, m_w, l_w = flash_attention_state(q, k, v, bias,
                                              score_bound=bound)
        c = jnp.broadcast_to(bound, (q.shape[0], q.shape[2]))
        o_r, m_r, l_r = _state_reference(
            q, k, v, bias, c, float(q.shape[-1] ** -0.5), k_chunk=128)
        for a, b_ in ((o_w, o_k), (m_w, m_k), (l_w, l_k),
                      (o_r, o_k), (m_r, m_k), (l_r, l_k)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)

    def test_merged_state_grads_match_dense(self):
        """Two key shards folded via flash_attention_state +
        merge_flash_states: value AND grads must equal dense softmax over
        the concatenated keys (what a 2-hop ring computes)."""
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_state, merge_flash_states)

        q, k, v, bias = _data(s=256, seed=5)
        k1, k2 = k[:, :128], k[:, 128:]
        v1, v2 = v[:, :128], v[:, 128:]
        b1 = bias[..., :128] if bias is not None else None
        b2 = bias[..., 128:] if bias is not None else None

        def loss_ring(q, k1, v1, k2, v2):
            s1 = flash_attention_state(q, k1, v1, b1, score_bound=8.0)
            s2 = flash_attention_state(q, k2, v2, b2, score_bound=8.0)
            out, _, _ = merge_flash_states(s1, s2)
            return jnp.sum(jnp.sin(out) * 0.1)

        def loss_ref(q, k1, v1, k2, v2):
            o = sdpa_attention(q, jnp.concatenate([k1, k2], 1),
                               jnp.concatenate([v1, v2], 1), bias=bias)
            return jnp.sum(jnp.sin(o) * 0.1)

        args = (q, k1, v1, k2, v2)
        val_r, g_ring = jax.value_and_grad(loss_ring, argnums=(0, 1, 2, 3, 4))(*args)
        val_d, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        np.testing.assert_allclose(float(val_r), float(val_d),
                                   rtol=1e-3, atol=1e-4)
        for a, b_, name in zip(g_ring, g_ref, ("q", "k1", "v1", "k2", "v2")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-3, atol=3e-3,
                err_msg=f"grad mismatch for {name}")

    def test_auto_bound_stop_gradient(self):
        """With score_bound=None the norm-derived offset is
        stop_gradient'ed — grads still match dense (offset cancels)."""
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_state)

        q, k, v, _ = _data(s=128, txt=0, seed=7)

        def loss_state(q, k, v):
            out, _, _ = flash_attention_state(q, k, v, k_chunk=64)
            return jnp.sum(jnp.cos(out) * 0.1)

        def loss_ref(q, k, v):
            o = sdpa_attention(q, k, v, bias=None)
            return jnp.sum(jnp.cos(o) * 0.1)

        g_s = jax.grad(loss_state, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g_s, g_r, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-3, atol=3e-3,
                err_msg=f"grad mismatch for {name}")

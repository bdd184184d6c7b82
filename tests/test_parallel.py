"""Sequence-parallel parity tests on a virtual 8-device CPU mesh.

JAX analog of the reference's only test file (tests/test_attention.py):
sequential full attention vs sequence-parallel attention on identical
inputs, rtol/atol 1e-3 — but CPU-hostable (no GPUs/NCCL needed).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hunyuanvideo_efficiency_tpu.models.dit import dit_forward, init_dit_params
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.ops.attention import (
    joint_attention, text_key_bias)
from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
from hunyuanvideo_efficiency_tpu.parallel import (
    DP_AXIS, SP_AXES, ParallelConfig, make_mesh, make_sp_denoise_fn,
    make_sp_dit_forward)
from hunyuanvideo_efficiency_tpu.diffusion.scheduler import get_sigmas


def _qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (b, s, h, d), jnp.float32) for k in ks]


@pytest.mark.parametrize("u,r", [(2, 1), (1, 2), (2, 4), (4, 2), (8, 1), (1, 8)])
def test_usp_joint_attention_parity(u, r):
    """Ulysses x ring == sequential joint attention (reference
    tests/test_attention.py:44-110 pattern)."""
    b, s_img, lt, h, d = 2, 96, 16, 8, 32
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    img_q, img_k, img_v = _qkv(k1, b, s_img, h, d)
    txt_q, txt_k, txt_v = _qkv(k2, b, lt, h, d)
    mask = jnp.asarray(
        np.random.RandomState(1).rand(b, lt) > 0.4, jnp.int32)
    mask = mask.at[:, 0].set(1)
    bias = text_key_bias(mask)

    ref_img, ref_txt = joint_attention(
        img_q, img_k, img_v, txt_q, txt_k, txt_v, bias, mode="sdpa")

    pcfg = ParallelConfig(ulysses_degree=u, ring_degree=r)
    mesh = make_mesh(pcfg)
    seq = P(None, SP_AXES)
    rep = P()
    fn = jax.shard_map(
        lambda *a: joint_attention(
            *a, ulysses_axis="ulysses" if u > 1 else None,
            ring_axis="ring" if r > 1 else None),
        mesh=mesh,
        in_specs=(seq, seq, seq, rep, rep, rep, rep),
        out_specs=(seq, rep),
        check_vma=False)
    sp_img, sp_txt = fn(img_q, img_k, img_v, txt_q, txt_k, txt_v, bias)

    np.testing.assert_allclose(np.asarray(sp_img), np.asarray(ref_img),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sp_txt), np.asarray(ref_txt),
                               rtol=1e-3, atol=1e-3)


TINY = DiTConfig(
    hidden_size=128, heads_num=4, mm_double_blocks_depth=2,
    mm_single_blocks_depth=2, rope_dim_list=(8, 12, 12),
    text_states_dim=64, text_states_dim_2=32, attn_mode="sdpa")


def _tiny_inputs(key, b, lt=8, t=3, hh=8, ww=6):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, 16, t, hh, ww), jnp.float32)
    ts = jnp.asarray([500.0] * b, jnp.float32)
    txt = jax.random.normal(ks[1], (b, lt, TINY.text_states_dim), jnp.float32)
    mask = jnp.ones((b, lt), jnp.int32)
    txt2 = jax.random.normal(ks[2], (b, TINY.text_states_dim_2), jnp.float32)
    tt, th, tw = t, hh // 2, ww // 2
    cos, sin = get_nd_rotary_pos_embed(TINY.rope_dim_list, (tt, th, tw),
                                       theta=TINY.rope_theta)
    return x, ts, txt, mask, txt2, cos, sin, (tt, th, tw)


@pytest.mark.parametrize("dp,u,r", [(1, 2, 2), (2, 2, 2), (1, 4, 1), (1, 1, 4)])
def test_sp_dit_forward_parity(dp, u, r):
    """Full sharded DiT forward == sequential forward."""
    b = 2
    key = jax.random.PRNGKey(7)
    params = init_dit_params(jax.random.PRNGKey(3), TINY)
    x, ts, txt, mask, txt2, cos, sin, (tt, th, tw) = _tiny_inputs(key, b)

    ref = dit_forward(params, x, ts, txt, mask, txt2, cos, sin, cfg=TINY)

    pcfg = ParallelConfig(dp_degree=dp, ulysses_degree=u, ring_degree=r)
    mesh = make_mesh(pcfg)
    fwd = make_sp_dit_forward(mesh, TINY, pcfg)
    d = cos.shape[-1]
    cos_g = cos.reshape(tt, th, tw, d)
    sin_g = sin.reshape(tt, th, tw, d)
    out = fwd(params, x, ts, txt, mask, txt2, cos_g, sin_g,
              jnp.zeros((b,), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_sp_denoise_parity():
    """Sharded multi-step denoise scan == sequential denoise."""
    from hunyuanvideo_efficiency_tpu.diffusion.pipeline import denoise_latents

    b = 1
    key = jax.random.PRNGKey(11)
    params = init_dit_params(jax.random.PRNGKey(5), TINY)
    x, _, txt, mask, txt2, cos, sin, (tt, th, tw) = _tiny_inputs(key, b)
    sigmas_np, ts_np = get_sigmas(4, shift=7.0)
    sigmas = jnp.asarray(sigmas_np)
    timesteps = jnp.asarray(ts_np)

    ref = denoise_latents(params, x, sigmas, timesteps, txt, mask, txt2,
                          cos, sin, cfg=TINY, do_cfg=False,
                          guidance_scale=1.0, embedded_guidance_scale=None,
                          guidance_rescale=0.0)

    pcfg = ParallelConfig(ulysses_degree=2, ring_degree=2)
    mesh = make_mesh(pcfg)
    fn = make_sp_denoise_fn(mesh, TINY, pcfg, do_cfg=False)
    d = cos.shape[-1]
    out = fn(params, x, sigmas, timesteps, txt, mask, txt2,
             cos.reshape(tt, th, tw, d), sin.reshape(tt, th, tw, d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_sp_denoise_cfg_rescale_parity():
    """Sharded denoise with CFG + guidance_rescale > 0 == sequential.

    The rescale branch is the only sp_dit path doing cross-device
    statistics (pmean'd moments over the sp axes); this pins it against
    `rescale_noise_cfg` (reference pipeline_hunyuan_video.py:56-71,
    1006-1018)."""
    from hunyuanvideo_efficiency_tpu.diffusion.pipeline import denoise_latents

    b = 1
    key = jax.random.PRNGKey(13)
    params = init_dit_params(jax.random.PRNGKey(5), TINY)
    # init zero-inits the final layer -> v == 0 -> rescale hits 0/0; give it
    # real output so the std-ratio path is actually exercised
    fl = params["final_layer"]["linear"]
    fl["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(99), fl["kernel"].shape, jnp.float32)
    x, _, _, _, _, cos, sin, (tt, th, tw) = _tiny_inputs(key, b)
    ks = jax.random.split(jax.random.PRNGKey(21), 2)
    # CFG batches: [uncond | text] along batch
    txt = jax.random.normal(ks[0], (2 * b, 8, TINY.text_states_dim),
                            jnp.float32)
    mask = jnp.ones((2 * b, 8), jnp.int32)
    txt2 = jax.random.normal(ks[1], (2 * b, TINY.text_states_dim_2),
                             jnp.float32)
    sigmas_np, ts_np = get_sigmas(3, shift=7.0)
    sigmas = jnp.asarray(sigmas_np)
    timesteps = jnp.asarray(ts_np)

    ref = denoise_latents(params, x, sigmas, timesteps, txt, mask, txt2,
                          cos, sin, cfg=TINY, do_cfg=True,
                          guidance_scale=6.0, embedded_guidance_scale=None,
                          guidance_rescale=0.7)

    pcfg = ParallelConfig(ulysses_degree=2, ring_degree=2)
    mesh = make_mesh(pcfg)
    fn = make_sp_denoise_fn(mesh, TINY, pcfg, do_cfg=True,
                            guidance_scale=6.0, guidance_rescale=0.7)
    d = cos.shape[-1]
    out = fn(params, x, sigmas, timesteps, txt, mask, txt2,
             cos.reshape(tt, th, tw, d), sin.reshape(tt, th, tw, d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_partial_attn_chunked_matches_block():
    """Sub-chunked K folding == single-block folding (exercised with a
    k_chunk smaller than Sk, as production ring shards would be)."""
    from hunyuanvideo_efficiency_tpu.parallel.sp_attention import (
        _init_state, _finish, _partial_attn)

    b, sq, sk, h, d = 1, 24, 50, 2, 16
    key = jax.random.PRNGKey(0)
    q, k, v = _qkv(key, b, max(sq, sk), h, d)
    q = q[:, :sq]
    k, v = k[:, :sk], v[:, :sk]
    bias = jnp.where(
        jnp.arange(sk)[None, None, None] % 7 == 0, -1e30, 0.0
    ).astype(jnp.float32)

    ref_state = _partial_attn(q, k, v, bias, _init_state(b, h, sq, d),
                              1.0 / 4.0, k_chunk=4096)
    chk_state = _partial_attn(q, k, v, bias, _init_state(b, h, sq, d),
                              1.0 / 4.0, k_chunk=16)
    np.testing.assert_allclose(np.asarray(_finish(chk_state, q.dtype)),
                               np.asarray(_finish(ref_state, q.dtype)),
                               rtol=1e-5, atol=1e-5)

"""Sharded flow-matching training step: convergence + replication invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
from hunyuanvideo_efficiency_tpu.parallel import ParallelConfig, make_mesh
from hunyuanvideo_efficiency_tpu.training import make_sp_train_step

TINY = DiTConfig(hidden_size=64, heads_num=4, mm_double_blocks_depth=1,
                 mm_single_blocks_depth=1, rope_dim_list=(4, 6, 6),
                 text_states_dim=32, text_states_dim_2=16,
                 guidance_embed=True, attn_mode="sdpa")


def _data(b):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    t_lat, h_lat, w_lat = 3, 8, 6
    x0 = jax.random.normal(ks[0], (b, 16, t_lat, h_lat, w_lat), jnp.float32)
    noise = jax.random.normal(ks[1], x0.shape, jnp.float32)
    pe = jax.random.normal(ks[2], (b, 8, 32), jnp.float32)
    mask = jnp.ones((b, 8), jnp.int32)
    pe2 = jax.random.normal(ks[3], (b, 16), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(TINY.rope_dim_list, (3, 4, 3),
                                       theta=TINY.rope_theta)
    d = cos.shape[-1]
    return (x0, noise, pe, mask, pe2,
            cos.reshape(3, 4, 3, d), sin.reshape(3, 4, 3, d))


def test_loss_decreases_and_params_stay_replicated():
    pcfg = ParallelConfig(dp_degree=2, ulysses_degree=2, ring_degree=2)
    mesh = make_mesh(pcfg)
    step = make_sp_train_step(mesh, TINY, pcfg, lr=0.1)
    params = init_dit_params(jax.random.PRNGKey(1), TINY)
    x0, noise, pe, mask, pe2, cos_g, sin_g = _data(b=2)
    t = jnp.full((2,), 0.5, jnp.float32)

    losses = []
    for _ in range(8):
        params, loss = step(params, x0, noise, t, pe, mask, pe2, cos_g, sin_g)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # memorizing a fixed batch must reduce the loss monotonically
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 1e-2, losses

    # params stay fully replicated (update identical on every device)
    leaf = jax.tree.leaves(params)[0]
    assert leaf.sharding.is_fully_replicated


def test_single_device_mesh_matches_multi():
    """Same data, different meshes -> same loss trajectory (pmean over all
    axes makes the sharded step equivalent to the global batch step)."""
    x0, noise, pe, mask, pe2, cos_g, sin_g = _data(b=2)
    t = jnp.full((2,), 0.5, jnp.float32)

    results = []
    for degrees in ((1, 1, 1), (1, 2, 2)):
        pcfg = ParallelConfig(*degrees)
        mesh = make_mesh(pcfg)
        step = make_sp_train_step(mesh, TINY, pcfg, lr=1e-3)
        params = init_dit_params(jax.random.PRNGKey(1), TINY)
        losses = []
        for _ in range(3):
            params, loss = step(params, x0, noise, t, pe, mask, pe2,
                                cos_g, sin_g)
            losses.append(float(loss))
        results.append(losses)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-4, atol=1e-5)

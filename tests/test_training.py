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


def test_optax_step_with_ema():
    """AdamW + grad-clip step reduces loss; EMA lags the live params and
    stays finite (the reference's `module`/`ema` dual weight sets,
    hyvideo/inference.py:279-354)."""
    import optax

    from hunyuanvideo_efficiency_tpu.training import make_sp_train_step_optax

    pcfg = ParallelConfig(dp_degree=2, ulysses_degree=2, ring_degree=2)
    mesh = make_mesh(pcfg)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(1e-2, weight_decay=1e-4))
    step, init_fn = make_sp_train_step_optax(mesh, TINY, pcfg, optimizer,
                                             ema_decay=0.5)
    params = init_dit_params(jax.random.PRNGKey(1), TINY)
    state = init_fn(params)
    x0, noise, pe, mask, pe2, cos_g, sin_g = _data(b=2)
    t = jnp.full((2,), 0.5, jnp.float32)

    losses = []
    for _ in range(6):
        params, state, loss = step(params, state, x0, noise, t,
                                   pe, mask, pe2, cos_g, sin_g)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state["step"]) == 6

    # EMA is a trailing average: different from the live params, finite
    lp = jax.tree.leaves(params)
    le = jax.tree.leaves(state["ema"])
    diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b)))
             for a, b in zip(lp, le)]
    assert max(diffs) > 1e-6
    assert all(np.isfinite(d) for d in diffs)


def test_train_cli_smoke_and_resume(tmp_path):
    """train.py end-to-end on the CPU mesh: toy model, latent .pt dataset,
    checkpoint write, then resume for one more step."""
    import train as train_cli
    from hunyuanvideo_efficiency_tpu.data.dataset_loader import save_tensor

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        save_tensor(str(data / f"v{i}.pt"),
                    rng.randn(16, 3, 8, 6).astype(np.float32))

    out = tmp_path / "run"
    losses = train_cli.main([
        "--data-dir", str(data), "--latents", "--toy",
        "--steps", "2", "--batch-size", "2", "--save-every", "2",
        "--mesh-shape", "dp:2,ulysses:2,ring:2", "--ema-decay", "0.9",
        "--lr", "1e-3", "--output-dir", str(out), "--seed", "3"])
    assert len(losses) == 2 and all(np.isfinite(losses))
    ck = out / "step_0000002"
    assert (ck / "module").exists() and (ck / "ema").exists()
    assert (ck / "opt_state").exists() and (ck / "meta.json").exists()

    more = train_cli.main([
        "--data-dir", str(data), "--latents", "--toy",
        "--steps", "3", "--batch-size", "2", "--save-every", "10",
        "--mesh-shape", "dp:2,ulysses:2,ring:2", "--ema-decay", "0.9",
        "--lr", "1e-3", "--output-dir", str(out), "--seed", "3",
        "--resume", str(ck)])
    assert len(more) == 1 and np.isfinite(more[0])


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


def test_bf16_params_train_via_fp32_master():
    """bf16 compute params + tiny lr: per-step updates are below bf16's
    relative epsilon (2^-8), so updating bf16 params in place would round
    most updates to zero and stall. The optax step keeps an fp32 master
    copy, steps it, and re-rounds — the master must accumulate sub-bf16
    drift while params track its rounding (reference mixed-precision
    training, hyvideo training stack)."""
    import optax

    from hunyuanvideo_efficiency_tpu.training import make_sp_train_step_optax

    pcfg = ParallelConfig(dp_degree=1, ulysses_degree=2, ring_degree=1)
    mesh = make_mesh(pcfg)
    optimizer = optax.adamw(1e-5)
    step, init_fn = make_sp_train_step_optax(mesh, TINY, pcfg, optimizer,
                                             ema_decay=0.99)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                          init_dit_params(jax.random.PRNGKey(1), TINY))
    state = init_fn(params)
    assert state["master"] is not None
    assert all(m.dtype == jnp.float32
               for m in jax.tree.leaves(state["master"]))

    x0, noise, pe, mask, pe2, cos_g, sin_g = _data(b=2)
    t = jnp.full((2,), 0.5, jnp.float32)
    m0 = jax.tree.map(lambda m: np.asarray(m), state["master"])
    for _ in range(4):
        params, state, loss = step(params, state, x0, noise, t,
                                   pe, mask, pe2, cos_g, sin_g)
    assert np.isfinite(float(loss))

    # most master leaves moved. Not all: adaLN-Zero init means grads
    # cascade inward one zero-init layer per step (final_layer first,
    # then img stream, then txt/refiner/time embeds), so deep leaves
    # legitimately see exactly-zero grads for the first few steps.
    moved = [float(np.max(np.abs(np.asarray(m1) - a0)))
             for m1, a0 in zip(jax.tree.leaves(state["master"]),
                               jax.tree.leaves(m0))]
    assert sum(mv > 0 for mv in moved) >= 0.5 * len(moved), \
        f"{sum(mv > 0 for mv in moved)}/{len(moved)} leaves moved"
    # ... and the master holds sub-bf16 precision that params cannot:
    # at least one leaf's master differs from its own bf16 rounding
    frac = [float(np.max(np.abs(
        np.asarray(m) - np.asarray(m.astype(jnp.bfloat16), np.float32))))
        for m in jax.tree.leaves(state["master"])]
    assert max(frac) > 0.0
    # params are exactly the bf16 rounding of the master
    for p, m in zip(jax.tree.leaves(params),
                    jax.tree.leaves(state["master"])):
        assert p.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(p, np.float32),
                                      np.asarray(m.astype(jnp.bfloat16),
                                                 np.float32))

    # fp32 params take the master-free fast path
    params32 = init_dit_params(jax.random.PRNGKey(1), TINY)
    assert init_fn(params32)["master"] is None


def test_train_step_with_flash_ring_grads():
    """Training with attn_mode='flash' under ulysses x ring must
    differentiate. With qk_norm (static-offset regime) the ring hops stay
    on the Pallas kernel via the `flash_attention_state` custom VJP
    (kernel forward, chunked-XLA transpose); without qk_norm the train
    step falls back to the einsum recurrence (flash_ring_kernel=False)."""
    from dataclasses import replace

    cfg = replace(TINY, attn_mode="flash")
    pcfg = ParallelConfig(dp_degree=1, ulysses_degree=2, ring_degree=2)
    mesh = make_mesh(pcfg)
    step = make_sp_train_step(mesh, cfg, pcfg, lr=0.05)
    params = init_dit_params(jax.random.PRNGKey(2), cfg)
    x0, noise, pe, mask, pe2, cos_g, sin_g = _data(b=1)
    t = jnp.full((1,), 0.5, jnp.float32)
    params, l0 = step(params, x0, noise, t, pe, mask, pe2, cos_g, sin_g)
    params, l1 = step(params, x0, noise, t, pe, mask, pe2, cos_g, sin_g)
    assert np.isfinite([float(l0), float(l1)]).all()
    assert float(l1) < float(l0)

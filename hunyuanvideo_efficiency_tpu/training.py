"""Flow-matching training step, sharded over the device mesh.

The reference repo is inference-only (SURVEY.md §5.4), but the framework
supports fine-tuning the DiT: rectified-flow objective
    x_t = (1 - sigma) * x0 + sigma * noise,   target v = noise - x0
(the inverse of the sampler's Euler update x <- x + v * dsigma,
reference: hyvideo/diffusion/schedulers/scheduling_flow_match_discrete.py:236-242).

Parallelism matches inference (parallel/sp_dit.py): params replicated,
latents travel as flat patch tokens sharded on batch (dp) and tokens
(ulysses x ring); gradients are `lax.pmean`ed over every mesh axis, so the
update is identical on all devices and params stay replicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .models.dit import dit_forward_tokens, patchify_raw
from .models.dit_config import DiTConfig
from .parallel.mesh import (DP_AXIS, RING_AXIS, SP_AXES, ULYSSES_AXIS,
                            ParallelConfig)
from .parallel.sp_dit import FREQ_SPEC, TOKEN_SPEC, _sp_cfg


def flow_match_loss(params, x0, noise, t, pe, mask, pe2, f_cos, f_sin,
                    guidance, cfg: DiTConfig):
    """Per-shard rectified-flow MSE on token-form latents
    ([B, L(_loc), C*ppp]; the interpolation, target, and MSE are all
    token-pointwise, so the sharded mean pmean's to the global mean —
    shards are equal-sized). t in [0, 1]."""
    sigma = t[:, None, None].astype(jnp.float32)
    x_t = (1.0 - sigma) * x0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
    v_target = noise.astype(jnp.float32) - x0.astype(jnp.float32)
    v = dit_forward_tokens(params, x_t, t * 1000.0, pe, mask, pe2,
                           f_cos, f_sin, guidance, cfg=cfg)
    return jnp.mean((v.astype(jnp.float32) - v_target) ** 2)


def make_sp_train_step(mesh: Mesh, cfg: DiTConfig, pcfg: ParallelConfig,
                       lr: float = 1e-5):
    """Returns a jitted sharded SGD step:
    (params, x0, noise, t, pe, mask, pe2, f_cos_grid, f_sin_grid)
      -> (new_params, loss).

    Inputs keep the 5D latent + grid-RoPE API; they are flattened to the
    token-sharded layout (parallel/sp_dit.py) inside the jitted wrapper.
    Text and params replicated. Blocks are rematerialized (jax.checkpoint
    via cfg.remat_blocks) to keep activation memory flat in depth.
    """
    from dataclasses import replace

    cfg_l = replace(_sp_cfg(cfg, pcfg), remat_blocks=True,
                    # with qk_norm the static-offset hops differentiate
                    # (flash_attention_state custom VJP); otherwise the
                    # raw running-max kernel has no JVP — grads use the
                    # einsum ring recurrence
                    flash_ring_kernel=bool(cfg.qk_norm))
    axes = (DP_AXIS, ULYSSES_AXIS, RING_AXIS)

    def step(params, x0, noise, t, pe, mask, pe2, f_cos, f_sin):
        guidance = (jnp.full((x0.shape[0],), 1000.0, jnp.float32)
                    if cfg_l.guidance_embed else None)
        loss, grads = jax.value_and_grad(flow_match_loss)(
            params, x0, noise, t, pe, mask, pe2, f_cos, f_sin, guidance,
            cfg_l)
        grads = lax.pmean(grads, axes)
        loss = lax.pmean(loss, axes)
        new_params = jax.tree.map(
            lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype),
            params, grads)
        return new_params, loss

    rep = P()
    batch_spec = P(DP_AXIS)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, TOKEN_SPEC, TOKEN_SPEC, batch_spec, batch_spec,
                  batch_spec, batch_spec, FREQ_SPEC, FREQ_SPEC),
        out_specs=(rep, rep),
        check_vma=False,
    )

    def wrapper(params, x0, noise, t, pe, mask, pe2, f_cos_grid, f_sin_grid):
        d = f_cos_grid.shape[-1]
        return sharded(params, patchify_raw(x0, cfg.patch_size),
                       patchify_raw(noise, cfg.patch_size), t, pe, mask,
                       pe2, f_cos_grid.reshape(-1, d),
                       f_sin_grid.reshape(-1, d))

    return jax.jit(wrapper)


def make_sp_train_step_optax(mesh: Mesh, cfg: DiTConfig,
                             pcfg: ParallelConfig, optimizer,
                             ema_decay: float | None = 0.9999):
    """Sharded train step with an optax optimizer and optional EMA params.

    The reference's training checkpoints carry both a `module` and an `ema`
    weight set (reference: hyvideo/inference.py:279-354 loads either via
    --load-key); EMA tracking here produces that second set natively.

    Returns (step_fn, init_fn):
      init_fn(params) -> TrainState dict {opt_state, ema (or None), step}
      step_fn(params, state, x0, noise, t, pe, mask, pe2,
              f_cos_grid, f_sin_grid) -> (new_params, new_state, loss)

    Sharding matches make_sp_train_step: params/opt_state/ema replicated,
    batch on dp, flat patch tokens on ulysses x ring; grads pmean'd over
    the mesh so the update is identical everywhere.

    Mixed precision: when compute params are not fp32 (bf16 is the norm),
    the state carries an fp32 MASTER copy and the optimizer runs on it —
    with lr ~1e-5 a bf16 update rounds to zero (bf16 relative epsilon is
    2^-8), so updating bf16 params in place silently stalls training. Each
    step updates the master in fp32 and re-rounds to the compute dtype.
    """
    from dataclasses import replace

    cfg_l = replace(_sp_cfg(cfg, pcfg), remat_blocks=True,
                    # with qk_norm the static-offset hops differentiate
                    # (flash_attention_state custom VJP); otherwise the
                    # raw running-max kernel has no JVP — grads use the
                    # einsum ring recurrence
                    flash_ring_kernel=bool(cfg.qk_norm))
    axes = (DP_AXIS, ULYSSES_AXIS, RING_AXIS)

    def init_fn(params):
        needs_master = any(
            jnp.asarray(p).dtype != jnp.float32
            for p in jax.tree.leaves(params))
        master = (jax.tree.map(lambda p: p.astype(jnp.float32), params)
                  if needs_master else None)
        return {
            "opt_state": optimizer.init(master if master is not None
                                        else params),
            "master": master,
            "ema": (jax.tree.map(lambda p: p.astype(jnp.float32), params)
                    if ema_decay is not None else None),
            "step": jnp.zeros((), jnp.int32),
        }

    def step(params, state, x0, noise, t, pe, mask, pe2, f_cos, f_sin):
        guidance = (jnp.full((x0.shape[0],), 1000.0, jnp.float32)
                    if cfg_l.guidance_embed else None)
        loss, grads = jax.value_and_grad(flow_match_loss)(
            params, x0, noise, t, pe, mask, pe2, f_cos, f_sin, guidance,
            cfg_l)
        grads = lax.pmean(grads, axes)
        loss = lax.pmean(loss, axes)
        master = state["master"] if state["master"] is not None else params
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              master)
        new_master = optax.apply_updates(master, updates)
        new_params = jax.tree.map(lambda m, p: m.astype(p.dtype),
                                  new_master, params)
        ema = state["ema"]
        if ema is not None:
            ema = jax.tree.map(
                lambda e, m: ema_decay * e
                + (1.0 - ema_decay) * m.astype(jnp.float32),
                ema, new_master)
        return new_params, {
            "opt_state": opt_state,
            "master": (new_master if state["master"] is not None else None),
            "ema": ema, "step": state["step"] + 1}, loss

    rep = P()
    batch_spec = P(DP_AXIS)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, TOKEN_SPEC, TOKEN_SPEC, batch_spec, batch_spec,
                  batch_spec, batch_spec, FREQ_SPEC, FREQ_SPEC),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )

    def wrapper(params, state, x0, noise, t, pe, mask, pe2,
                f_cos_grid, f_sin_grid):
        d = f_cos_grid.shape[-1]
        return sharded(params, state, patchify_raw(x0, cfg.patch_size),
                       patchify_raw(noise, cfg.patch_size), t, pe, mask,
                       pe2, f_cos_grid.reshape(-1, d),
                       f_sin_grid.reshape(-1, d))

    return jax.jit(wrapper), init_fn

"""Flow-matching training step, sharded over the device mesh.

The reference repo is inference-only (SURVEY.md §5.4), but the framework
supports fine-tuning the DiT: rectified-flow objective
    x_t = (1 - sigma) * x0 + sigma * noise,   target v = noise - x0
(the inverse of the sampler's Euler update x <- x + v * dsigma,
reference: hyvideo/diffusion/schedulers/scheduling_flow_match_discrete.py:236-242).

Parallelism matches inference (parallel/sp_dit.py): params replicated,
latents sharded on batch (dp) and latent-H (ulysses x ring); gradients are
`lax.pmean`ed over every mesh axis, so the update is identical on all
devices and params stay replicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .models.dit import dit_forward
from .models.dit_config import DiTConfig
from .parallel.mesh import (DP_AXIS, RING_AXIS, SP_AXES, ULYSSES_AXIS,
                            ParallelConfig)
from .parallel.sp_dit import _sp_cfg


def flow_match_loss(params, x0, noise, t, pe, mask, pe2, f_cos, f_sin,
                    guidance, cfg: DiTConfig):
    """Per-shard rectified-flow MSE. t in [0, 1]."""
    sigma = t[:, None, None, None, None].astype(jnp.float32)
    x_t = (1.0 - sigma) * x0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
    v_target = noise.astype(jnp.float32) - x0.astype(jnp.float32)
    v = dit_forward(params, x_t, t * 1000.0, pe, mask, pe2,
                    f_cos, f_sin, guidance, cfg=cfg)
    return jnp.mean((v.astype(jnp.float32) - v_target) ** 2)


def make_sp_train_step(mesh: Mesh, cfg: DiTConfig, pcfg: ParallelConfig,
                       lr: float = 1e-5):
    """Returns a jitted sharded SGD step:
    (params, x0, noise, t, pe, mask, pe2, f_cos_grid, f_sin_grid)
      -> (new_params, loss).

    x0/noise sharded [dp, -, -, sp, -]; RoPE grids sharded on Hp; text and
    params replicated. Blocks are rematerialized (jax.checkpoint via
    cfg.remat_blocks) to keep activation memory flat in depth.
    """
    from dataclasses import replace

    cfg_l = replace(_sp_cfg(cfg, pcfg), remat_blocks=True)
    axes = (DP_AXIS, ULYSSES_AXIS, RING_AXIS)

    def step(params, x0, noise, t, pe, mask, pe2, f_cos_grid, f_sin_grid):
        d = f_cos_grid.shape[-1]
        f_cos = f_cos_grid.reshape(-1, d)
        f_sin = f_sin_grid.reshape(-1, d)
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

    x_spec = P(DP_AXIS, None, None, SP_AXES, None)
    rep = P()
    batch_spec = P(DP_AXIS)
    freq_spec = P(None, SP_AXES, None, None)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, x_spec, x_spec, batch_spec, batch_spec, batch_spec,
                  batch_spec, freq_spec, freq_spec),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)

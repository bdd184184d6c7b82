"""Sequence-parallel DiT forward + denoise loop over a device mesh.

TPU-native replacement for the reference's `parallelize_transformer`
monkey-patch (reference: hyvideo/inference.py:40-104). Instead of patching
`forward` and chunking tensors by rank, the whole forward runs under ONE
`shard_map` over a `jax.sharding.Mesh`:

* latent [B, C, T, H, W] sharded on H over (ulysses, ring) and on B over dp
  (the reference chunks H of the patch grid too, inference.py:57-64);
* RoPE tables passed grid-shaped [T', Hp, Wp, D] and sharded on Hp so each
  device rotates its own tokens (reference chunks freqs identically,
  inference.py:71-78);
* text states/masks replicated (joint "rear" strategy);
* attention inside the blocks dispatches to Ulysses x ring
  (parallel/sp_attention.py);
* the output stays H-sharded — no all_gather per step. The Euler update is
  pointwise (scheduling_flow_match_discrete.py:239-242), so the latent
  remains sharded across ALL denoise steps and is gathered exactly once
  before VAE decode — eliminating the reference's per-step
  `sp_group.all_gather` (inference.py:97-100).
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.scheduler import euler_step
from ..models.dit import dit_forward
from ..models.dit_config import DiTConfig
from .mesh import DP_AXIS, RING_AXIS, SP_AXES, ULYSSES_AXIS, ParallelConfig


def _sp_cfg(cfg: DiTConfig, pcfg: ParallelConfig) -> DiTConfig:
    return replace(
        cfg,
        ulysses_axis=ULYSSES_AXIS if pcfg.ulysses_degree > 1 else None,
        ring_axis=RING_AXIS if pcfg.ring_degree > 1 else None,
    )


def _local_forward(params, x, t, text_states, text_mask, text_states_2,
                   f_cos_grid, f_sin_grid, guidance, cfg: DiTConfig):
    """Per-device body: flatten the local RoPE grid slice and run the
    standard forward (attention handles the collectives)."""
    d = f_cos_grid.shape[-1]
    f_cos = f_cos_grid.reshape(-1, d)
    f_sin = f_sin_grid.reshape(-1, d)
    return dit_forward(params, x, t, text_states, text_mask, text_states_2,
                       f_cos, f_sin, guidance, cfg=cfg)


def make_sp_dit_forward(mesh: Mesh, cfg: DiTConfig, pcfg: ParallelConfig):
    """Returns a jitted sharded forward:
    (params, x, t, text_states, text_mask, text_states_2,
     f_cos_grid [T',Hp,Wp,D], f_sin_grid, guidance) -> v [B, C, T', H', W'].

    x is sharded on batch (dp) and latent H (ulysses*ring); the output keeps
    the same sharding. H'/patch_h must be divisible by the sp degree.
    """
    cfg = _sp_cfg(cfg, pcfg)
    x_spec = P(DP_AXIS, None, None, SP_AXES, None)
    rep = P()
    batch_spec = P(DP_AXIS)
    freq_spec = P(None, SP_AXES, None, None)

    fwd = jax.shard_map(
        partial(_local_forward, cfg=cfg),
        mesh=mesh,
        in_specs=(rep, x_spec, batch_spec, batch_spec, batch_spec,
                  batch_spec, freq_spec, freq_spec, batch_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    return jax.jit(fwd)


def make_sp_denoise_fn(
    mesh: Mesh,
    cfg: DiTConfig,
    pcfg: ParallelConfig,
    *,
    do_cfg: bool,
    guidance_scale: float = 1.0,
    embedded_guidance_scale: Optional[float] = None,
    guidance_rescale: float = 0.0,
):
    """Returns a jitted fn running the FULL denoise scan with the latent
    sharded throughout:

    (params, latents, sigmas, timesteps, pe, mask, pe2,
     f_cos_grid, f_sin_grid) -> final latents (same sharding as input).
    """
    cfg_l = _sp_cfg(cfg, pcfg)
    mult = 2 if do_cfg else 1

    def denoise(params, latents, sigmas, timesteps, pe, mask, pe2,
                f_cos_grid, f_sin_grid):
        d = f_cos_grid.shape[-1]
        f_cos = f_cos_grid.reshape(-1, d)
        f_sin = f_sin_grid.reshape(-1, d)

        def body(lat, step):
            sigma, sigma_next, t = step
            lat_in = jnp.concatenate([lat] * mult, 0) if do_cfg else lat
            t_exp = jnp.full((lat_in.shape[0],), t, jnp.float32)
            guidance = None
            if cfg_l.guidance_embed:
                guidance = jnp.full(
                    (lat_in.shape[0],),
                    (embedded_guidance_scale or 0.0) * 1000.0, jnp.float32)
            v = dit_forward(params, lat_in, t_exp, pe, mask, pe2,
                            f_cos, f_sin, guidance, cfg=cfg_l)
            v = v.astype(jnp.float32)
            if do_cfg:
                v_u, v_t = jnp.split(v, 2, axis=0)
                v = v_u + guidance_scale * (v_t - v_u)
                if guidance_rescale > 0.0:
                    # per-sample stds need the moments of the FULL latent;
                    # spatial extent is sharded over the sp axes only (dp
                    # shards distinct samples and must NOT be mixed)
                    axes = (ULYSSES_AXIS, RING_AXIS)
                    red = tuple(range(1, v.ndim))
                    ex2 = lax.pmean(jnp.mean(v.astype(jnp.float32) ** 2,
                                             axis=red, keepdims=True), axes)
                    ex = lax.pmean(jnp.mean(v.astype(jnp.float32),
                                            axis=red, keepdims=True), axes)
                    et2 = lax.pmean(jnp.mean(v_t.astype(jnp.float32) ** 2,
                                             axis=red, keepdims=True), axes)
                    et = lax.pmean(jnp.mean(v_t.astype(jnp.float32),
                                            axis=red, keepdims=True), axes)
                    std_cfg = jnp.sqrt(jnp.maximum(ex2 - ex ** 2, 1e-20))
                    std_t = jnp.sqrt(jnp.maximum(et2 - et ** 2, 1e-20))
                    rescaled = v * (std_t / std_cfg)
                    v = (guidance_rescale * rescaled
                         + (1 - guidance_rescale) * v)
            return euler_step(lat, v, sigma, sigma_next), None

        lat, _ = jax.lax.scan(body, latents.astype(jnp.float32),
                              (sigmas[:-1], sigmas[1:], timesteps))
        return lat

    x_spec = P(DP_AXIS, None, None, SP_AXES, None)
    rep = P()
    batch_spec = P(DP_AXIS)
    freq_spec = P(None, SP_AXES, None, None)
    sharded = jax.shard_map(
        denoise, mesh=mesh,
        in_specs=(rep, x_spec, rep, rep, batch_spec, batch_spec, batch_spec,
                  freq_spec, freq_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Replicate parameters across the mesh (the reference replicates the
    13B DiT on every rank likewise; weight sharding is a separate memory
    tier — see fp8/offload)."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(params, rep)

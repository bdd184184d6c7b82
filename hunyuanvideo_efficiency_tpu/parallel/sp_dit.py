"""Sequence-parallel DiT forward + denoise loop over a device mesh.

TPU-native replacement for the reference's `parallelize_transformer`
monkey-patch (reference: hyvideo/inference.py:40-104). Instead of patching
`forward` and chunking tensors by rank, the whole forward runs under ONE
`shard_map` over a `jax.sharding.Mesh`:

* the latent travels as FLAT PATCH TOKENS [B, L, C*pt*ph*pw]
  (models/dit.py:patchify_raw), sharded on L over (ulysses, ring) and on B
  over dp. The reference chunks the H axis of the patch grid per rank
  (inference.py:57-64), which requires H' % world == 0 — false for the
  flagship 720p config (H'=45 patch rows vs 8 GPUs forces uneven chunks).
  The flat token count L = T'*H'*W' divides the mesh for every production
  shape (118,800 at 720p, 67,320 at 544p);
* RoPE tables are passed flat [L, head_dim] and sharded on L, so each
  device rotates exactly its own tokens (reference chunks freqs the same
  way it chunks hidden states, inference.py:71-78);
* text states/masks are replicated (joint "rear" strategy);
* attention inside the blocks dispatches to Ulysses x ring
  (parallel/sp_attention.py). Because token shards are CONTIGUOUS ranges
  in device order, the Ulysses head-scatter's seq-gather reassembles the
  full sequence already in global (t, h, w) order — STA's tiling applies
  directly on the gathered sequence (no permutes);
* the output stays token-sharded — no all_gather per step. The Euler
  update is pointwise (scheduling_flow_match_discrete.py:239-242), so the
  latent remains sharded across ALL denoise steps and is gathered exactly
  once before VAE decode — eliminating the reference's per-step
  `sp_group.all_gather` (inference.py:97-100).
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.scheduler import euler_step
from ..models.dit import dit_forward_tokens
from ..models.dit_config import DiTConfig
from .mesh import DP_AXIS, RING_AXIS, SP_AXES, ULYSSES_AXIS, ParallelConfig

TOKEN_SPEC = P(DP_AXIS, SP_AXES, None)
FREQ_SPEC = P(SP_AXES, None)
REP = P()
BATCH_SPEC = P(DP_AXIS)


def _sp_cfg(cfg: DiTConfig, pcfg: ParallelConfig) -> DiTConfig:
    return replace(
        cfg,
        ulysses_axis=ULYSSES_AXIS if pcfg.ulysses_degree > 1 else None,
        ring_axis=RING_AXIS if pcfg.ring_degree > 1 else None,
    )


def check_sp_compat(cfg: DiTConfig, pcfg: ParallelConfig,
                    token_grid: Tuple[int, int, int], batch: int) -> None:
    """Validate that (model, shape, mesh) can shard; raise a readable error
    instead of a shard_map divisibility failure (the reference asserts the
    analogous constraints in inference.py:166-175)."""
    n_tokens = int(np.prod(token_grid))
    sp = pcfg.sp_degree
    if n_tokens % sp:
        raise ValueError(
            f"token count {n_tokens} (grid {token_grid}) is not divisible "
            f"by the sequence-parallel degree {sp} "
            f"(ulysses {pcfg.ulysses_degree} x ring {pcfg.ring_degree})")
    if cfg.heads_num % pcfg.ulysses_degree:
        raise ValueError(
            f"heads_num {cfg.heads_num} not divisible by ulysses degree "
            f"{pcfg.ulysses_degree}")
    if batch % pcfg.dp_degree:
        raise ValueError(
            f"batch {batch} not divisible by dp degree {pcfg.dp_degree}")
    if cfg.attn_mode.startswith("sta") and pcfg.ring_degree > 1:
        # ring x STA runs via t-slab halo exchange
        # (sp_attention._ring_sta_halo) when the geometry admits clean
        # tile-aligned slabs; otherwise reject with the constraint spelled
        # out (the reference's xfuser USP is dense-only either way).
        r = pcfg.ring_degree
        tt = cfg.sta_tile[0]
        wt = cfg.sta_window[0]
        t = token_grid[0]
        if (wt % 2 == 0 or t % (r * tt) != 0
                or t // r < (wt // 2) * tt):
            raise ValueError(
                f"attn_mode='sta' with ring_degree {r} needs t-slab halo "
                f"exchange: T={t} must be divisible by ring*tile_t "
                f"({r}*{tt}), each slab (T/r={t // r} planes) must cover "
                f"the halo ({wt // 2}*{tt} planes), and the t window "
                f"({wt}) must be odd — use a pure-Ulysses factorization "
                f"for this shape instead")


def cfg_reorder_for_dp(arr: jnp.ndarray, dp: int) -> jnp.ndarray:
    """Reorder a CFG-concatenated batch [neg(B) | pos(B)] so that sharding
    the leading axis over `dp` gives every dp shard its own [neg | pos]
    pair (the in-shard CFG concat in the denoise body assumes local
    [neg_i | pos_i] ordering)."""
    if dp <= 1:
        return arr
    b2 = arr.shape[0]
    b = b2 // 2
    bs = b // dp
    idx = np.concatenate([
        np.concatenate([np.arange(d * bs, (d + 1) * bs),
                        b + np.arange(d * bs, (d + 1) * bs)])
        for d in range(dp)])
    return arr[jnp.asarray(idx)]


def cfg_unreorder_for_dp(arr: jnp.ndarray, dp: int) -> jnp.ndarray:
    """Inverse of cfg_reorder_for_dp."""
    if dp <= 1:
        return arr
    b2 = arr.shape[0]
    b = b2 // 2
    bs = b // dp
    idx = np.concatenate([
        np.concatenate([np.arange(d * bs, (d + 1) * bs),
                        b + np.arange(d * bs, (d + 1) * bs)])
        for d in range(dp)])
    inv = np.argsort(idx)
    return arr[jnp.asarray(inv)]


def make_sp_dit_forward(mesh: Mesh, cfg: DiTConfig, pcfg: ParallelConfig,
                        token_grid: Optional[Tuple[int, int, int]] = None,
                        param_axes: Optional[Dict[str, Any]] = None):
    """Returns a jitted sharded token-form forward:
    (params, x_tokens [B, L, C*ppp], t, text_states, text_mask,
     text_states_2, f_cos [L, D], f_sin, guidance) -> v tokens (same spec).

    x_tokens is sharded on batch (dp) and tokens (ulysses*ring); the output
    keeps the same sharding. `token_grid` is the GLOBAL patch grid
    (required for STA; optional otherwise). `param_axes` (from
    shard_dit_params) enables the sharded-weight tier.
    """
    cfg = _sp_cfg(cfg, pcfg)
    grid = tuple(token_grid) if token_grid is not None else None
    gather = make_param_gather(param_axes) if param_axes is not None else None

    def local_fwd(params, x_tok, t, text_states, text_mask, text_states_2,
                  f_cos, f_sin, guidance):
        return dit_forward_tokens(params, x_tok, t, text_states, text_mask,
                                  text_states_2, f_cos, f_sin, guidance,
                                  cfg=cfg, token_grid=grid,
                                  param_gather=gather)

    fwd = jax.shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(param_in_specs(param_axes), TOKEN_SPEC, BATCH_SPEC,
                  BATCH_SPEC, BATCH_SPEC, BATCH_SPEC, FREQ_SPEC, FREQ_SPEC,
                  BATCH_SPEC),
        out_specs=TOKEN_SPEC,
        check_vma=False,
    )
    return jax.jit(fwd)


def _denoise_body(params, lat, sigma, sigma_next, t, pe, mask, pe2,
                  f_cos, f_sin, cfg_l, token_grid, do_cfg, mult,
                  guidance_scale, embedded_guidance_scale, guidance_rescale,
                  param_gather=None):
    """One sharded denoise step on token-form latents (runs inside
    shard_map). Identical math to diffusion/pipeline.py:denoise_step."""
    lat_in = jnp.concatenate([lat] * mult, 0) if do_cfg else lat
    t_exp = jnp.full((lat_in.shape[0],), t, jnp.float32)
    guidance = None
    if cfg_l.guidance_embed:
        guidance = jnp.full(
            (lat_in.shape[0],),
            (embedded_guidance_scale or 0.0) * 1000.0, jnp.float32)
    v = dit_forward_tokens(params, lat_in, t_exp, pe, mask, pe2,
                           f_cos, f_sin, guidance, cfg=cfg_l,
                           token_grid=token_grid,
                           param_gather=param_gather)
    v = v.astype(jnp.float32)
    if do_cfg:
        v_u, v_t = jnp.split(v, 2, axis=0)
        v = v_u + guidance_scale * (v_t - v_u)
        if guidance_rescale > 0.0:
            # per-sample stds need the moments of the FULL latent; tokens
            # are sharded over the sp axes only (dp shards distinct
            # samples and must NOT be mixed)
            axes = (ULYSSES_AXIS, RING_AXIS)
            red = tuple(range(1, v.ndim))
            ex2 = lax.pmean(jnp.mean(v ** 2, axis=red, keepdims=True), axes)
            ex = lax.pmean(jnp.mean(v, axis=red, keepdims=True), axes)
            et2 = lax.pmean(jnp.mean(v_t.astype(jnp.float32) ** 2,
                                     axis=red, keepdims=True), axes)
            et = lax.pmean(jnp.mean(v_t.astype(jnp.float32),
                                    axis=red, keepdims=True), axes)
            std_cfg = jnp.sqrt(jnp.maximum(ex2 - ex ** 2, 1e-20))
            std_t = jnp.sqrt(jnp.maximum(et2 - et ** 2, 1e-20))
            rescaled = v * (std_t / std_cfg)
            v = guidance_rescale * rescaled + (1 - guidance_rescale) * v
    return euler_step(lat, v, sigma, sigma_next)


def make_sp_denoise_fn(
    mesh: Mesh,
    cfg: DiTConfig,
    pcfg: ParallelConfig,
    *,
    do_cfg: bool,
    guidance_scale: float = 1.0,
    embedded_guidance_scale: Optional[float] = None,
    guidance_rescale: float = 0.0,
    token_grid: Optional[Tuple[int, int, int]] = None,
    param_axes: Optional[Dict[str, Any]] = None,
):
    """Returns a jitted fn running the FULL denoise scan with the latent
    token-sharded throughout:

    (params, tokens [B, L, C*ppp], sigmas, timesteps, pe, mask, pe2,
     f_cos [L, D], f_sin) -> final tokens (same sharding as input).
    """
    cfg_l = _sp_cfg(cfg, pcfg)
    mult = 2 if do_cfg else 1
    grid = tuple(token_grid) if token_grid is not None else None
    gather = make_param_gather(param_axes) if param_axes is not None else None

    def denoise(params, tokens, sigmas, timesteps, pe, mask, pe2,
                f_cos, f_sin):
        def body(lat, step):
            sigma, sigma_next, t = step
            lat = _denoise_body(
                params, lat, sigma, sigma_next, t, pe, mask, pe2,
                f_cos, f_sin, cfg_l, grid, do_cfg, mult, guidance_scale,
                embedded_guidance_scale, guidance_rescale,
                param_gather=gather)
            return lat, None

        lat, _ = jax.lax.scan(body, tokens.astype(jnp.float32),
                              (sigmas[:-1], sigmas[1:], timesteps))
        return lat

    sharded = jax.shard_map(
        denoise, mesh=mesh,
        in_specs=(param_in_specs(param_axes), TOKEN_SPEC, REP, REP,
                  BATCH_SPEC, BATCH_SPEC, BATCH_SPEC, FREQ_SPEC, FREQ_SPEC),
        out_specs=TOKEN_SPEC,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sp_step_fn(
    mesh: Mesh,
    cfg: DiTConfig,
    pcfg: ParallelConfig,
    *,
    do_cfg: bool,
    guidance_scale: float = 1.0,
    embedded_guidance_scale: Optional[float] = None,
    guidance_rescale: float = 0.0,
    token_grid: Optional[Tuple[int, int, int]] = None,
    param_axes: Optional[Dict[str, Any]] = None,
):
    """Single sharded denoise step, one dispatch per call — the host-driven
    alternative to the fused sharded scan (progress callbacks, early abort,
    per-program device time bounded by one step; required where the runtime
    limits program duration — see CLAUDE.md). The token carry stays sharded
    BETWEEN dispatches (committed arrays keep their sharding), so the
    per-step host loop still gathers nothing.

    (params, tokens, sigma, sigma_next, t, pe, mask, pe2, f_cos, f_sin)
      -> tokens (same sharding).
    """
    cfg_l = _sp_cfg(cfg, pcfg)
    mult = 2 if do_cfg else 1
    grid = tuple(token_grid) if token_grid is not None else None
    gather = make_param_gather(param_axes) if param_axes is not None else None

    def step(params, tokens, sigma, sigma_next, t, pe, mask, pe2,
             f_cos, f_sin):
        return _denoise_body(
            params, tokens.astype(jnp.float32), sigma, sigma_next, t,
            pe, mask, pe2, f_cos, f_sin, cfg_l, grid, do_cfg, mult,
            guidance_scale, embedded_guidance_scale, guidance_rescale,
            param_gather=gather)

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(param_in_specs(param_axes), TOKEN_SPEC, REP, REP, REP,
                  BATCH_SPEC, BATCH_SPEC, BATCH_SPEC, FREQ_SPEC, FREQ_SPEC),
        out_specs=TOKEN_SPEC,
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Replicate parameters across the mesh (the reference replicates the
    13B DiT on every rank likewise; weight sharding is a separate memory
    tier — see shard_dit_params)."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(params, rep)


# ---------------------------------------------------------------------------
# Sharded-weight memory tier (beyond reference: the reference replicates the
# 13B DiT on every rank, hyvideo/inference.py — 12.4 GB int8 per chip at any
# world size). Here the stacked double/single block params shard over the
# sp axes and are re-gathered chunk-by-chunk inside the forward
# (models/dit.py:scan_range), so per-device persistent weight memory is
# stack/sp + one transient chunk: ~1.6 + 3.1 GB at sp=8, chunks=4, vs
# 12.4 GB replicated — freeing ~8-11 GB/chip for bigger VAE tile batches.
# ---------------------------------------------------------------------------

_STACK_KEYS = ("double_blocks", "single_blocks")


def _gather_axes_tree(params: Dict[str, Any], sp: int) -> Dict[str, Any]:
    """Per-leaf weight-shard axis for the block stacks: the LAST non-depth
    axis divisible by the sp degree, or -1 (replicate). Axis 0 is the
    scan depth and must stay whole (chunks slice it locally)."""
    def leaf_axis(a):
        for ax in range(a.ndim - 1, 0, -1):
            if a.shape[ax] % sp == 0 and a.shape[ax] >= sp:
                return ax
        return -1

    return {k: (jax.tree.map(leaf_axis, params[k]) if k in _STACK_KEYS
                else jax.tree.map(lambda a: -1, params[k]))
            for k in params}


def _axis_to_spec(i: int) -> P:
    return P() if i < 0 else P(*([None] * i + [SP_AXES]))


def shard_dit_params(params: Dict[str, Any], mesh: Mesh,
                     pcfg: ParallelConfig):
    """Place the DiT params with the block stacks weight-sharded over the
    sp axes. Returns (placed_params, axes_tree); pass axes_tree as
    `param_axes` to the make_sp_* builders. Falls back to full replication
    (axes_tree None) when the sp degree is 1."""
    sp = pcfg.sp_degree
    if sp <= 1:
        return shard_params(params, mesh), None
    axes_tree = _gather_axes_tree(params, sp)
    placed = {
        k: jax.tree.map(
            lambda a, i: jax.device_put(
                a, NamedSharding(mesh, _axis_to_spec(i))),
            params[k], axes_tree[k])
        for k in params}
    return placed, axes_tree


def make_param_gather(axes_tree: Dict[str, Any]):
    """The chunk re-gather hook for dit_forward_tokens: all_gather each
    weight-sharded leaf of a stacked-chunk pytree back to full width."""
    def gather(chunk, name):
        return jax.tree.map(
            lambda a, i: a if i < 0 else lax.all_gather(
                a, SP_AXES, axis=i, tiled=True),
            chunk, axes_tree[name])

    return gather


def param_in_specs(axes_tree: Optional[Dict[str, Any]]):
    """shard_map in_specs entry for the params argument."""
    if axes_tree is None:
        return REP
    return jax.tree.map(_axis_to_spec, axes_tree)

"""Runtime-aware denoise dispatch planning.

The reference simply runs its per-step Python loop (reference:
hyvideo/diffusion/pipelines/pipeline_hunyuan_video.py:960-1045) — on CUDA a
kernel launch is microseconds and a step is thousands of launches, so there
is nothing to plan. Under XLA the SAME loop compiles into a handful of large
programs, and the right program granularity depends on the deployment:

* unconstrained runtime -> fuse ALL steps into one `lax.scan` program
  (zero host round-trips, maximal scheduling freedom);
* runtimes that bound single-program device time (preemptible schedulers,
  watchdog-guarded tunnels like this environment's ~60 s limit — CLAUDE.md)
  -> one program per step, or for big configs one program per BLOCK CHUNK
  of the DiT forward (models/dit.py:dit_forward_staged).

`plan_dispatch` picks that granularity from an analytic FLOP model of the
step and a conservative sustained-throughput estimate, so entry points
(sample_video.py etc.) survive any runtime with default flags instead of
requiring the operator to know the watchdog budget. Callers that pass
explicit `scan_denoise` / `block_chunks` are never second-guessed.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

from ..models.dit_config import DiTConfig

# Conservative sustained TFLOP/s for the big matmuls/attention on one chip.
# v5e peaks at ~197 bf16; we measured 83-91% MXU utilization on the DiT hot
# loop, and int8 paths run faster — 120 underestimates throughput by ~1.5-2x
# (verified against the measured 74.7 s dense / 17.9 s STA 720p steps), which
# is the right direction for a watchdog plan: overestimate time, never
# undershoot safety.
_DEFAULT_TFLOPS = 120.0
# Fraction of the watchdog budget a single program may use (headroom for
# step-to-step variance and the tunnel's dispatch jitter).
_BUDGET_FRAC = 0.8
# This environment's on-device program watchdog (~60 s; CLAUDE.md).
_DEFAULT_WATCHDOG_S = 55.0


@dataclass(frozen=True)
class DispatchPlan:
    scan_denoise: bool
    block_chunks: Optional[Tuple[int, int]]
    est_step_s: float  # estimated single-step on-device seconds (diagnostic)


def _attn_sparsity(cfg: DiTConfig, token_grid: Tuple[int, int, int]) -> float:
    """Fraction of key tiles each query tile attends to under STA, with a
    2x fudge for partial window tiles and kernel overhead (matches the
    measured dense/STA step ratio at 720p within ~20%)."""
    tiles = 1
    window = 1
    for g, tl, w in zip(token_grid, cfg.sta_tile, cfg.sta_window):
        n = -(-g // tl)
        tiles *= n
        window *= min(w, n)
    return min(1.0, 2.0 * window / tiles)


def estimate_step_seconds(
    cfg: DiTConfig,
    token_grid: Tuple[int, int, int],
    *,
    batch: int = 1,
    do_cfg: bool = False,
    sp_degree: int = 1,
    throughput_tflops: Optional[float] = None,
) -> Tuple[float, float, float]:
    """Analytic (total, double-stack, single-stack) on-device seconds for
    ONE denoise step on one device.

    FLOP model: linears at 2 FLOPs/param/token — per-block params are
    36 h^2 (double: per-stream qkv 3h^2 + proj h^2 + mlp 8h^2 + adaLN 6h^2,
    x2 streams) and 15 h^2 (single: fused (3+r)h^2 in, (1+r)h^2 out, 3h^2
    modulation) — plus 4 L^2 (h) per block of attention, scaled by the STA
    sparsity when cfg.attn_mode is sta. Text tokens (~256) are negligible
    against 10^5 img tokens and ignored.
    """
    tput = (throughput_tflops if throughput_tflops is not None
            else float(os.environ.get("HYV_PLAN_TFLOPS", _DEFAULT_TFLOPS)))
    tput *= 1e12
    h = cfg.hidden_size
    r = cfg.mlp_width_ratio
    nd, ns = cfg.mm_double_blocks_depth, cfg.mm_single_blocks_depth
    tokens = 1
    for g in token_grid:
        tokens *= g
    eff_batch = batch * (2 if do_cfg else 1)
    l_loc = tokens / max(1, sp_degree)  # per-device tokens under SP

    lin_d = 2.0 * ((4 + 2 * r) * 2 + 12) * h * h * nd * l_loc * eff_batch
    lin_s = 2.0 * ((3 + r) + (1 + r) + 3) * h * h * ns * l_loc * eff_batch

    sparsity = 1.0
    if cfg.attn_mode.startswith("sta"):
        sparsity = _attn_sparsity(cfg, token_grid)
    # each device still attends its queries against the full key set
    # (Ulysses gathers, ring streams) -> L_loc x L pairs
    attn = 4.0 * l_loc * tokens * h * eff_batch * sparsity
    attn_d, attn_s = attn * nd, attn * ns

    t_d = (lin_d + attn_d) / tput
    t_s = (lin_s + attn_s) / tput
    return t_d + t_s, t_d, t_s


def plan_dispatch(
    cfg: DiTConfig,
    latent_shape: Tuple[int, int, int, int, int],
    *,
    num_steps: int,
    do_cfg: bool = False,
    sp_degree: int = 1,
    backend: Optional[str] = None,
    watchdog_s: Optional[float] = None,
    throughput_tflops: Optional[float] = None,
) -> DispatchPlan:
    """Choose (scan_denoise, block_chunks) for a denoise run.

    latent_shape: [B, C, T', H', W'] (pre-patchify). backend defaults to
    `jax.default_backend()`; the watchdog budget applies only on TPU (the
    tunnel kills ~60 s programs — CLAUDE.md) and can be overridden via
    HYV_WATCHDOG_S (set <= 0 to disable).
    """
    if backend is None:
        import jax

        backend = jax.default_backend()
    if watchdog_s is None:
        env = os.environ.get("HYV_WATCHDOG_S")
        if env is not None:
            watchdog_s = float(env)
        elif backend == "tpu":
            watchdog_s = _DEFAULT_WATCHDOG_S

    b, _, lt_, lh, lw = latent_shape
    pt, ph, pw = cfg.patch_size
    grid = (lt_ // pt, lh // ph, lw // pw)
    est, est_d, est_s = estimate_step_seconds(
        cfg, grid, batch=b, do_cfg=do_cfg, sp_degree=sp_degree,
        throughput_tflops=throughput_tflops)

    if watchdog_s is None or watchdog_s <= 0:
        return DispatchPlan(True, None, est)

    budget = watchdog_s * _BUDGET_FRAC
    if num_steps * est <= budget:
        return DispatchPlan(True, None, est)
    if est <= budget:
        return DispatchPlan(False, None, est)
    dc = max(1, int(-(-est_d // budget)))
    sc = max(1, int(-(-est_s // budget)))
    dc = min(dc, cfg.mm_double_blocks_depth)
    sc = min(sc, cfg.mm_single_blocks_depth)
    return DispatchPlan(False, (dc, sc), est)

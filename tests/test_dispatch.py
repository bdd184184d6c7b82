"""Runtime-aware dispatch planning (diffusion/dispatch.py): the auto
scan/per-step/block-chunk decision that keeps default-flag runs alive under
a program-duration watchdog (CLAUDE.md's ~60 s limit)."""
import pytest

from hunyuanvideo_efficiency_tpu.diffusion.dispatch import (
    DispatchPlan, estimate_step_seconds, plan_dispatch)
from hunyuanvideo_efficiency_tpu.models.dit_config import (DiTConfig,
                                                           load_dit_config)

SHAPE_720P = (1, 16, 33, 720 // 8, 1280 // 8)
SHAPE_544P = (1, 16, 33, 544 // 8, 960 // 8)


def test_unconstrained_backend_fuses_scan():
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="sta")
    plan = plan_dispatch(cfg, SHAPE_720P, num_steps=50, backend="cpu")
    assert plan == DispatchPlan(True, None, plan.est_step_s)


def test_watchdog_720p_sta_single_step_unchunked():
    """The flagship config: one STA step measured 17.85 s on-chip — the
    plan must pick per-step dispatch WITHOUT chunking (chunking costs
    ~2.5% — BENCH r2) and never the 50-step fused scan."""
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="sta")
    plan = plan_dispatch(cfg, SHAPE_720P, num_steps=50, backend="tpu",
                         watchdog_s=55.0)
    assert plan.scan_denoise is False
    assert plan.block_chunks is None
    # the estimate must be conservative (above the measured 17.85 s) but
    # still under the budget that forces chunking
    assert 17.85 < plan.est_step_s < 44.0


def test_watchdog_720p_dense_chunks():
    """Dense 720p measured 74.7 s/step — over the ~60 s watchdog; the plan
    must cut the DiT forward into block chunks, each under budget."""
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="flash")
    plan = plan_dispatch(cfg, SHAPE_720P, num_steps=50, backend="tpu",
                         watchdog_s=55.0)
    assert plan.scan_denoise is False
    assert plan.block_chunks is not None
    dc, sc = plan.block_chunks
    assert 1 <= dc <= cfg.mm_double_blocks_depth
    assert 1 <= sc <= cfg.mm_single_blocks_depth
    _, est_d, est_s = estimate_step_seconds(cfg, (33, 45, 80))
    assert est_d / dc <= 55.0 * 0.8 + 1e-6
    assert est_s / sc <= 55.0 * 0.8 + 1e-6


def test_tiny_config_scans_even_on_tpu():
    cfg = DiTConfig(hidden_size=128, heads_num=4, mm_double_blocks_depth=2,
                    mm_single_blocks_depth=2, rope_dim_list=(8, 12, 12))
    plan = plan_dispatch(cfg, (1, 16, 3, 8, 8), num_steps=50,
                         backend="tpu", watchdog_s=55.0)
    assert plan.scan_denoise is True


def test_sp_degree_scales_estimate():
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="flash")
    est1, _, _ = estimate_step_seconds(cfg, (33, 45, 80))
    est8, _, _ = estimate_step_seconds(cfg, (33, 45, 80), sp_degree=8)
    assert abs(est1 / est8 - 8.0) < 1e-6


def test_cfg_doubles_estimate():
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="flash")
    est, _, _ = estimate_step_seconds(cfg, (33, 45, 80))
    est_cfg, _, _ = estimate_step_seconds(cfg, (33, 45, 80), do_cfg=True)
    assert abs(est_cfg / est - 2.0) < 1e-6


def test_watchdog_env_override(monkeypatch):
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="sta")
    monkeypatch.setenv("HYV_WATCHDOG_S", "0")
    plan = plan_dispatch(cfg, SHAPE_720P, num_steps=50, backend="tpu")
    assert plan.scan_denoise is True
    monkeypatch.setenv("HYV_WATCHDOG_S", "55")
    plan = plan_dispatch(cfg, SHAPE_720P, num_steps=50, backend="tpu")
    assert plan.scan_denoise is False


def test_sta_sparsity_uses_window_over_tiles():
    """STA estimate must sit well below dense for the same shape."""
    dense = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="flash")
    sta = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="sta")
    e_dense, _, _ = estimate_step_seconds(dense, (33, 45, 80))
    e_sta, _, _ = estimate_step_seconds(sta, (33, 45, 80))
    assert e_sta < 0.5 * e_dense

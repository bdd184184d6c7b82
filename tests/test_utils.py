"""Utility subsystem tests: orbax IO, profiling helpers, env fingerprint."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestOrbaxIO:
    def test_save_restore_roundtrip(self, tmp_path):
        from hunyuanvideo_efficiency_tpu.utils.orbax_io import (
            load_params_orbax, save_params_orbax)

        tree = {"a": jnp.arange(12.0).reshape(3, 4),
                "blocks": {"kernel": jnp.ones((2, 5), jnp.bfloat16),
                           "bias": jnp.zeros((5,))}}
        path = str(tmp_path / "ckpt")
        save_params_orbax(path, tree)
        restored = load_params_orbax(path)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))

    def test_restore_with_target(self, tmp_path):
        from hunyuanvideo_efficiency_tpu.utils.orbax_io import (
            load_params_orbax, save_params_orbax)

        tree = {"w": jnp.ones((4, 4))}
        path = str(tmp_path / "ckpt2")
        save_params_orbax(path, tree)
        restored = load_params_orbax(path, target=tree)
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.asarray(tree["w"]))


class TestProfiling:
    def test_phase_timer(self):
        import time

        from hunyuanvideo_efficiency_tpu.utils.profiling import PhaseTimer

        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("b"):
            pass
        assert t.phases["a"] >= 0.01
        assert "a=" in t.summary() and "total=" in t.summary()

    def test_maybe_trace_noop(self):
        from hunyuanvideo_efficiency_tpu.utils.profiling import maybe_trace

        with maybe_trace(None):
            x = jnp.ones(3) + 1
        assert float(x[0]) == 2.0

    def test_maybe_trace_writes(self, tmp_path):
        from hunyuanvideo_efficiency_tpu.utils.profiling import maybe_trace

        d = str(tmp_path / "prof")
        with maybe_trace(d):
            jnp.ones(8).sum().block_until_ready()
        import os

        assert os.path.isdir(d) and os.listdir(d)


class TestCollectEnv:
    def test_fingerprint_keys(self):
        from hunyuanvideo_efficiency_tpu.utils.collect_env import collect_env

        env = collect_env()
        assert "JAX" in env and "Default backend" in env
        assert env["numpy"] != "not installed"


class TestNativeMetricsCore:
    def test_parity_with_python(self):
        from hunyuanvideo_efficiency_tpu.native import load_metrics_core
        from hunyuanvideo_efficiency_tpu.evaluation.metrics import psnr, ssim

        core = load_metrics_core()
        if core is None:
            pytest.skip("no C++ toolchain")
        rng = np.random.RandomState(1)
        a = rng.randint(0, 255, (3, 48, 64, 3), np.uint8)
        b = np.clip(a + rng.randint(-30, 30, a.shape), 0, 255).astype(np.uint8)
        np.testing.assert_allclose(
            core.psnr_frames(a, b),
            [psnr(a[t], b[t]) for t in range(3)], rtol=1e-12)
        np.testing.assert_allclose(
            core.ssim_frames(a, b),
            [ssim(a[t], b[t]) for t in range(3)], rtol=1e-10)

    def test_video_metrics_route_through_native(self):
        from hunyuanvideo_efficiency_tpu.evaluation import (psnr_video,
                                                            ssim_video)

        rng = np.random.RandomState(2)
        a = rng.randint(0, 255, (2, 33, 33, 3), np.uint8)
        assert psnr_video(a, a) == float("inf")
        assert ssim_video(a, a) == pytest.approx(1.0)


class TestCompileCache:
    def test_enable_sets_config_and_creates_dir(self, tmp_path):
        import jax

        from hunyuanvideo_efficiency_tpu.utils.compile_cache import (
            enable_compilation_cache)

        target = tmp_path / "xla_cache"
        path = enable_compilation_cache(str(target))
        assert path == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)

    def test_disabled_modes(self, monkeypatch, tmp_path):
        from hunyuanvideo_efficiency_tpu.utils import compile_cache

        assert compile_cache.enable_compilation_cache("") is None
        assert compile_cache.enable_compilation_cache("0") is None
        monkeypatch.setenv(compile_cache._ENV, "0")
        assert compile_cache.enable_compilation_cache() is None
        # env path resolution
        monkeypatch.setenv(compile_cache._ENV, str(tmp_path / "envdir"))
        path = compile_cache.enable_compilation_cache()
        assert path == str(tmp_path / "envdir")

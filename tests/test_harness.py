"""Data tooling, evaluation metrics, and experiment harness tests."""
import json
import os

import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.data import (VideoTensorDataset,
                                              save_tensor, tensor_to_video,
                                              video_to_tensor)
from hunyuanvideo_efficiency_tpu.evaluation import (
    compute_metrics_dir, frechet_distance, gaussian_stats, psnr, psnr_video,
    ssim, ssim_video)
from hunyuanvideo_efficiency_tpu.experiments import (base_config,
                                                     enumerate_configs,
                                                     write_configs)
from hunyuanvideo_efficiency_tpu.models.vae_config import TOpsConfig


class TestMetrics:
    def test_psnr_identity_and_known(self):
        a = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3))
        assert psnr(a, a) == float("inf")
        b = a.astype(np.float64) + 10.0  # MSE 100 -> PSNR 28.13
        assert abs(psnr(a, b) - 28.1308) < 1e-3

    def test_psnr_video_averages(self):
        a = np.zeros((3, 16, 16, 3))
        b = np.zeros((3, 16, 16, 3))
        b[1] += 10.0
        v = psnr_video(a, b)
        assert np.isfinite(v)

    def test_ssim_identity(self):
        a = np.random.RandomState(1).rand(33, 33, 3) * 255
        assert ssim(a, a) == pytest.approx(1.0)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.RandomState(2)
        a = rng.rand(48, 48, 3) * 255
        s1 = ssim(a, a + rng.randn(48, 48, 3) * 5)
        s2 = ssim(a, a + rng.randn(48, 48, 3) * 40)
        assert 1.0 > s1 > s2

    def test_ssim_video(self):
        rng = np.random.RandomState(3)
        a = rng.rand(2, 40, 40, 3) * 255
        assert ssim_video(a, a) == pytest.approx(1.0)

    def test_frechet_distance_zero_and_mean_shift(self):
        rng = np.random.RandomState(4)
        f = rng.randn(500, 8)
        mu, sig = gaussian_stats(f)
        assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
        mu2 = mu + 2.0
        d = frechet_distance(mu, sig, mu2, sig)
        assert d == pytest.approx(4.0 * 8, rel=1e-3)  # ||diff||^2


class TestLPIPS:
    def test_lpips_zero_for_identical_and_positive_for_noise(self):
        from hunyuanvideo_efficiency_tpu.evaluation import (
            lpips_video, random_lpips_params)

        params = random_lpips_params()
        rng = np.random.RandomState(0)
        a = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        assert lpips_video(params, a, a) == pytest.approx(0.0, abs=1e-6)
        b = np.clip(a + rng.randint(-60, 60, a.shape), 0, 255).astype(np.uint8)
        assert lpips_video(params, a, b) > 0


class TestDataTools:
    def test_tensor_roundtrip(self, tmp_path):
        arr = np.random.RandomState(0).rand(3, 4, 16, 16).astype(np.float32)
        save_tensor(str(tmp_path / "a.pt"), arr)
        ds = VideoTensorDataset(str(tmp_path))
        assert len(ds) == 1
        got, name = ds[0]
        assert name == "a.pt"
        np.testing.assert_allclose(got, arr)

    def test_mp4_roundtrip(self, tmp_path):
        # smooth gradient content (random noise does not survive mp4v)
        y = np.linspace(-1, 1, 48)[None, None, :, None]
        x = np.linspace(-1, 1, 64)[None, None, None, :]
        t = np.linspace(-0.5, 0.5, 6)[None, :, None, None]
        arr = np.broadcast_to(
            (y + x) / 2 * np.ones((3, 1, 1, 1)) + t,
            (3, 6, 48, 64)).astype(np.float32).clip(-1, 1)
        path = str(tmp_path / "v.mp4")
        tensor_to_video(arr, path)
        back = video_to_tensor(path, target_short=None)
        assert back.shape == arr.shape
        # lossy codec: just require gross agreement
        assert np.mean(np.abs(back - arr)) < 0.1

    def test_video_to_tensor_resizes(self, tmp_path):
        arr = np.zeros((3, 4, 96, 128), np.float32)
        path = str(tmp_path / "v.mp4")
        tensor_to_video(arr, path)
        small = video_to_tensor(path, target_short=48)
        assert min(small.shape[2], small.shape[3]) == 48


class TestComputeMetricsDir:
    def test_pairs_and_report(self, tmp_path):
        orig = tmp_path / "orig"
        recon = tmp_path / "recon"
        orig.mkdir()
        recon.mkdir()
        rng = np.random.RandomState(0)
        for name in ("a", "b"):
            arr = rng.rand(3, 4, 32, 32).astype(np.float32) * 2 - 1
            save_tensor(str(orig / f"{name}.pt"), arr)
            noisy = np.clip(arr + rng.randn(*arr.shape) * 0.05, -1, 1)
            save_tensor(str(recon / f"{name}.pt"), noisy.astype(np.float32))
        dm = compute_metrics_dir(str(orig), str(recon))
        assert len(dm.pairs) == 2
        assert 15 < dm.mean_psnr < 40
        assert 0 < dm.mean_ssim <= 1
        reports = [f for f in os.listdir(recon) if f.startswith("metrics_")]
        assert len(reports) == 1


class TestEnumeration:
    def test_base_config_parses(self):
        cfg = TOpsConfig.from_dict(base_config())
        assert len(cfg.down_blocks) == 4
        assert len(cfg.up_blocks) == 4
        assert cfg.down_blocks[1].downsample_stride == (2, 2, 2)

    def test_pool_mode_one_hot(self):
        configs = list(enumerate_configs("pool", cap=10))
        assert len(configs) == 10
        for cfg in configs:
            pools = sum(
                sum(b["enable_t_pool_before_block"])
                + sum(b["enable_t_pool_after_block"])
                for b in cfg["encoder"]["down_blocks"])
            interps = sum(
                sum(b["enable_t_interp_before_block"])
                + sum(b["enable_t_interp_after_block"])
                for b in cfg["decoder"]["up_blocks"])
            assert pools == 1 and interps == 1

    def test_stride_mode_overrides(self):
        configs = list(enumerate_configs("stride", cap=100))
        # 3 stride variants x 24 decoder slots = 72
        assert len(configs) == 72
        changed = [c for c in configs
                   if c["encoder"]["down_blocks"][0]["downsample_stride"]
                   == [2, 2, 2]]
        assert len(changed) == 24

    def test_write_configs_loadable(self, tmp_path):
        paths = write_configs(str(tmp_path), "stride2", cap=5)
        assert len(paths) == 5
        for p in paths:
            cfg = TOpsConfig.from_json(p)
            n_strides = sum(
                1 for b in range(4)
                if json.load(open(p))["encoder"]["down_blocks"][b]
                ["downsample_stride"] != [[1, 2, 2], [2, 2, 2], [2, 2, 2],
                                          [1, 1, 1]][b])
            assert n_strides == 2


class TestMSSSIMAndRunner:
    def test_ms_ssim_identity_and_noise(self):
        from hunyuanvideo_efficiency_tpu.evaluation import ms_ssim

        rng = np.random.RandomState(5)
        a = rng.rand(128, 128, 3) * 255
        assert ms_ssim(a, a) == pytest.approx(1.0, abs=1e-6)
        b = np.clip(a + rng.randn(128, 128, 3) * 30, 0, 255)
        v = ms_ssim(a, b)
        assert 0 < v < 1

    def test_per_video_metrics_csv(self, tmp_path):
        from hunyuanvideo_efficiency_tpu.evaluation import per_video_metrics

        rng = np.random.RandomState(6)
        v1 = rng.randint(0, 255, (2, 3, 96, 96, 3)).astype(np.uint8)
        v2 = np.clip(v1 + rng.randint(-20, 20, v1.shape), 0, 255).astype(np.uint8)
        out = str(tmp_path / "m.csv")
        rows = per_video_metrics(v1, v2, out_csv=out)
        assert len(rows) == 2
        assert all(np.isfinite(r["psnr"]) for r in rows)
        assert os.path.exists(out)

    def test_demo_golden_values(self):
        """Zeros vs ones: PSNR must be exactly 0 dB; SSIM near 0; the
        Frechet self-distance must be ~0 (reference demo.py semantics)."""
        from hunyuanvideo_efficiency_tpu.evaluation import demo

        out = demo(n=2, frames=4, size=32)
        assert out["psnr"] == pytest.approx(0.0, abs=1e-6)
        assert abs(out["ssim"]) < 1e-3
        assert out["frechet_self"] == pytest.approx(0.0, abs=1e-5)


def _textured_videos(n, t, size, shift, seed):
    """Random-texture videos translated by `shift` px/frame (trackable)."""
    rng = np.random.RandomState(seed)
    vids = np.empty((n, t, size, size, 3), np.uint8)
    for i in range(n):
        # smooth the texture so Lucas-Kanade has clean gradients
        tex = rng.rand(size, size, 3)
        k = np.ones((5, 5)) / 25.0
        from scipy.ndimage import convolve

        tex = np.stack([convolve(tex[..., c], k, mode="wrap")
                        for c in range(3)], -1)
        tex = (tex * 255).astype(np.uint8)
        for f in range(t):
            vids[i, f] = np.roll(tex, (f * shift, f * shift), axis=(0, 1))
    return vids


class TestFVMD:
    def test_tracker_recovers_translation(self):
        from hunyuanvideo_efficiency_tpu.evaluation import track_keypoints

        vid = _textured_videos(1, 8, 96, shift=2, seed=0)[0]
        tracks, valid = track_keypoints(vid, grid=12)
        assert valid.sum() > 20
        vel = np.diff(tracks[:, valid], axis=0)  # xy per step
        # np.roll by +2 on (H, W) axes moves content +2 px in x and y
        med = np.median(vel.reshape(-1, 2), axis=0)
        assert np.allclose(med, [2.0, 2.0], atol=0.5)

    def test_fvmd_separates_motion_distributions(self):
        from hunyuanvideo_efficiency_tpu.evaluation import fvmd

        static = _textured_videos(4, 16, 64, shift=0, seed=1)
        moving = _textured_videos(4, 16, 64, shift=2, seed=2)
        moving_b = _textured_videos(4, 16, 64, shift=2, seed=3)

        same = fvmd(moving, moving_b)
        diff = fvmd(static, moving)
        assert diff > same
        assert fvmd(moving, moving) == pytest.approx(0.0, abs=1e-8)

    def test_fvmd_in_per_video_csv(self, tmp_path):
        from hunyuanvideo_efficiency_tpu.evaluation import per_video_metrics

        v1 = _textured_videos(2, 16, 64, shift=1, seed=4)
        v2 = _textured_videos(2, 16, 64, shift=2, seed=5)
        rows = per_video_metrics(v1, v2, with_fvmd=True)
        assert rows[-1]["video"] == "set"
        assert np.isfinite(rows[-1]["fvmd"])


class TestAnalysis:
    def test_parse_and_rank(self, tmp_path):
        from hunyuanvideo_efficiency_tpu.experiments import (
            collect_experiment_metrics, rank_table)

        for name, psnr in (("exp_1", 30.0), ("exp_2", 28.0), ("exp_3", 33.0)):
            d = tmp_path / name
            d.mkdir()
            (d / "metrics_2026-01-01.txt").write_text(
                f"Average PSNR: {psnr}\nAverage SSIM: 0.9\n"
                f"Average LPIPS: 0.05\n")
        rows = collect_experiment_metrics(str(tmp_path))
        assert len(rows) == 3
        ranked = rank_table(rows, "psnr")
        assert [r["exp"] for r in ranked] == ["exp_3", "exp_1", "exp_2"]
        ranked_l = rank_table(rows, "lpips")
        assert len(ranked_l) == 3

    def test_entropy(self):
        from hunyuanvideo_efficiency_tpu.experiments import (
            frame_entropy, temporal_entropy_rate)

        rng = np.random.RandomState(0)
        noise = rng.randint(0, 255, (4, 32, 32), dtype=np.uint8)
        flat = np.zeros((4, 32, 32), np.uint8)
        assert frame_entropy(noise).mean() > 7.0   # near 8 bits
        assert frame_entropy(flat).mean() == 0.0
        static = np.repeat(noise[:1], 4, axis=0)
        assert temporal_entropy_rate(static) == 0.0
        assert temporal_entropy_rate(noise) > 1.0


class TestLPIPSConverter:
    def test_convert_torchvision_layout(self):
        from hunyuanvideo_efficiency_tpu.evaluation import (
            convert_lpips_weights, lpips_video)

        rng = np.random.RandomState(0)
        geom = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
                (256, 256, 3)]
        idx = [0, 3, 6, 8, 10]
        alex_sd = {}
        for (cout, cin, k), i in zip(geom, idx):
            alex_sd[f"features.{i}.weight"] = (
                rng.randn(cout, cin, k, k).astype(np.float32) * 0.05)
            alex_sd[f"features.{i}.bias"] = np.zeros(cout, np.float32)
        lin_sd = {f"lin{i}.model.1.weight":
                  np.abs(rng.randn(1, c, 1, 1)).astype(np.float32) * 0.01
                  for i, c in enumerate((64, 192, 384, 256, 256))}
        params = convert_lpips_weights(alex_sd, lin_sd)
        assert params["features"][0]["kernel"].shape == (11, 11, 3, 64)
        assert params["lins"][2]["kernel"].shape == (1, 1, 384, 1)
        a = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        assert lpips_video(params, a, a) == pytest.approx(0.0, abs=1e-6)
        b = np.clip(a + rng.randint(-50, 50, a.shape), 0, 255).astype(np.uint8)
        assert lpips_video(params, a, b) > 0

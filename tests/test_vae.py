"""Causal-3D VAE tests: shape contracts, causality, tiling, t-ops hooks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.models.vae import (
    AutoencoderKLCausal3D,
    DiagonalGaussian,
    decoder_forward,
    encoder_forward,
    init_vae_params,
)
from hunyuanvideo_efficiency_tpu.models.vae_config import (
    DownBlockTOps,
    MidBlockTOps,
    TOpsConfig,
    UpBlockTOps,
    VAEConfig,
)

TINY = VAEConfig(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    norm_num_groups=4,
    # NOTE: 0.75*sample_tsize (the temporal tile stride) must be divisible by
    # the time ratio 4 for tiling to preserve the (f-1)/4+1 frame contract —
    # the reference's 64 satisfies this; 16 is the smallest test-size that does.
    sample_size=32,
    sample_tsize=16,
)


ENC = jax.jit(encoder_forward, static_argnums=(2, 3))
DEC = jax.jit(decoder_forward, static_argnums=(2, 3))


@pytest.fixture(scope="module")
def vae_params():
    return init_vae_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def tiny_vae(vae_params):
    return AutoencoderKLCausal3D(TINY, vae_params)


def rand_video(t=9, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, 3, t, h, w)), jnp.float32)


class TestShapes:
    def test_encode_shape_884(self, tiny_vae):
        x = rand_video(t=9)
        m = tiny_vae.encode_moments(x)
        # (9-1)/4+1 = 3 latent frames; 32/8 = 4 spatial; 2*latent channels
        assert m.shape == (1, 8, 3, 4, 4)

    def test_decode_shape(self, tiny_vae):
        z = jnp.zeros((1, 4, 3, 4, 4))
        d = tiny_vae.decode(z)
        assert d.shape == (1, 3, 9, 32, 32)

    def test_roundtrip(self, tiny_vae):
        x = rand_video(t=5)
        dec = tiny_vae(x)
        assert dec.shape == x.shape
        assert np.isfinite(np.asarray(dec)).all()

    def test_single_frame(self, tiny_vae):
        x = rand_video(t=1)
        m = tiny_vae.encode_moments(x)
        assert m.shape == (1, 8, 1, 4, 4)
        d = tiny_vae.decode(m[:, :4])
        assert d.shape == (1, 3, 1, 32, 32)


class TestCausality:
    # NOTE: the VAE's convs are temporally causal, but GroupNorm pools
    # statistics over T — so neither the reference model nor ours is strictly
    # frame-causal end-to-end. Strict causality is asserted at the op level
    # (tests/test_ops.py::TestCausalConv3d::test_causality); here we pin the
    # latent frame-count contract (f-1)/4+1 across video lengths.
    @pytest.mark.parametrize("t,expect", [(1, 1), (5, 2), (9, 3), (13, 4)])
    def test_latent_frame_count(self, vae_params, t, expect):
        xl = jnp.transpose(rand_video(t=t), (0, 2, 3, 4, 1))
        m = ENC(vae_params, xl, TINY)
        assert m.shape[1] == expect


class TestTiling:
    def test_spatial_tiled_matches_single_tile_when_small(self, tiny_vae):
        x = rand_video(t=5, h=32, w=32)
        plain = tiny_vae.encode_moments(x)
        tiny_vae.enable_spatial_tiling(True)
        tiled = tiny_vae.encode_moments(x)
        tiny_vae.disable_tiling()
        np.testing.assert_allclose(np.asarray(plain), np.asarray(tiled),
                                   rtol=1e-5, atol=1e-5)

    def test_spatial_tiled_large_input_shape(self, tiny_vae):
        x = rand_video(t=5, h=64, w=56)
        tiny_vae.enable_spatial_tiling(True)
        m = tiny_vae.encode_moments(x)
        tiny_vae.disable_tiling()
        assert m.shape == (1, 8, 2, 8, 7)

    def test_temporal_tiled_encode_decode(self, tiny_vae):
        x = rand_video(t=17)  # > sample_tsize 16 -> temporal tiling kicks in
        tiny_vae.enable_tiling(True)
        m = tiny_vae.encode_moments(x)
        assert m.shape == (1, 8, 5, 4, 4)
        d = tiny_vae.decode(m[:, :4])
        tiny_vae.disable_tiling()
        assert d.shape == (1, 3, 17, 32, 32)

    def test_tiled_decode_close_to_plain(self, tiny_vae):
        z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 5, 8, 6)),
                        jnp.float32) * 0.1
        plain = np.asarray(tiny_vae.decode(z))
        tiny_vae.enable_spatial_tiling(True)
        tiled = np.asarray(tiny_vae.decode(z))
        tiny_vae.disable_tiling()
        assert plain.shape == tiled.shape
        assert np.isfinite(tiled).all()
        # With random weights, tile boundaries legitimately differ (each tile
        # normalizes independently) — the reference documents the same
        # (autoencoder_kl_causal_3d.py:366-369). Numerical closeness is gated
        # by the real-weights PSNR parity check instead.


class TestMeshTiling:
    """Mesh-sharded tile dispatch must match the single-device path exactly
    (tiles are independent; sharding only partitions the batch axis)."""

    @pytest.fixture(scope="class")
    def mesh_vae(self, vae_params):
        from hunyuanvideo_efficiency_tpu.parallel import (ParallelConfig,
                                                          make_mesh)

        mesh = make_mesh(ParallelConfig(dp_degree=2, ulysses_degree=2,
                                        ring_degree=2))
        vae = AutoencoderKLCausal3D(TINY, vae_params, mesh=mesh)
        assert vae.mesh is not None
        return vae

    def test_sharded_tiled_decode_matches(self, tiny_vae, mesh_vae):
        z = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 4, 5, 8, 6)),
            jnp.float32) * 0.1
        tiny_vae.enable_spatial_tiling(True)
        plain = np.asarray(tiny_vae.decode(z))
        tiny_vae.disable_tiling()
        mesh_vae.enable_spatial_tiling(True)
        sharded = np.asarray(mesh_vae.decode(z))
        mesh_vae.disable_tiling()
        np.testing.assert_allclose(plain, sharded, rtol=1e-5, atol=1e-5)

    def test_sharded_tiled_encode_matches(self, tiny_vae, mesh_vae):
        x = rand_video(t=5, h=64, w=56, seed=3)
        tiny_vae.enable_spatial_tiling(True)
        plain = np.asarray(tiny_vae.encode_moments(x))
        tiny_vae.disable_tiling()
        mesh_vae.enable_spatial_tiling(True)
        sharded = np.asarray(mesh_vae.encode_moments(x))
        mesh_vae.disable_tiling()
        np.testing.assert_allclose(plain, sharded, rtol=1e-5, atol=1e-5)

    def test_sharded_temporal_plus_spatial(self, tiny_vae, mesh_vae):
        x = rand_video(t=17, h=64, w=56, seed=4)
        tiny_vae.enable_tiling(True)
        plain = np.asarray(tiny_vae.encode_moments(x))
        tiny_vae.disable_tiling()
        mesh_vae.enable_tiling(True)
        sharded = np.asarray(mesh_vae.encode_moments(x))
        mesh_vae.disable_tiling()
        np.testing.assert_allclose(plain, sharded, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("n_tiles,want_rows", [
        (6, [6]),    # 6 tiles / 8 devices: 6-device sub-mesh, ZERO waste
        (8, [8]),    # exact fit: full mesh
        (9, [8, 1]), # two dispatches (tile_batch=1): 8 then 1 unsharded-ish
        (12, [8, 4]),
    ])
    def test_tile_dispatch_no_duplicate_waste(self, mesh_vae, n_tiles,
                                              want_rows):
        """Remainder tiles shard over a device subset instead of padding
        with whole duplicate tiles: fn must see exactly the real rows
        (plus < one device's share of zero rows)."""
        tiles = [jnp.full((1, 2, 4, 4, 3), float(i + 1)) for i in
                 range(n_tiles)]
        seen = []

        def fn(x, params=None):
            seen.append(int(x.shape[0]))
            return x * 2.0

        out = mesh_vae._run_tiles_batched(tiles, fn, tile_batch=1)
        assert seen == want_rows
        for i, o in enumerate(out):
            np.testing.assert_allclose(np.asarray(o),
                                       np.asarray(tiles[i]) * 2.0)


class TestTOps:
    def test_encoder_pool_halves_time(self, vae_params):
        tops = TOpsConfig(
            down_blocks=(DownBlockTOps(
                pool_t_kernel=2, pool_t_stride=2,
                enable_t_pool_before_block=(False,),
                enable_t_pool_after_block=(True,)), None, None, None),
        )
        x = jnp.transpose(rand_video(t=9), (0, 2, 3, 4, 1))
        m = ENC(vae_params, x, TINY, tops)
        # extra temporal pool in block0: T 9->5 before the standard /4 path
        assert m.shape[1] == (9 - 1) // 8 + 1 or m.shape[1] == 2

    def test_downsample_stride_override(self, vae_params):
        tops = TOpsConfig(
            down_blocks=(None, DownBlockTOps(
                enable_t_pool_before_block=(False,),
                enable_t_pool_after_block=(False,),
                downsample_stride=(4, 2, 2)), None, None),
        )
        x = jnp.transpose(rand_video(t=17), (0, 2, 3, 4, 1))
        m = ENC(vae_params, x, TINY, tops)
        base = ENC(vae_params, x, TINY)
        assert m.shape[1] < base.shape[1]

    def test_decoder_interp_doubles_time(self, vae_params):
        tops = TOpsConfig(
            up_blocks=(UpBlockTOps(
                interp_t_scale_factor=2,
                enable_t_interp_before_block=(True, False),
                enable_t_interp_after_block=(False, False)), None, None, None),
        )
        z = jnp.zeros((1, 3, 4, 4, 4))
        d = DEC(vae_params, z, TINY, tops)
        base = DEC(vae_params, z, TINY)
        # base: 3 -> up1 (3-1)*2+1=5 -> up2 (5-1)*2+1=9
        # interp at up0: 3->6 -> up1 11 -> up2 21 (causal upsample: (T-1)*2+1)
        assert base.shape[1] == 9
        assert d.shape[1] == 21

    def test_tops_json_parse(self, tmp_path):
        import json

        cfg_path = "/root/reference/t_ops_config.json"
        tops = TOpsConfig.from_json(cfg_path)
        assert len(tops.down_blocks) == 4
        assert tops.down_blocks[0].pool_t_kernel == 3
        assert tops.down_blocks[1].downsample_stride == (2, 2, 2)
        assert len(tops.up_blocks) == 4
        assert tops.up_blocks[0].interp_mode == "nearest"
        assert tops.encoder_mid_block is not None
        assert tops.decoder_mid_block is not None
        # hashable (usable as static jit arg)
        hash(tops)


class TestDiagonalGaussian:
    def test_kl_nll_match_torch_oracle(self):
        import torch

        rng = np.random.default_rng(3)
        moments = rng.standard_normal((2, 3, 4, 4, 8)).astype(np.float32)
        g = DiagonalGaussian(jnp.asarray(moments))
        mean_t, logvar_t = torch.chunk(torch.tensor(moments), 2, dim=-1)
        logvar_t = torch.clamp(logvar_t, -30, 20)
        var_t = logvar_t.exp()
        kl_want = 0.5 * torch.sum(mean_t.pow(2) + var_t - 1 - logvar_t,
                                  dim=[1, 2, 3, 4])
        np.testing.assert_allclose(np.asarray(g.kl()), kl_want.numpy(),
                                   rtol=1e-4, atol=1e-4)
        sample = rng.standard_normal(mean_t.shape).astype(np.float32)
        nll_want = 0.5 * torch.sum(
            np.log(2 * np.pi) + logvar_t
            + (torch.tensor(sample) - mean_t) ** 2 / var_t, dim=[1, 2, 3])
        np.testing.assert_allclose(np.asarray(g.nll(jnp.asarray(sample))),
                                   nll_want.numpy(), rtol=1e-4, atol=1e-4)

    def test_sample_stats(self):
        moments = jnp.concatenate([jnp.full((1, 1000, 2), 3.0),
                                   jnp.zeros((1, 1000, 2))], -1)
        g = DiagonalGaussian(moments)
        s = g.sample(jax.random.PRNGKey(0))
        assert abs(float(s.mean()) - 3.0) < 0.1
        assert abs(float(s.std()) - 1.0) < 0.1


def test_uniform_tiles_decode_matches_except_borders():
    """uniform_tiles pads the latent so all decode tiles share one shape
    (one compiled program instead of one per ragged edge shape); output
    shape is identical and values match away from the last-tile borders."""
    cfg = VAEConfig(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                    layers_per_block=1, norm_num_groups=4, sample_size=32,
                    sample_tsize=16, scaling_factor=0.476986)
    vae = AutoencoderKLCausal3D(
        cfg, init_vae_params(jax.random.PRNGKey(0), cfg))
    vae.enable_tiling()
    # latent H=7, W=9: ragged vs tile_latent_min_size=4
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 5, 7, 9),
                          jnp.float32)
    a = np.asarray(vae.decode(z))
    vae.uniform_tiles = True
    b = np.asarray(vae.decode(z))
    assert a.shape == b.shape, (a.shape, b.shape)
    assert np.isfinite(b).all()
    # identical away from the padded borders: early frames (first
    # temporal tile) and before the last spatial tile's output region
    # (tiles start every row_limit=24 px; the last starts at 48)
    np.testing.assert_allclose(a[:, :, :8, :48, :48],
                               b[:, :, :8, :48, :48], rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# uniform_tiles ENCODE parity vs ragged tiling (VERDICT r2 item 5): pins the
# enc_size ceil-by-stage arithmetic, the crop_h/crop_w latent crops, and the
# (true_t-1)//4+1 temporal latent crop at awkward (non-overlap-multiple)
# sizes. Uniform padding only alters the LAST tile along each axis, and each
# tile's blend reads only the PREVIOUS tile's uncropped extent — so away from
# the last tile's output region the two modes must agree exactly.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def uniform_pair(vae_params):
    ragged = AutoencoderKLCausal3D(TINY, vae_params)
    uniform = AutoencoderKLCausal3D(TINY, vae_params)
    uniform.uniform_tiles = True
    return ragged, uniform


# tile_sample_min_size=32, overlap stride 24, row_limit=3 latent rows per
# tile: all sizes below leave a ragged last tile (H/W % 24 != 0)
@pytest.mark.parametrize("h,w", [(40, 56), (50, 34), (56, 40)])
def test_uniform_tiles_spatial_encode_matches(uniform_pair, h, w, t=5):
    ragged, uniform = uniform_pair
    x = rand_video(t=t, h=h, w=w, seed=h * 100 + w)
    for v in (ragged, uniform):
        v.enable_spatial_tiling(True)
    a = np.asarray(ragged.encode_moments(x))
    b = np.asarray(uniform.encode_moments(x))
    for v in (ragged, uniform):
        v.disable_tiling()
    assert a.shape == b.shape, (a.shape, b.shape)
    # pins crop_h/crop_w == the ragged extent: (n-1)*row_limit +
    # min(enc_size(last), row_limit) per axis. Values can only match over
    # FULL tiles (i + 32 <= extent): any tile that overruns the edge gets
    # different input under uniform padding — with stride 24 < tile 32
    # that can be more than just the last tile.
    row_limit = 3
    nh_full = sum(1 for i in range(0, h, 24) if i + 32 <= h)
    nw_full = sum(1 for j in range(0, w, 24) if j + 32 <= w)
    safe_h = nh_full * row_limit
    safe_w = nw_full * row_limit
    np.testing.assert_allclose(a[:, :, :, :safe_h, :safe_w],
                               b[:, :, :, :safe_h, :safe_w],
                               rtol=1e-5, atol=1e-5)


# tile_sample_min_tsize=16, stride 12, t_limit=3 latent frames per tile:
# T % 12 != 1 leaves a ragged last temporal tile
@pytest.mark.parametrize("t", [18, 21, 29])
def test_uniform_tiles_temporal_encode_matches(uniform_pair, t):
    ragged, uniform = uniform_pair
    x = rand_video(t=t, h=32, w=32, seed=t)
    for v in (ragged, uniform):
        v.enable_temporal_tiling(True)
    a = np.asarray(ragged.encode_moments(x))
    b = np.asarray(uniform.encode_moments(x))
    for v in (ragged, uniform):
        v.disable_tiling()
    # pins the (true_t-1)//4+1 latent-frame crop
    assert a.shape == b.shape, (a.shape, b.shape)
    assert a.shape[2] == (t - 1) // 4 + 1
    nt_full = sum(1 for i in range(0, t, 12) if i + 17 <= t)
    safe_t = nt_full * 3 + 1
    np.testing.assert_allclose(a[:, :, :safe_t], b[:, :, :safe_t],
                               rtol=1e-5, atol=1e-5)


def test_uniform_tiles_spatiotemporal_encode_matches(uniform_pair):
    ragged, uniform = uniform_pair
    t, h, w = 21, 40, 56
    x = rand_video(t=t, h=h, w=w, seed=9)
    for v in (ragged, uniform):
        v.enable_tiling(True)
    a = np.asarray(ragged.encode_moments(x))
    b = np.asarray(uniform.encode_moments(x))
    for v in (ragged, uniform):
        v.disable_tiling()
    assert a.shape == b.shape, (a.shape, b.shape)
    assert a.shape[2] == (t - 1) // 4 + 1
    np.testing.assert_allclose(a[:, :, :4, :3, :6], b[:, :, :4, :3, :6],
                               rtol=1e-5, atol=1e-5)

"""Unit tests for core ops against independent torch oracles.

The oracles re-implement the documented reference math (norm/rope/causal-conv
semantics per SURVEY.md §2.1-2.2) directly in torch; they are small
independent implementations used purely as numerical cross-checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hunyuanvideo_efficiency_tpu.ops import (
    apply_rotary_emb,
    attention,
    causal_avg_pool_t,
    causal_conv3d,
    get_nd_rotary_pos_embed,
    group_norm,
    layer_norm,
    padding_key_bias,
    rms_norm,
    sdpa_attention,
    upsample_nearest_causal_3d,
)
from hunyuanvideo_efficiency_tpu.ops.attention import (
    chunked_attention,
    frame_causal_block_bias,
)

RNG = np.random.default_rng(0)


def rand(*shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


class TestNorms:
    def test_rms_norm(self):
        x = rand(2, 5, 64)
        w = rand(64) * 0.1 + 1.0
        got = np.asarray(rms_norm(jnp.array(x), jnp.array(w)))
        xt = torch.tensor(x)
        want = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
                ) * torch.tensor(w)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)

    def test_layer_norm(self):
        x = rand(2, 5, 64)
        w, b = rand(64), rand(64)
        got = np.asarray(layer_norm(jnp.array(x), jnp.array(w), jnp.array(b)))
        want = F.layer_norm(torch.tensor(x), (64,), torch.tensor(w),
                            torch.tensor(b), eps=1e-6)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)

    def test_group_norm_matches_torch_ncdhw(self):
        b, t, h, w, c = 2, 3, 4, 4, 32
        x = rand(b, t, h, w, c)
        wt, bs = rand(c), rand(c)
        got = np.asarray(group_norm(jnp.array(x), 8, jnp.array(wt), jnp.array(bs)))
        # torch GroupNorm expects NCDHW
        xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
        want = F.group_norm(xt, 8, torch.tensor(wt), torch.tensor(bs), eps=1e-6)
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestRope:
    def test_1d_tables_match_torch_oracle(self):
        # Oracle: freqs = theta^(-2i/d); cos/sin repeat_interleave(2).
        dim, s, theta = 16, 12, 256.0
        cos, sin = get_nd_rotary_pos_embed([dim], [s], theta=theta)
        pos = torch.arange(s).float()
        freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
        ang = torch.outer(pos, freqs)
        np.testing.assert_allclose(np.asarray(cos),
                                   ang.cos().repeat_interleave(2, 1).numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin),
                                   ang.sin().repeat_interleave(2, 1).numpy(),
                                   rtol=1e-6, atol=1e-6)

    def test_3d_concat_and_apply(self):
        rope_dims = [4, 6, 6]
        sizes = (2, 3, 4)
        cos, sin = get_nd_rotary_pos_embed(rope_dims, sizes, theta=256.0)
        assert cos.shape == (24, 16)
        q = rand(1, 24, 2, 16)
        k = rand(1, 24, 2, 16)
        qo, ko = apply_rotary_emb(jnp.array(q), jnp.array(k), (cos, sin))
        # Oracle: x*cos + rotate_half(x)*sin, pairs (x0,x1)->(-x1,x0)
        def rot_half(x):
            x2 = x.reshape(*x.shape[:-1], -1, 2)
            return np.stack([-x2[..., 1], x2[..., 0]], -1).reshape(x.shape)

        c = np.asarray(cos)[None, :, None, :]
        s = np.asarray(sin)[None, :, None, :]
        np.testing.assert_allclose(np.asarray(qo), q * c + rot_half(q) * s,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ko), k * c + rot_half(k) * s,
                                   rtol=1e-5, atol=1e-5)

    def test_rope_norm_preserving(self):
        cos, sin = get_nd_rotary_pos_embed([8, 4, 4], (2, 2, 2))
        q = rand(1, 8, 3, 16)
        qo, _ = apply_rotary_emb(jnp.array(q), jnp.array(q), (cos, sin))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(qo), axis=-1),
                                   np.linalg.norm(q, axis=-1), rtol=1e-5)


class TestCausalConv3d:
    def test_matches_torch_conv3d_with_causal_pad(self):
        b, t, h, w, cin, cout, k = 1, 5, 6, 6, 3, 4, 3
        x = rand(b, t, h, w, cin)
        kern = rand(k, k, k, cin, cout, scale=0.2)
        bias = rand(cout)
        got = np.asarray(causal_conv3d(jnp.array(x), jnp.array(kern),
                                       jnp.array(bias)))
        xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # NCDHW
        xt = F.pad(xt, (k // 2, k // 2, k // 2, k // 2, k - 1, 0),
                   mode="replicate")
        wt = torch.tensor(kern).permute(4, 3, 0, 1, 2)  # OIDHW
        want = F.conv3d(xt, wt, torch.tensor(bias))
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_causality(self):
        # Changing frame t must not affect outputs at frames < t.
        b, t, c = 1, 6, 2
        x = rand(b, t, 4, 4, c)
        kern = rand(3, 3, 3, c, c, scale=0.3)
        y0 = np.asarray(causal_conv3d(jnp.array(x), jnp.array(kern)))
        x2 = x.copy()
        x2[:, 3:] += 10.0
        y1 = np.asarray(causal_conv3d(jnp.array(x2), jnp.array(kern)))
        np.testing.assert_allclose(y0[:, :3], y1[:, :3], rtol=1e-5, atol=1e-5)
        assert np.abs(y0[:, 3:] - y1[:, 3:]).max() > 1e-3

    def test_strided(self):
        x = rand(1, 5, 8, 8, 3)
        kern = rand(3, 3, 3, 3, 4, scale=0.2)
        got = causal_conv3d(jnp.array(x), jnp.array(kern), stride=(2, 2, 2))
        assert got.shape == (1, 3, 4, 4, 4)

    def test_avg_pool_t_matches_torch(self):
        x = rand(1, 5, 3, 3, 2)
        got = np.asarray(causal_avg_pool_t(jnp.array(x), 2, 2))
        xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
        xt = F.pad(xt, (0, 0, 0, 0, 1, 0), mode="replicate")
        want = F.avg_pool3d(xt, (2, 1, 1), (2, 1, 1)).permute(0, 2, 3, 4, 1)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)

    def test_upsample_first_frame_spatial_only(self):
        x = rand(1, 3, 2, 2, 1)
        y = np.asarray(upsample_nearest_causal_3d(jnp.array(x), (2, 2, 2)))
        assert y.shape == (1, 5, 4, 4, 1)  # (3-1)*2 + 1 temporal
        # first output frame = frame0 spatially upsampled
        np.testing.assert_allclose(y[0, 0], np.repeat(np.repeat(x[0, 0], 2, 0), 2, 1))


class TestAttention:
    def test_sdpa_matches_torch(self):
        b, s, h, d = 2, 10, 3, 8
        q, k, v = rand(b, s, h, d), rand(b, s, h, d), rand(b, s, h, d)
        got = np.asarray(sdpa_attention(jnp.array(q), jnp.array(k), jnp.array(v)))
        qt = torch.tensor(q).permute(0, 2, 1, 3)
        kt = torch.tensor(k).permute(0, 2, 1, 3)
        vt = torch.tensor(v).permute(0, 2, 1, 3)
        want = F.scaled_dot_product_attention(qt, kt, vt)
        want = want.permute(0, 2, 1, 3).reshape(b, s, h * d).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_chunked_matches_sdpa(self):
        b, s, h, d = 1, 100, 2, 16
        q, k, v = rand(b, s, h, d), rand(b, s, h, d), rand(b, s, h, d)
        want = np.asarray(sdpa_attention(jnp.array(q), jnp.array(k), jnp.array(v)))
        got = np.asarray(chunked_attention(jnp.array(q), jnp.array(k),
                                           jnp.array(v), q_chunk=16, k_chunk=32))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_key_padding_bias_equivalence(self):
        # Valid-token outputs with key-bias must equal attention computed on
        # only the valid tokens (the varlen-packing semantics).
        b, img_len, text_len, h, d = 1, 12, 6, 2, 8
        n_valid = 4
        s = img_len + text_len
        q, k, v = rand(b, s, h, d), rand(b, s, h, d), rand(b, s, h, d)
        mask = np.zeros((b, text_len), np.int32)
        mask[:, :n_valid] = 1
        bias = padding_key_bias(jnp.array(mask), img_len)
        got = np.asarray(sdpa_attention(jnp.array(q), jnp.array(k),
                                        jnp.array(v), bias=bias))
        nv = img_len + n_valid
        want = np.asarray(sdpa_attention(jnp.array(q[:, :nv]),
                                         jnp.array(k[:, :nv]),
                                         jnp.array(v[:, :nv])))
        np.testing.assert_allclose(got[:, :nv], want, rtol=1e-4, atol=1e-4)

    def test_chunked_key_bias(self):
        b, s, h, d = 1, 40, 2, 8
        q, k, v = rand(b, s, h, d), rand(b, s, h, d), rand(b, s, h, d)
        mask = np.zeros((b, 10), np.int32)
        mask[:, :7] = 1
        bias = padding_key_bias(jnp.array(mask), 30)
        want = np.asarray(sdpa_attention(jnp.array(q), jnp.array(k),
                                         jnp.array(v), bias=bias))
        got = np.asarray(chunked_attention(jnp.array(q), jnp.array(k),
                                           jnp.array(v), key_bias=bias,
                                           q_chunk=16, k_chunk=16))
        np.testing.assert_allclose(got[:, :37], want[:, :37], rtol=1e-4, atol=1e-4)

    def test_frame_causal_chunked(self):
        # frame-causal mask: queries in frame f see keys in frames <= f
        b, t, hw, h, d = 1, 4, 6, 1, 8
        s = t * hw
        q, k, v = rand(b, s, h, d), rand(b, s, h, d), rand(b, s, h, d)
        got = np.asarray(chunked_attention(
            jnp.array(q), jnp.array(k), jnp.array(v),
            block_bias_fn=frame_causal_block_bias(hw), q_chunk=8, k_chunk=8))
        # oracle: explicit mask
        qi = np.arange(s)[:, None] // hw
        ki = np.arange(s)[None, :] // hw
        m = np.where(ki <= qi, 0.0, -1e30).astype(np.float32)
        want = np.asarray(sdpa_attention(jnp.array(q), jnp.array(k),
                                         jnp.array(v),
                                         bias=jnp.array(m[None, None])))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

"""Flash-attention kernel (interpret mode on CPU) + fp8 quantization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.ops.attention import (
    padding_key_bias, sdpa_attention)
from hunyuanvideo_efficiency_tpu.ops.flash_attention import flash_attention
from hunyuanvideo_efficiency_tpu.ops.quantization import (
    FP8_E4M3_MAX, quantize_dit_params_fp8, quantize_tensor_fp8)


class TestFlashAttention:
    def _data(self, b=2, s=300, h=4, d=128, txt=44, seed=0):
        key = jax.random.PRNGKey(seed)
        q, k, v = [jax.random.normal(kk, (b, s, h, d), jnp.float32)
                   for kk in jax.random.split(key, 3)]
        mask = jnp.asarray(np.random.RandomState(seed).rand(b, txt) > 0.3,
                           jnp.int32).at[:, 0].set(1)
        bias = padding_key_bias(mask, s - txt)
        return q, k, v, bias

    def test_matches_sdpa_with_padding(self):
        q, k, v, bias = self._data()
        out = flash_attention(q, k, v, key_bias=bias, block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_no_bias(self):
        q, k, v, _ = self._data(s=256)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_unaligned_seq_padding_is_sliced(self):
        # 200 is not a multiple of 128: exercises q/k pad + slice-off.
        q, k, v, _ = self._data(s=200, txt=8)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_bf16_inputs(self):
        q, k, v, bias = self._data(s=256)
        qb, kb_, vb = [x.astype(jnp.bfloat16) for x in (q, k, v)]
        out = flash_attention(qb, kb_, vb, key_bias=bias,
                              block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v, bias=bias)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), rtol=3e-2, atol=3e-2)


class TestFP8:
    def test_quantize_roundtrip_error_small(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 0.02
        q = quantize_tensor_fp8(w, stacked=False)
        assert q["kernel"].dtype == jnp.float8_e4m3fn
        deq = q["kernel"].astype(jnp.float32) * q["scale"]
        rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
        assert rel < 0.07  # e4m3 has ~2 decimal digits

    def test_stacked_per_block_scales(self):
        w = jnp.stack([jnp.ones((8, 8)), 100.0 * jnp.ones((8, 8))])
        q = quantize_tensor_fp8(w, stacked=True)
        assert q["scale"].shape == (2, 1, 1)
        deq = q["kernel"].astype(jnp.float32) * q["scale"]
        np.testing.assert_allclose(np.asarray(deq), np.asarray(w), rtol=1e-2)

    def test_dit_forward_with_fp8_params(self):
        from hunyuanvideo_efficiency_tpu.models.dit import (
            dit_forward, init_dit_params)
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
        from hunyuanvideo_efficiency_tpu.ops.rope import (
            get_nd_rotary_pos_embed)

        cfg = DiTConfig(hidden_size=128, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(8, 12, 12), text_states_dim=64,
                        text_states_dim_2=32, attn_mode="sdpa")
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_dit_params_fp8(params)
        # only block kernels converted
        assert qparams["double_blocks"]["img_attn_qkv"]["kernel"].dtype \
            == jnp.float8_e4m3fn
        assert "scale" in qparams["double_blocks"]["img_attn_qkv"]
        assert qparams["img_in"]["kernel"].dtype == jnp.float32

        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (1, 16, 3, 8, 6), jnp.float32)
        t = jnp.full((1,), 500.0)
        pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
        mask = jnp.ones((1, 8), jnp.int32)
        pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
        cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (3, 4, 3),
                                           theta=cfg.rope_theta)
        ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
        out = dit_forward(qparams, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / scale < 0.15, f"fp8 rel err too large: {err/scale}"
        assert np.isfinite(np.asarray(out)).all()


class TestInt8:
    """W8A8 compute path (beyond-reference; ops/quantization.py int8)."""

    def test_quantize_per_channel_scales(self):
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        # column 1 is 100x column 0: per-out-channel scales keep both exact
        w = jnp.concatenate([jnp.ones((16, 1)), 100.0 * jnp.ones((16, 1))],
                            axis=1)
        q = quantize_tensor_int8(w)
        assert q["kernel"].dtype == jnp.int8
        assert q["scale_out"].shape == (1, 2)
        deq = q["kernel"].astype(jnp.float32) * q["scale_out"]
        np.testing.assert_allclose(np.asarray(deq), np.asarray(w), rtol=1e-2)

    def test_int8_linear_matches_fp32(self):
        from hunyuanvideo_efficiency_tpu.models.dit import linear
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        w = jax.random.normal(k1, (64, 48)) * 0.05
        b = jax.random.normal(k2, (48,)) * 0.1
        x = jax.random.normal(k3, (2, 10, 64))
        ref = linear({"kernel": w, "bias": b}, x)
        q = {**quantize_tensor_int8(w), "bias": b}
        out = linear(q, x)
        assert out.dtype == x.dtype
        rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref))))
        assert rel < 0.03, rel

    def test_int8_linear_column_chunking_exact(self, monkeypatch):
        # above _INT8_CHUNK_TOKENS the int8 matmul slides over OUTPUT
        # column blocks (bounds the [L, out] s32 temp at 720p-class lengths
        # while quantizing the activation only once); the dot/dequant math
        # is identical to the unchunked path — only XLA fusion order may
        # differ (1-ulp f32)
        import hunyuanvideo_efficiency_tpu.models.dit as dit_mod
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        w = jax.random.normal(k1, (64, 256)) * 0.05
        b = jax.random.normal(k3, (256,)) * 0.1
        x = jax.random.normal(k2, (1, 40, 64))
        q = {**quantize_tensor_int8(w), "bias": b}
        ref = dit_mod.linear(q, x)
        monkeypatch.setattr(dit_mod, "_INT8_CHUNK_TOKENS", 16)
        monkeypatch.setattr(dit_mod, "_INT8_TEMP_BUDGET", 1)
        out = dit_mod.linear(q, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        # the fused-activation epilogue chunks identically
        ref_act = dit_mod._int8_linear({**quantize_tensor_int8(w)}, x,
                                       act="silu")
        monkeypatch.setattr(dit_mod, "_INT8_CHUNK_TOKENS", 10 ** 9)
        unchunked = dit_mod._int8_linear({**quantize_tensor_int8(w)}, x,
                                         act="silu")
        np.testing.assert_allclose(np.asarray(ref_act),
                                   np.asarray(unchunked),
                                   rtol=1e-6, atol=1e-6)

    def test_int8_colchunk_unrolled_matches_fori(self, monkeypatch):
        # the static-slice unrolled form (optimization_barrier chain) is
        # the same math as the fori_loop form — bit-exact per chunk
        import hunyuanvideo_efficiency_tpu.models.dit as dit_mod
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
        w = jax.random.normal(k1, (64, 256)) * 0.05
        b = jax.random.normal(k3, (256,)) * 0.1
        x = jax.random.normal(k2, (1, 40, 64))
        q = {**quantize_tensor_int8(w), "bias": b}
        monkeypatch.setattr(dit_mod, "_INT8_CHUNK_TOKENS", 16)
        monkeypatch.setattr(dit_mod, "_INT8_TEMP_BUDGET", 1)
        ref = dit_mod._int8_linear(q, x, act="silu")
        monkeypatch.setattr(dit_mod, "_COLCHUNK_UNROLL", True)
        out = dit_mod._int8_linear(q, x, act="silu")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_int8_col_row_slices_match_slice_of_full(self):
        from hunyuanvideo_efficiency_tpu.models.dit import (
            _col_slice, _row_slice, linear)
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        w = jax.random.normal(k1, (32, 24)) * 0.1
        x = jax.random.normal(k2, (3, 32))
        q = quantize_tensor_int8(w)
        full = linear(q, x)
        cols = linear(_col_slice(q, 4, 20), x)
        np.testing.assert_allclose(np.asarray(cols),
                                   np.asarray(full[:, 4:20]), atol=1e-5)
        # row slice: dequantized sliced kernel == sliced dequantized kernel
        rows = _row_slice(q, 0, 16, keep_bias=False)
        deq_full = q["kernel"].astype(jnp.float32) * q["scale_out"]
        deq_rows = rows["kernel"].astype(jnp.float32) * rows["scale_out"]
        np.testing.assert_allclose(np.asarray(deq_rows),
                                   np.asarray(deq_full[:16]), atol=1e-7)

    def test_dit_forward_with_int8_params(self):
        from hunyuanvideo_efficiency_tpu.models.dit import (
            dit_forward, init_dit_params)
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_dit_params_int8)
        from hunyuanvideo_efficiency_tpu.ops.rope import (
            get_nd_rotary_pos_embed)

        cfg = DiTConfig(hidden_size=128, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(8, 12, 12), text_states_dim=64,
                        text_states_dim_2=32, attn_mode="sdpa")
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_dit_params_int8(params)
        assert qparams["double_blocks"]["img_attn_qkv"]["kernel"].dtype \
            == jnp.int8
        assert "scale_out" in qparams["double_blocks"]["img_attn_qkv"]
        assert qparams["img_in"]["kernel"].dtype == jnp.float32

        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (1, 16, 3, 8, 6), jnp.float32)
        t = jnp.full((1,), 500.0)
        pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
        mask = jnp.ones((1, 8), jnp.int32)
        pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
        cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (3, 4, 3),
                                           theta=cfg.rope_theta)
        ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
        out = dit_forward(qparams, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / scale < 0.15, f"int8 rel err too large: {err/scale}"
        assert np.isfinite(np.asarray(out)).all()


class TestFlashInt8:
    """int8-QK flash attention (SageAttention-style, arXiv 2410.02367)."""

    def _data(self, b=2, s=300, h=4, d=128, txt=44, seed=0):
        key = jax.random.PRNGKey(seed)
        q, k, v = [jax.random.normal(kk, (b, s, h, d), jnp.float32)
                   for kk in jax.random.split(key, 3)]
        # channel-coherent key offset: what smooth_k is for
        k = k + jnp.linspace(-3.0, 3.0, d)[None, None, None, :]
        mask = jnp.asarray(np.random.RandomState(seed).rand(b, txt) > 0.3,
                           jnp.int32).at[:, 0].set(1)
        bias = padding_key_bias(mask, s - txt)
        return q, k, v, bias

    def test_matches_sdpa_with_padding(self):
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_int8)

        q, k, v, bias = self._data()
        out = flash_attention_int8(q, k, v, key_bias=bias,
                                   block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v, bias=bias)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.03, rel

    def test_smoothing_beats_no_smoothing(self):
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_int8)

        q, k, v, bias = self._data(seed=1)
        ref = sdpa_attention(q, k, v, bias=bias)
        e_sm = float(jnp.max(jnp.abs(flash_attention_int8(
            q, k, v, key_bias=bias, block_q=128, block_k=128) - ref)))
        e_raw = float(jnp.max(jnp.abs(flash_attention_int8(
            q, k, v, key_bias=bias, block_q=128, block_k=128,
            smooth_k=False) - ref)))
        assert e_sm < e_raw, (e_sm, e_raw)

    def test_unaligned_and_bf16(self):
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_int8)

        q, k, v, _ = self._data(s=200, txt=8)
        out = flash_attention_int8(
            *(x.astype(jnp.bfloat16) for x in (q, k, v)),
            block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v)
        assert out.shape == ref.shape and out.dtype == jnp.bfloat16
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
                    / jnp.max(jnp.abs(ref)))
        assert rel < 0.05, rel

    def test_attention_mode_dispatch(self):
        from hunyuanvideo_efficiency_tpu.ops.attention import attention

        q, k, v, bias = self._data(s=256)
        out = attention(q, k, v, mode="flash_int8", key_bias=bias)
        ref = sdpa_attention(q, k, v, bias=bias)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.03, rel

    def test_static_offset_matches_running(self):
        # bound_mode="static" (int8 QK + no running max) must agree with
        # the running-max int8 kernel on normed-scale inputs to fp32-exp
        # rounding; both must track sdpa
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_int8)

        q, k, v, bias = self._data(s=300, seed=2)
        ref = sdpa_attention(q, k, v, bias=bias)
        run = flash_attention_int8(q, k, v, key_bias=bias,
                                   block_q=128, block_k=128)
        sta = flash_attention_int8(q, k, v, key_bias=bias,
                                   block_q=128, block_k=128,
                                   bound_mode="static")
        np.testing.assert_allclose(np.asarray(sta), np.asarray(run),
                                   rtol=2e-4, atol=2e-4)
        rel = float(jnp.max(jnp.abs(sta - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.03, rel

    def test_static_offset_through_attention_dispatch(self):
        # attention(mode="flash_int8", bound_mode="static") — the path
        # dit.py takes when cfg.qk_norm holds — stays sdpa-accurate
        from hunyuanvideo_efficiency_tpu.ops.attention import attention

        q, k, v, bias = self._data(s=256, seed=3)
        out = attention(q, k, v, mode="flash_int8", key_bias=bias,
                        bound_mode="static")
        ref = sdpa_attention(q, k, v, bias=bias)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.03, rel

    def test_static_offset_unaligned_bf16(self):
        from hunyuanvideo_efficiency_tpu.ops.flash_attention import (
            flash_attention_int8)

        q, k, v, _ = self._data(s=200, txt=8, seed=4)
        out = flash_attention_int8(
            *(x.astype(jnp.bfloat16) for x in (q, k, v)),
            block_q=128, block_k=128, bound_mode="static")
        ref = sdpa_attention(q, k, v)
        assert out.shape == ref.shape and out.dtype == jnp.bfloat16
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
                    / jnp.max(jnp.abs(ref)))
        assert rel < 0.05, rel


class TestFlashStaticOffset:
    """Static-offset vs running-max kernel dispatch (flash_attention's
    lax.cond on the Cauchy-Schwarz score bound)."""

    def test_large_magnitude_falls_back_and_matches(self):
        # 30x inputs -> C >> 40: the running-max kernel path must engage
        # and still match sdpa (one-hot-ish softmax)
        key = jax.random.PRNGKey(3)
        q, k, v = [30.0 * jax.random.normal(kk, (1, 256, 2, 128))
                   for kk in jax.random.split(key, 3)]
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v)
        # scores are ~3e3 here: softmax is near-one-hot and bf16 score
        # rounding flips near-ties in any flash kernel, so tolerance is
        # loose; the assertion is that the fallback engages and is sane
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.1, atol=0.05)

    def test_normed_inputs_use_static_path_and_match(self):
        # unit-scale inputs -> C ~= 11 < 40: static-offset path
        key = jax.random.PRNGKey(4)
        q, k, v = [jax.random.normal(kk, (2, 300, 4, 128))
                   for kk in jax.random.split(key, 3)]
        mask = jnp.ones((2, 44), jnp.int32).at[:, 30:].set(0)
        bias = padding_key_bias(mask, 300 - 44)
        out = flash_attention(q, k, v, key_bias=bias,
                              block_q=128, block_k=128)
        ref = sdpa_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_bound_mode_static_matches_auto(self):
        # bound_mode="static" compiles ONLY the static-offset kernel; its
        # numerics must equal the traced-dispatch default on normed-scale
        # inputs (the case DiTConfig.qk_norm guarantees)
        key = jax.random.PRNGKey(5)
        q, k, v = [jax.random.normal(kk, (2, 300, 4, 128))
                   for kk in jax.random.split(key, 3)]
        mask = jnp.ones((2, 44), jnp.int32).at[:, 30:].set(0)
        bias = padding_key_bias(mask, 300 - 44)
        auto = flash_attention(q, k, v, key_bias=bias,
                               block_q=128, block_k=128, bound_mode="auto")
        static = flash_attention(q, k, v, key_bias=bias,
                                 block_q=128, block_k=128,
                                 bound_mode="static")
        running = flash_attention(q, k, v, key_bias=bias,
                                  block_q=128, block_k=128,
                                  bound_mode="running")
        np.testing.assert_allclose(np.asarray(static), np.asarray(auto),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(running), np.asarray(auto),
                                   rtol=2e-3, atol=2e-3)

    def test_bound_mode_through_vjp_wrapper(self):
        # the custom_vjp wrapper threads bound_mode as a nondiff arg; the
        # primal must match and grads must still flow (training forward
        # always uses the LSE-saving running-max kernel regardless)
        from hunyuanvideo_efficiency_tpu.ops.flash_backward import (
            flash_attention_vjp)

        key = jax.random.PRNGKey(6)
        q, k, v = [jax.random.normal(kk, (1, 256, 2, 128))
                   for kk in jax.random.split(key, 3)]
        out = flash_attention_vjp(q, k, v, None, None, None, 128, 128, "static")
        ref = sdpa_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

        def loss(q):
            return jnp.sum(
                flash_attention_vjp(q, k, v, None, None, None, 128, 128, "static"))

        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()

    def test_analytic_score_bound_valid_and_equivalent(self):
        # the weight-derived bound (models/dit._analytic_score_bound) must
        # (a) upper-bound every |q.k|*scale after QK-RMSNorm + RoPE and
        # (b) produce identical flash output to the numeric bound
        from hunyuanvideo_efficiency_tpu.models.dit import (
            _analytic_score_bound)
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
        from hunyuanvideo_efficiency_tpu.ops.norms import rms_norm
        from hunyuanvideo_efficiency_tpu.ops.rope import (
            apply_rotary_emb, get_nd_rotary_pos_embed)

        cfg = DiTConfig(qk_norm=True, qk_norm_type="rms")
        d, h, s = 64, 2, 128
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (1, s, h, d)) * 3.0
        k = jax.random.normal(ks[1], (1, s, h, d)) * 3.0
        gq = {"scale": 1.0 + 0.5 * jax.random.normal(ks[2], (d,))}
        gk = {"scale": 1.0 + 0.5 * jax.random.normal(ks[3], (d,))}
        qn = rms_norm(q, gq["scale"])
        kn = rms_norm(k, gk["scale"])
        freqs = get_nd_rotary_pos_embed([d], [s], theta=256.0)
        qr, kr = apply_rotary_emb(qn, kn, freqs)

        bound = _analytic_score_bound(cfg, d, [(gq, gk)])
        scores = jnp.einsum("bqhd,bkhd->bhqk", qr.astype(jnp.float32),
                            kr.astype(jnp.float32)) * (d ** -0.5)
        assert float(jnp.max(jnp.abs(scores))) <= float(bound)

        out_b = flash_attention(qr, kr, v := kr, block_q=128, block_k=128,
                                bound_mode="static", score_bound=bound)
        out_n = flash_attention(qr, kr, v, block_q=128, block_k=128,
                                bound_mode="static")
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_n),
                                   rtol=2e-3, atol=2e-3)

    def test_score_bound_none_when_qk_norm_off(self):
        from hunyuanvideo_efficiency_tpu.models.dit import (
            _analytic_score_bound)
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig

        assert _analytic_score_bound(DiTConfig(qk_norm=False), 64, []) is None

    @pytest.mark.parametrize("L,h,n,bias", [(300, 256, 384, True),
                                            (512, 256, 256, False),
                                            (256, 128, 512, True),
                                            (200, 512, 128, False)])
    def test_int8_linear_pallas_matches_xla(self, L, h, n, bias):
        # the fused Pallas W8A8 kernel (ops/int8_matmul.py) must match the
        # XLA path bit-for-bit in quantization decisions (same amax/round)
        from hunyuanvideo_efficiency_tpu.models.dit import _int8_linear_body
        from hunyuanvideo_efficiency_tpu.ops.int8_matmul import (
            int8_linear_pallas)
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        kx, kw, kb = jax.random.split(jax.random.PRNGKey(L), 3)
        x = jax.random.normal(kx, (1, L, h)).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (h, n)) / h ** 0.5).astype(jnp.bfloat16)
        p = quantize_tensor_int8(w)
        if bias:
            p["bias"] = jax.random.normal(kb, (n,)).astype(jnp.bfloat16)
        ref = _int8_linear_body(p, x)
        out = int8_linear_pallas(p, x)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_int8_impl_switch_routes_linear(self):
        # linear() dispatches through set_int8_impl("pallas") for
        # sequence-sized int8 matmuls and stays bit-compatible with the
        # XLA path (models/dit._int8_linear routing gate)
        from hunyuanvideo_efficiency_tpu.models import dit
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        kx, kw = jax.random.split(jax.random.PRNGKey(5))
        x = jax.random.normal(kx, (1, 1024, 256)).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (256, 384)) / 16.0).astype(jnp.bfloat16)
        p = quantize_tensor_int8(w)
        ref = dit.linear(p, x)
        dit.set_int8_impl("pallas")
        try:
            out = dit.linear(p, x)
        finally:
            dit.set_int8_impl("xla")
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
        with pytest.raises(ValueError):
            dit.set_int8_impl("int2")

    def test_int8_linear_pallas_batch2(self):
        # CFG runs [neg, pos] stacked as batch 2: the kernel flattens the
        # leading dims into rows, so per-token scales must stay per-token
        # across the batch boundary
        from hunyuanvideo_efficiency_tpu.models.dit import _int8_linear_body
        from hunyuanvideo_efficiency_tpu.ops.int8_matmul import (
            int8_linear_pallas)
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        kx, kw = jax.random.split(jax.random.PRNGKey(7))
        x = jax.random.normal(kx, (2, 320, 256)).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (256, 384)) / 16.0).astype(jnp.bfloat16)
        p = quantize_tensor_int8(w)
        ref = _int8_linear_body(p, x)
        out = int8_linear_pallas(p, x)
        assert out.shape == (2, 320, 384)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("act", ["gelu_tanh", "silu", "gelu", "relu"])
    def test_int8_pallas_fused_act_matches_separate(self, act):
        # the epilogue-fused activation must equal ACT(linear(x)) computed
        # separately (ops/int8_matmul._EPILOGUE_ACTS)
        from hunyuanvideo_efficiency_tpu.models.dit import (
            ACT, _int8_linear_body)
        from hunyuanvideo_efficiency_tpu.ops.int8_matmul import (
            int8_linear_pallas)
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        kx, kw = jax.random.split(jax.random.PRNGKey(11))
        x = jax.random.normal(kx, (1, 300, 256)).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (256, 384)) / 16.0).astype(jnp.bfloat16)
        p = quantize_tensor_int8(w)
        ref = ACT[act](_int8_linear_body(p, x).astype(jnp.float32))
        out = int8_linear_pallas(p, x, act=act)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_mlp_pallas_impl_matches_xla(self):
        # whole-MLP parity across impls: fc1(act-fused) -> fc2 under
        # set_int8_impl("pallas") equals the default XLA path
        from hunyuanvideo_efficiency_tpu.models import dit
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_tensor_int8)

        ks = jax.random.split(jax.random.PRNGKey(13), 3)
        x = jax.random.normal(ks[0], (1, 1024, 256)).astype(jnp.bfloat16)
        p = {"fc1": quantize_tensor_int8(
                 (jax.random.normal(ks[1], (256, 512)) / 16.0
                  ).astype(jnp.bfloat16)),
             "fc2": quantize_tensor_int8(
                 (jax.random.normal(ks[2], (512, 256)) / 16.0
                  ).astype(jnp.bfloat16))}
        ref = dit.mlp(p, x, "gelu_tanh")
        dit.set_int8_impl("pallas")
        try:
            out = dit.mlp(p, x, "gelu_tanh")
        finally:
            dit.set_int8_impl("xla")
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=4e-2, atol=4e-2)


class TestInt4Modulation:
    """int4-packed adaLN modulation storage (beyond-reference; the tier the
    720p single-chip headline config enables — ops/quantization.py
    quantize_dit_params_int4_modulation / dequantize_int4)."""

    def test_pack_unpack_roundtrip_bound(self):
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            dequantize_int4, quantize_tensor_int4)

        w = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 96)) * 0.3
        q = quantize_tensor_int4(w)
        assert q["kernel_i4"].dtype == jnp.uint8
        assert q["kernel_i4"].shape == (3, 64, 48)  # two values per byte
        assert q["scale_out"].shape == (3, 1, 96)
        deq = dequantize_int4(q, jnp.float32)
        assert deq.shape == w.shape
        # symmetric grid [-7, 7]: rounding error <= scale/2 = amax/14
        amax = np.max(np.abs(np.asarray(w)), axis=-2, keepdims=True)
        err = np.abs(np.asarray(deq) - np.asarray(w))
        assert (err <= amax / 14.0 + 1e-6).all(), float(err.max())

    def test_pack_unpack_exact_on_grid(self):
        # every code in [-7, 7] in BOTH nibbles survives pack/unpack
        # bit-exactly (sign extension of the high nibble is the trap)
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            dequantize_int4, quantize_tensor_int4)

        codes = np.arange(-7, 8, dtype=np.float32)  # 15 codes
        # [in=15, out=30]: every (low, high) code pairing appears
        w = jnp.asarray(np.stack([np.roll(codes, i) for i in range(15)]
                                 ).repeat(2, axis=1))
        q = quantize_tensor_int4(w)
        deq = dequantize_int4(q, jnp.float32)
        np.testing.assert_array_equal(np.asarray(deq), np.asarray(w))

    def test_linear_dispatch_matches_dequant_oracle(self):
        # models/dit.linear() routes kernel_i4 leaves through the packed
        # path; it must equal the explicit fp32 dequant matmul
        from hunyuanvideo_efficiency_tpu.models.dit import linear
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            dequantize_int4, quantize_tensor_int4)

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
        w = jax.random.normal(k1, (64, 48)) * 0.1
        b = jax.random.normal(k2, (48,)) * 0.1
        x = jax.random.normal(k3, (2, 10, 64))
        q = {**quantize_tensor_int4(w), "bias": b}
        out = linear(q, x)
        ref = x @ dequantize_int4(q, x.dtype) + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_quantize_dit_params_covers_only_modulation(self):
        from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_dit_params_int4_modulation)

        cfg = DiTConfig(hidden_size=128, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(8, 12, 12), text_states_dim=64,
                        text_states_dim_2=32, attn_mode="sdpa")
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        qp = quantize_dit_params_int4_modulation(params)
        for blocks, mks in (("double_blocks", ("img_mod", "txt_mod")),
                            ("single_blocks", ("modulation",))):
            for mk in mks:
                assert "kernel_i4" in qp[blocks][mk], (blocks, mk)
                assert "kernel" not in qp[blocks][mk]
                assert "bias" in qp[blocks][mk]  # bias stays fp
            # non-modulation linears untouched
        assert qp["double_blocks"]["img_attn_qkv"]["kernel"].dtype \
            == params["double_blocks"]["img_attn_qkv"]["kernel"].dtype
        # the final layer's adaLN stays high precision (only block
        # modulation is packed, like the reference's fp8 coverage)
        assert qp["final_layer"]["adaLN_modulation"]["kernel"].dtype \
            == params["final_layer"]["adaLN_modulation"]["kernel"].dtype

    def test_int4_on_top_of_int8_tier(self):
        # the headline config stacks int4 modulation ON the int8 tier:
        # the int8-quantized modulation leaf must be dequantized first
        # (scale_out), not packed raw
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            dequantize_int4, quantize_dit_params_int4_modulation,
            quantize_tensor_int8)

        w = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 48)) * 0.2
        params = {"single_blocks": {"modulation": quantize_tensor_int8(w)}}
        qp = quantize_dit_params_int4_modulation(params)
        deq = dequantize_int4(qp["single_blocks"]["modulation"], jnp.float32)
        err = float(jnp.max(jnp.abs(deq - w)))
        amax = float(jnp.max(jnp.abs(w)))
        assert err < amax / 7.0, err  # int4 grid around the TRUE values

    def test_dit_forward_with_int4_modulation(self):
        from hunyuanvideo_efficiency_tpu.models.dit import (
            dit_forward, init_dit_params)
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
        from hunyuanvideo_efficiency_tpu.ops.quantization import (
            quantize_dit_params_int4_modulation)
        from hunyuanvideo_efficiency_tpu.ops.rope import (
            get_nd_rotary_pos_embed)

        cfg = DiTConfig(hidden_size=128, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(8, 12, 12), text_states_dim=64,
                        text_states_dim_2=32, attn_mode="sdpa")
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        # modulation linears are zero-init (reference modulate_layers.py
        # zero-init): randomize them so the tier is actually exercised
        ks = iter(jax.random.split(jax.random.PRNGKey(7), 8))
        for blocks, mks in (("double_blocks", ("img_mod", "txt_mod")),
                            ("single_blocks", ("modulation",))):
            for mk in mks:
                p = params[blocks][mk]
                p["kernel"] = jax.random.normal(
                    next(ks), p["kernel"].shape, jnp.float32) * 0.05
                p["bias"] = jax.random.normal(
                    next(ks), p["bias"].shape, jnp.float32) * 0.05
        qparams = quantize_dit_params_int4_modulation(params)

        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (1, 16, 3, 8, 6), jnp.float32)
        t = jnp.full((1,), 500.0)
        pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
        mask = jnp.ones((1, 8), jnp.int32)
        pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
        cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (3, 4, 3),
                                           theta=cfg.rope_theta)
        ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
        out = dit_forward(qparams, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / scale < 0.15, f"int4 rel err too large: {err/scale}"
        assert np.isfinite(np.asarray(out)).all()

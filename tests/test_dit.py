"""DiT backbone tests: shape contract, init-identity property, mask
equivalence with the reference's varlen packing semantics, timestep-embedding
oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.models.dit import (
    dit_forward,
    init_dit_params,
    params_count,
    patchify,
    timestep_embedding,
    unpatchify,
)
from hunyuanvideo_efficiency_tpu.models.dit_config import (
    HUNYUAN_VIDEO_CONFIG,
    DiTConfig,
)
from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

TINY = DiTConfig(
    patch_size=(1, 2, 2),
    in_channels=4,
    out_channels=4,
    hidden_size=64,
    heads_num=4,
    mlp_width_ratio=2.0,
    mm_double_blocks_depth=2,
    mm_single_blocks_depth=2,
    rope_dim_list=(4, 6, 6),
    text_states_dim=32,
    text_states_dim_2=16,
    guidance_embed=True,
    attn_mode="sdpa",
)

B, T, H, W = 1, 3, 8, 8
TXT_LEN = 8
TT, TH, TW = T // 1, H // 2, W // 2
IMG_LEN = TT * TH * TW


@pytest.fixture(scope="module")
def dit_params():
    return init_dit_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 4, T, H, W)), jnp.float32)
    t = jnp.array([500.0])
    txt = jnp.asarray(rng.standard_normal((B, TXT_LEN, 32)), jnp.float32)
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 1, 0, 0, 0]]), jnp.int32)
    txt2 = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(TINY.rope_dim_list, (TT, TH, TW),
                                       theta=256.0)
    guidance = jnp.array([6000.0])
    return x, t, txt, mask, txt2, cos, sin, guidance


FWD = jax.jit(dit_forward, static_argnames=("cfg",))


class TestForward:
    def test_output_shape(self, dit_params, inputs):
        x, t, txt, mask, txt2, cos, sin, g = inputs
        out = FWD(dit_params, x, t, txt, mask, txt2, cos, sin, g, cfg=TINY)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_init_output_is_zero(self, dit_params, inputs):
        # final_layer.linear is zero-init, so a fresh model predicts exactly 0
        # (reference FinalLayer zero-init: mlp_layers.py:102-103).
        x, t, txt, mask, txt2, cos, sin, g = inputs
        out = FWD(dit_params, x, t, txt, mask, txt2, cos, sin, g, cfg=TINY)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_padding_text_cannot_affect_output(self, dit_params, inputs):
        # Key-bias masking must make padded text positions inert — the
        # TPU-side equivalent of the reference's varlen packing.
        x, t, txt, mask, txt2, cos, sin, g = inputs
        params = jax.tree.map(lambda v: v, dit_params)
        # zero-init modulation gates make fresh blocks identity; randomize the
        # gates and the final layer so tokens actually influence the output
        keys = iter(jax.random.split(jax.random.PRNGKey(42), 8))
        for name in ("img_mod", "txt_mod"):
            params["double_blocks"][name]["kernel"] = 0.02 * jax.random.normal(
                next(keys), params["double_blocks"][name]["kernel"].shape)
        params["single_blocks"]["modulation"]["kernel"] = 0.02 * jax.random.normal(
            next(keys), params["single_blocks"]["modulation"]["kernel"].shape)
        params["final_layer"]["linear"]["kernel"] = 0.02 * jax.random.normal(
            next(keys), params["final_layer"]["linear"]["kernel"].shape)
        out1 = FWD(params, x, t, txt, mask, txt2, cos, sin, g, cfg=TINY)
        txt_perturbed = np.asarray(txt).copy()
        txt_perturbed[:, 5:] += 37.0  # only padded positions (mask==0)
        out2 = FWD(params, x, t, jnp.asarray(txt_perturbed), mask, txt2,
                   cos, sin, g, cfg=TINY)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-4, atol=1e-4)
        # sanity: perturbing a VALID position must change the output
        txt_valid = np.asarray(txt).copy()
        txt_valid[:, 2] += 1.0
        out3 = FWD(params, x, t, jnp.asarray(txt_valid), mask, txt2,
                   cos, sin, g, cfg=TINY)
        assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6

    def test_guidance_required(self, dit_params, inputs):
        x, t, txt, mask, txt2, cos, sin, _ = inputs
        with pytest.raises(ValueError):
            dit_forward(dit_params, x, t, txt, mask, txt2, cos, sin, None,
                        cfg=TINY)


class TestPatchify:
    def test_roundtrip_identity(self):
        # patchify with identity "linear" (hidden == patch volume) followed by
        # unpatchify must reproduce the input exactly.
        rng = np.random.default_rng(1)
        c, patch = 4, (1, 2, 2)
        x = jnp.asarray(rng.standard_normal((2, c, 3, 4, 6)), jnp.float32)
        dim = c * patch[0] * patch[1] * patch[2]
        p = {"kernel": jnp.eye(dim), "bias": jnp.zeros((dim,))}
        tokens = patchify(x, p, patch)
        assert tokens.shape == (2, 3 * 2 * 3, dim)
        # both patchify tokens and unpatchify input flatten as (c, pt, ph, pw)
        back = unpatchify(tokens, 3, 2, 3, c, patch)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


class TestEmbedding:
    def test_timestep_embedding_oracle(self):
        import math

        import torch

        t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
        got = np.asarray(timestep_embedding(jnp.asarray(t), 256))
        half = 128
        freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
        args = torch.tensor(t)[:, None] * freqs[None]
        want = torch.cat([args.cos(), args.sin()], dim=-1).numpy()
        # fp32 cos/sin range reduction differs slightly between XLA and torch
        # for large arguments (t up to 999); 2e-3 abs is the bitwise floor.
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


class TestConfig:
    def test_registry(self):
        cfg = HUNYUAN_VIDEO_CONFIG["HYVideo-T/2-cfgdistill"]
        assert cfg.guidance_embed
        assert cfg.hidden_size == 3072
        assert cfg.heads_num == 24
        assert cfg.head_dim == 128
        assert sum(cfg.rope_dim_list) == 128
        assert cfg.mm_double_blocks_depth == 20
        assert cfg.mm_single_blocks_depth == 40

    def test_params_count_structure(self, dit_params):
        c = params_count(dit_params)
        assert c["total"] > c["attn+mlp"] > 0
        assert c["attn+mlp"] == c["double"] + c["single"]

    def test_invalid_rope_dims(self):
        with pytest.raises(ValueError):
            DiTConfig(hidden_size=64, heads_num=4, rope_dim_list=(4, 4, 4))


def test_seq_pad_multiple_is_inert():
    """Padding the text segment to align img+txt to the attention block
    size must not change the output (masked text keys are silenced by the
    key-padding bias in every layer)."""
    from dataclasses import replace

    from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward,
                                                        init_dit_params)
    from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    cfg = DiTConfig(hidden_size=128, heads_num=4, mm_double_blocks_depth=2,
                    mm_single_blocks_depth=2, rope_dim_list=(8, 12, 12),
                    text_states_dim=64, text_states_dim_2=32,
                    attn_mode="sdpa")
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(ks[0], (1, 16, 3, 8, 6), jnp.float32)
    t = jnp.full((1,), 500.0)
    pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32).at[:, 6:].set(0)
    pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (3, 4, 3),
                                       theta=cfg.rope_theta)
    ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
    # img_len 36 + txt 8 = 44 -> pad to 64
    cfg_p = replace(cfg, seq_pad_multiple=64)
    out = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg_p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attn_head_chunks_exact():
    """Head-grouped attention (column-sliced qkv in, row-sliced projection
    out) is algebraically identical to the single-group path."""
    from dataclasses import replace

    from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward,
                                                        init_dit_params)
    from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    cfg = DiTConfig(hidden_size=128, heads_num=4, mm_double_blocks_depth=2,
                    mm_single_blocks_depth=2, rope_dim_list=(8, 12, 12),
                    text_states_dim=64, text_states_dim_2=32,
                    attn_mode="sdpa", seq_pad_multiple=64)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    x = jax.random.normal(ks[0], (1, 16, 3, 8, 6), jnp.float32)
    t = jnp.full((1,), 500.0)
    pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
    mask = jnp.ones((1, 8), jnp.int32).at[:, 6:].set(0)
    pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (3, 4, 3),
                                       theta=cfg.rope_theta)
    ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)
    out = dit_forward(params, x, t, pe, mask, pe2, cos, sin,
                      cfg=replace(cfg, attn_head_chunks=2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mlp_chunk_tokens_exact():
    """Token-chunked MLP/modulation passes (the 67k+-token memory lever) are
    algebraically identical to the unchunked path."""
    from dataclasses import replace

    params = init_dit_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, 4, T, H, W)), jnp.float32)
    t = jnp.array([500.0])
    txt = jnp.asarray(rng.standard_normal((B, TXT_LEN, 32)), jnp.float32)
    mask = jnp.ones((B, TXT_LEN), jnp.int32)
    txt2 = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    cos, sin = get_nd_rotary_pos_embed(TINY.rope_dim_list, (TT, TH, TW),
                                       theta=256.0)
    g = jnp.array([6000.0])
    ref = dit_forward(params, x, t, txt, mask, txt2, cos, sin, g, cfg=TINY)
    # IMG_LEN = 48: chunk 16 divides, chunk 40 leaves a ragged tail
    for chunk in (16, 40):
        out = dit_forward(params, x, t, txt, mask, txt2, cos, sin, g,
                          cfg=replace(TINY, mlp_chunk_tokens=chunk))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestStagedDispatch:
    """dit_forward_staged (host-chunked programs for the ~60 s on-device
    watchdog) must match the monolithic dit_forward bit-for-bit in fp32."""

    def _run(self, dit_params, inputs, **kw):
        from hunyuanvideo_efficiency_tpu.models.dit import dit_forward_staged

        x, t, txt, mask, txt2, cos, sin, guidance = inputs
        return dit_forward_staged(dit_params, x, t, txt, mask, txt2,
                                  cos, sin, guidance, cfg=TINY, **kw)

    def test_matches_monolithic(self, dit_params, inputs):
        x, t, txt, mask, txt2, cos, sin, guidance = inputs
        ref = FWD(dit_params, x, t, txt, mask, txt2, cos, sin, guidance,
                  cfg=TINY)
        # donation consumes carries; params are not donated, reuse is fine
        out = self._run(dit_params, inputs, double_chunks=2, single_chunks=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_uneven_chunks(self, dit_params, inputs):
        x, t, txt, mask, txt2, cos, sin, guidance = inputs
        ref = FWD(dit_params, x, t, txt, mask, txt2, cos, sin, guidance,
                  cfg=TINY)
        # 2 blocks into 3 requested chunks -> plan must cover exactly
        out = self._run(dit_params, inputs, double_chunks=3, single_chunks=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_prechunked_list_params(self, dit_params, inputs):
        from hunyuanvideo_efficiency_tpu.models.dit import rechunk_stacked

        x, t, txt, mask, txt2, cos, sin, guidance = inputs
        ref = FWD(dit_params, x, t, txt, mask, txt2, cos, sin, guidance,
                  cfg=TINY)
        chunked = dict(dit_params)
        chunked["double_blocks"] = rechunk_stacked(
            dit_params["double_blocks"], 2)
        chunked["single_blocks"] = rechunk_stacked(
            dit_params["single_blocks"], 2)
        out = self._run(chunked, inputs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_chunk_plan_covers_depth(self):
        from hunyuanvideo_efficiency_tpu.models.dit import _chunk_plan

        for depth, k in [(20, 4), (40, 4), (2, 3), (7, 3), (1, 1), (60, 7)]:
            plan = _chunk_plan(depth, k, 0, None)
            spans = [(s, s + ln) for (s, ln, _) in plan]
            assert spans[0][0] == 0 and spans[-1][1] == depth
            assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))

    def test_chunk_plan_sta_dense_boundary(self):
        from hunyuanvideo_efficiency_tpu.models.dit import _chunk_plan

        cfg = DiTConfig(hidden_size=64, heads_num=4, rope_dim_list=(4, 6, 6),
                        attn_mode="sta")
        plan = _chunk_plan(20, 4, 3, cfg)
        # first segment = dense blocks with attn_mode swapped off sta
        assert plan[0][0] == 0 and plan[0][1] == 3
        assert plan[0][2].attn_mode != "sta"
        assert all(p[2].attn_mode == "sta" for p in plan[1:])
        assert sum(p[1] for p in plan) == 20

    def test_prechunked_list_sta_dense_anchors(self):
        """Pre-chunked list params + STA dense-anchor blocks: chunk entries
        before the boundary must run dense, matching the monolithic
        split-scan forward; a boundary inside a chunk raises."""
        from dataclasses import replace

        from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward_staged,
                                                            rechunk_stacked)

        cfg = DiTConfig(hidden_size=128, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(8, 12, 12), text_states_dim=64,
                        text_states_dim_2=32, attn_mode="sta",
                        sta_tile=(2, 4, 4), sta_window=(3, 3, 3),
                        sta_dense_double_blocks=1,
                        sta_dense_single_blocks=1)
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        ks = jax.random.split(jax.random.PRNGKey(2), 4)
        x = jax.random.normal(ks[0], (1, 16, 4, 16, 12), jnp.float32)
        t = jnp.full((1,), 500.0)
        pe = jax.random.normal(ks[1], (1, 8, 64), jnp.float32)
        mask = jnp.ones((1, 8), jnp.int32)
        pe2 = jax.random.normal(ks[2], (1, 32), jnp.float32)
        cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (4, 8, 6),
                                           theta=cfg.rope_theta)
        ref = dit_forward(params, x, t, pe, mask, pe2, cos, sin, cfg=cfg)

        chunked = dict(params)
        chunked["double_blocks"] = rechunk_stacked(params["double_blocks"], 2)
        chunked["single_blocks"] = rechunk_stacked(params["single_blocks"], 2)
        out = dit_forward_staged(chunked, x, t, pe, mask, pe2, cos, sin,
                                 cfg=cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        # boundary 1 inside the single list entry [0, 2) -> error
        bad = dict(chunked)
        bad["double_blocks"] = rechunk_stacked(params["double_blocks"], 1)
        with pytest.raises(ValueError, match="boundary"):
            dit_forward_staged(bad, x, t, pe, mask, pe2, cos, sin, cfg=cfg)

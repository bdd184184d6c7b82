"""Scheduler + pipeline tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.diffusion.pipeline import (
    HunyuanVideoPipeline,
    rescale_noise_cfg,
)
from hunyuanvideo_efficiency_tpu.diffusion.scheduler import (
    FlowMatchDiscreteScheduler,
    euler_step,
    get_sigmas,
)
from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.models.vae import (
    AutoencoderKLCausal3D,
    init_vae_params,
)
from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig
from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed


class TestScheduler:
    def test_sigmas_sd3_shift_oracle(self):
        n, shift = 50, 7.0
        sigmas, timesteps = get_sigmas(n, shift=shift, reverse=True)
        lin = np.linspace(1, 0, n + 1)
        want = shift * lin / (1 + (shift - 1) * lin)
        np.testing.assert_allclose(sigmas, want, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(timesteps, want[:-1] * 1000, rtol=1e-6)
        assert sigmas[0] == 1.0 and abs(sigmas[-1]) < 1e-7

    def test_reverse_false_flips(self):
        sigmas, _ = get_sigmas(10, shift=1.0, reverse=False)
        assert sigmas[0] == 0.0 and sigmas[-1] == 1.0

    def test_euler_step_fp32(self):
        x = jnp.ones((2, 3), jnp.bfloat16)
        v = jnp.full((2, 3), 0.5, jnp.bfloat16)
        out = euler_step(x, v, 1.0, 0.9)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), 1.0 - 0.05, rtol=1e-6)

    def test_stateful_wrapper_matches_functional(self):
        sch = FlowMatchDiscreteScheduler(shift=7.0, reverse=True)
        sch.set_timesteps(10)
        x = jnp.ones((1, 4))
        v = jnp.full((1, 4), 2.0)
        (out,) = sch.step(v, sch.timesteps[0], x)
        want = euler_step(x, v, float(sch.sigmas[0]), float(sch.sigmas[1]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want))
        assert sch.step_index == 1

    def test_rescale_noise_cfg(self):
        rng = np.random.default_rng(0)
        cfgv = jnp.asarray(rng.standard_normal((2, 3, 4)) * 3, jnp.float32)
        text = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
        out = rescale_noise_cfg(cfgv, text, 1.0)
        np.testing.assert_allclose(
            np.asarray(jnp.std(out, axis=(1, 2))),
            np.asarray(jnp.std(text, axis=(1, 2))), rtol=1e-5)


TINY_DIT = DiTConfig(
    patch_size=(1, 2, 2), in_channels=4, out_channels=4, hidden_size=64,
    heads_num=4, mlp_width_ratio=2.0, mm_double_blocks_depth=1,
    mm_single_blocks_depth=1, rope_dim_list=(4, 6, 6), text_states_dim=32,
    text_states_dim_2=16, guidance_embed=True, attn_mode="sdpa")

TINY_VAE = VAEConfig(
    latent_channels=4, block_out_channels=(8, 16, 16, 16), layers_per_block=1,
    norm_num_groups=4, sample_size=32, sample_tsize=16, scaling_factor=0.476986)


@pytest.fixture(scope="module")
def pipeline():
    vae = AutoencoderKLCausal3D(
        TINY_VAE, init_vae_params(jax.random.PRNGKey(1), TINY_VAE))
    dit_params = init_dit_params(jax.random.PRNGKey(2), TINY_DIT)
    sch = FlowMatchDiscreteScheduler(shift=7.0, reverse=True)
    return HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=dit_params, transformer_cfg=TINY_DIT, scheduler=sch)


def _embeds(batch, txt_len=8):
    rng = np.random.default_rng(5)
    pe = jnp.asarray(rng.standard_normal((batch, txt_len, 32)), jnp.float32)
    mask = jnp.ones((batch, txt_len), jnp.int32)
    pe2 = jnp.asarray(rng.standard_normal((batch, 16)), jnp.float32)
    return pe, mask, pe2


class TestPipeline:
    H = W = 32
    F = 9

    def _freqs(self):
        # latent grid (T', H'/pt, W'/pw) = (3, 32/8/2, 32/8/2) = (3, 2, 2)
        return get_nd_rotary_pos_embed(TINY_DIT.rope_dim_list, (3, 2, 2),
                                       theta=256.0)

    def test_smoke_no_cfg(self, pipeline):
        pe, mask, pe2 = _embeds(1)
        out = pipeline(
            height=self.H, width=self.W, video_length=self.F,
            num_inference_steps=2, guidance_scale=1.0,
            embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
            prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
            freqs_cis=self._freqs())
        v = out.videos
        assert v.shape == (1, 3, self.F, self.H, self.W)
        assert v.min() >= 0.0 and v.max() <= 1.0
        assert np.isfinite(v).all()

    def test_cfg_path(self, pipeline):
        pe, mask, pe2 = _embeds(2)  # [neg, pos]
        out = pipeline(
            height=self.H, width=self.W, video_length=self.F,
            num_inference_steps=2, guidance_scale=2.0, guidance_rescale=0.5,
            embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
            prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
            freqs_cis=self._freqs())
        assert out.videos.shape == (1, 3, self.F, self.H, self.W)

    def test_latent_output(self, pipeline):
        pe, mask, pe2 = _embeds(1)
        out = pipeline(
            height=self.H, width=self.W, video_length=self.F,
            num_inference_steps=2, guidance_scale=1.0,
            embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
            prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
            freqs_cis=self._freqs(), output_type="latent")
        assert out.videos.shape == (1, 4, 3, 4, 4)

    def test_deterministic_given_key(self, pipeline):
        pe, mask, pe2 = _embeds(1)
        kwargs = dict(height=self.H, width=self.W, video_length=self.F,
                      num_inference_steps=2, guidance_scale=1.0,
                      embedded_guidance_scale=6.0,
                      prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
                      freqs_cis=self._freqs(), output_type="latent")
        a = pipeline(key=jax.random.PRNGKey(7), **kwargs).videos
        b = pipeline(key=jax.random.PRNGKey(7), **kwargs).videos
        c = pipeline(key=jax.random.PRNGKey(8), **kwargs).videos
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 0

    def test_bad_video_length_rejected(self, pipeline):
        with pytest.raises(ValueError):
            HunyuanVideoPipeline.check_inputs(32, 32, 10)
        with pytest.raises(ValueError):
            HunyuanVideoPipeline.check_inputs(33, 32, 9)


def test_stepwise_denoise_matches_scan(pipeline):
    """scan_denoise=False (host-driven loop; for progress callbacks and
    runtimes limiting program duration) is numerically identical to the
    fused-scan path."""
    pe, mask, pe2 = _embeds(2)
    freqs = get_nd_rotary_pos_embed(TINY_DIT.rope_dim_list, (3, 2, 2),
                                    theta=256.0)
    kwargs = dict(height=32, width=32, video_length=9,
                  num_inference_steps=4, guidance_scale=2.0,
                  embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
                  prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
                  freqs_cis=freqs, output_type="latent")
    a = pipeline(**kwargs).videos
    steps = []
    b = pipeline(**kwargs, scan_denoise=False,
                 progress_callback=lambda i, _: steps.append(i)).videos
    assert steps == [0, 1, 2, 3]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    # staged block-chunked dispatch (watchdog-bounded 720p path): the DiT
    # forward itself cut into chunked programs — numerics still identical
    c = pipeline(**kwargs, scan_denoise=False, block_chunks=(2, 2)).videos
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-5)


def test_offload_transformer_roundtrip():
    """offload_transformer parks DiT weights on host during decode and
    restores them for the next call; outputs match the resident path."""
    vae = AutoencoderKLCausal3D(
        TINY_VAE, init_vae_params(jax.random.PRNGKey(1), TINY_VAE))
    dit_params = init_dit_params(jax.random.PRNGKey(2), TINY_DIT)
    sch = FlowMatchDiscreteScheduler(shift=7.0, reverse=True)
    pipe = HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=dit_params, transformer_cfg=TINY_DIT,
        scheduler=sch, offload_transformer=True)
    pe, mask, pe2 = _embeds(1)
    freqs = get_nd_rotary_pos_embed(TINY_DIT.rope_dim_list, (3, 2, 2),
                                    theta=256.0)
    kwargs = dict(height=32, width=32, video_length=9,
                  num_inference_steps=2, guidance_scale=1.0,
                  embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
                  prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
                  freqs_cis=freqs)
    a = pipe(**kwargs).videos
    # after decode the params sit on host
    leaf = jax.tree.leaves(pipe.transformer_params)[0]
    assert leaf.devices() == {jax.devices("cpu")[0]}
    # second call restores them and reproduces the output
    b = pipe(**kwargs).videos
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_offload_transformer_free():
    """offload_transformer="free" deletes the DiT weights after the denoise
    (one-shot generation: no 13 GB host round-trip); output matches the
    roundtrip path, and a second call fails loudly instead of recomputing
    with freed buffers."""
    vae = AutoencoderKLCausal3D(
        TINY_VAE, init_vae_params(jax.random.PRNGKey(1), TINY_VAE))
    dit_params = init_dit_params(jax.random.PRNGKey(2), TINY_DIT)
    sch = FlowMatchDiscreteScheduler(shift=7.0, reverse=True)
    pe, mask, pe2 = _embeds(1)
    freqs = get_nd_rotary_pos_embed(TINY_DIT.rope_dim_list, (3, 2, 2),
                                    theta=256.0)
    kwargs = dict(height=32, width=32, video_length=9,
                  num_inference_steps=2, guidance_scale=1.0,
                  embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
                  prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
                  freqs_cis=freqs)
    ref = HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=dit_params, transformer_cfg=TINY_DIT,
        scheduler=sch, offload_transformer=True)(**kwargs).videos
    pipe = HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=jax.tree.map(jnp.copy, dit_params),
        transformer_cfg=TINY_DIT,
        scheduler=sch, offload_transformer="free")
    a = pipe(**kwargs).videos
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert pipe.transformer_params is None
    with pytest.raises(RuntimeError, match="freed"):
        pipe(**kwargs)


def test_index_for_timestep_nearest_match():
    """Exact match keeps reference semantics; a reduced-precision scalar
    (e.g. bf16 readback) resolves to the nearest step instead of raising."""
    sch = FlowMatchDiscreteScheduler(shift=7.0, reverse=True)
    sch.set_timesteps(10)
    t3 = float(sch.timesteps[3])
    assert sch.index_for_timestep(t3) == 3
    assert sch.index_for_timestep(t3 + 0.01) == 3
    assert sch.index_for_timestep(
        float(jnp.asarray(t3, jnp.bfloat16))) == 3


def test_phase_sequenced_text_then_deferred_transformer():
    """Full phase sequencing: encode with real towers, free them
    (offload_encoders='free'), THEN materialize the DiT via
    transformer_builder — the single-chip tier where the 8B tower and the
    13B DiT never coexist in HBM (here at toy scale)."""
    from hunyuanvideo_efficiency_tpu.models.text import (
        CLIPTextConfig, LlamaConfig, TextEncoder)

    tiny_llm = LlamaConfig(vocab_size=256, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2)
    tiny_clip = CLIPTextConfig(vocab_size=96, hidden_size=16,
                               intermediate_size=32, num_hidden_layers=2,
                               num_attention_heads=4,
                               max_position_embeddings=77, eos_token_id=95)
    tpl = {"template": "instr {}", "crop_start": 2}
    llm = TextEncoder("llm", max_length=10, model_config=tiny_llm,
                      prompt_template=tpl, prompt_template_video=tpl,
                      hidden_state_skip_layer=1, dtype=jnp.float32,
                      quant="int8")
    clip = TextEncoder("clipL", max_length=16, model_config=tiny_clip,
                       dtype=jnp.float32)
    vae = AutoencoderKLCausal3D(
        TINY_VAE, init_vae_params(jax.random.PRNGKey(1), TINY_VAE))
    built = []

    def builder():
        built.append(True)
        # the encoders must be gone before the DiT materializes
        assert llm.params is None and clip.params is None
        return init_dit_params(jax.random.PRNGKey(2), TINY_DIT)

    pipe = HunyuanVideoPipeline(
        vae=vae, text_encoder=llm, text_encoder_2=clip,
        transformer_params=None, transformer_builder=builder,
        transformer_cfg=TINY_DIT,
        scheduler=FlowMatchDiscreteScheduler(shift=7.0, reverse=True),
        offload_encoders="free")
    freqs = get_nd_rotary_pos_embed(TINY_DIT.rope_dim_list, (3, 2, 2),
                                    theta=256.0)
    out = pipe(prompt="a cat", negative_prompt="bad",
               height=32, width=32, video_length=9,
               num_inference_steps=2, guidance_scale=1.0,
               embedded_guidance_scale=6.0, key=jax.random.PRNGKey(0),
               freqs_cis=freqs)
    assert built == [True]
    assert out.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(out.videos).all()


def test_pipeline_output_dtype_uint8_matches_float(tiny_pipe_factory=None):
    """output_dtype='uint8' quantizes ON DEVICE (4x smaller host readback
    through remote-device links) and must equal the float output's own
    round(x*255) quantization bit-exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hunyuanvideo_efficiency_tpu.diffusion.pipeline import (
        HunyuanVideoPipeline)
    from hunyuanvideo_efficiency_tpu.diffusion.scheduler import (
        FlowMatchDiscreteScheduler)
    from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
    from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
    from hunyuanvideo_efficiency_tpu.models.vae import (AutoencoderKLCausal3D,
                                                        init_vae_params)
    from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    cfg = DiTConfig(hidden_size=64, heads_num=2, mm_double_blocks_depth=1,
                    mm_single_blocks_depth=1, rope_dim_list=(8, 12, 12),
                    text_states_dim=32, text_states_dim_2=24,
                    attn_mode="sdpa")
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    vcfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                     layers_per_block=1, norm_num_groups=8)
    vae = AutoencoderKLCausal3D(vcfg, init_vae_params(jax.random.PRNGKey(1),
                                                      vcfg))
    pipe = HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=params, transformer_cfg=cfg,
        scheduler=FlowMatchDiscreteScheduler(shift=7.0, reverse=True))
    h, w, f = 32, 32, 5
    freqs = get_nd_rotary_pos_embed(cfg.rope_dim_list,
                                    ((f - 1) // 4 + 1, h // 16, w // 16))
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    kw = dict(prompt_embeds=jax.random.normal(ks[0], (1, 8, 32)),
              prompt_mask=jnp.ones((1, 8), jnp.int32),
              prompt_embeds_2=jax.random.normal(ks[1], (1, 24)),
              height=h, width=w, video_length=f, num_inference_steps=2,
              guidance_scale=1.0, embedded_guidance_scale=6.0,
              freqs_cis=freqs, key=jax.random.PRNGKey(42))
    f32 = pipe(**kw).videos
    u8 = pipe(**kw, output_dtype="uint8").videos
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(
        u8, np.round(f32 * 255.0).astype(np.uint8))
    f16 = pipe(**kw, output_dtype="float16").videos
    assert f16.dtype == np.float16
    np.testing.assert_allclose(f16.astype(np.float32), f32, atol=1e-3)

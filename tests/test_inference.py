"""Orchestration layer tests: sampler predict API, seed semantics, CLI
parsing (reference analog: hyvideo/inference.py predict + config.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.config import InferenceArgs, parse_args
from hunyuanvideo_efficiency_tpu.inference import (HunyuanVideoSampler,
                                                   get_rotary_pos_embed)
from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.models.text import (CLIPTextConfig,
                                                     LlamaConfig, TextEncoder)
from hunyuanvideo_efficiency_tpu.models.vae import (AutoencoderKLCausal3D,
                                                    init_vae_params)
from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig

TINY_DIT = DiTConfig(hidden_size=128, heads_num=4, mm_double_blocks_depth=1,
                     mm_single_blocks_depth=1, rope_dim_list=(8, 12, 12),
                     text_states_dim=64, text_states_dim_2=48,
                     attn_mode="sdpa")
TINY_LLM = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2)
TINY_CLIP = CLIPTextConfig(vocab_size=96, hidden_size=48,
                           intermediate_size=96, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=77, eos_token_id=95)


@pytest.fixture(scope="module")
def sampler():
    args = InferenceArgs(text_states_dim=64, text_states_dim_2=48,
                         vae_tiling=False)
    tpl = {"template": "instr {}", "crop_start": 2}
    llm = TextEncoder("llm", max_length=10, model_config=TINY_LLM,
                      prompt_template=tpl, prompt_template_video=tpl,
                      hidden_state_skip_layer=1, dtype=jnp.float32)
    clip = TextEncoder("clipL", max_length=16, model_config=TINY_CLIP,
                       dtype=jnp.float32)
    vcfg = VAEConfig(block_out_channels=(32, 32, 64, 64), layers_per_block=1)
    vae = AutoencoderKLCausal3D(
        vcfg, init_vae_params(jax.random.PRNGKey(0), vcfg))
    params = init_dit_params(jax.random.PRNGKey(1), TINY_DIT)
    return HunyuanVideoSampler(args, vae, llm, clip, params, TINY_DIT)


class TestPredict:
    def test_basic_predict(self, sampler):
        out = sampler.predict("a cat", height=32, width=32, video_length=5,
                              seed=42, infer_steps=2, guidance_scale=1.5,
                              flow_shift=7.0)
        assert out["samples"].shape == (1, 3, 5, 32, 32)
        assert out["seeds"] == [42]
        assert out["size"] == (32, 32, 5)
        assert np.isfinite(out["samples"]).all()

    def test_seed_semantics(self, sampler):
        a = sampler.predict("x", 32, 32, 5, seed=7, infer_steps=1)
        b = sampler.predict("x", 32, 32, 5, seed=7, infer_steps=1)
        c = sampler.predict("x", 32, 32, 5, seed=8, infer_steps=1)
        np.testing.assert_array_equal(a["samples"], b["samples"])
        assert np.abs(a["samples"] - c["samples"]).max() > 0

    def test_height_width_alignment(self, sampler):
        out = sampler.predict("x", height=30, width=33, video_length=1,
                              infer_steps=1, seed=0)
        assert out["size"][:2] == (32, 48)  # aligned to 16

    def test_bad_video_length(self, sampler):
        with pytest.raises(ValueError, match="multiple of 4"):
            sampler.predict("x", 32, 32, video_length=6, infer_steps=1)

    def test_bad_prompt_type(self, sampler):
        with pytest.raises(TypeError, match="prompt"):
            sampler.predict(123, 32, 32, 5, infer_steps=1)

    def test_default_negative_prompt_used(self, sampler):
        # CFG path with default negative prompt must run
        out = sampler.predict("x", 32, 32, 1, infer_steps=1, seed=1,
                              guidance_scale=3.0)
        assert np.isfinite(out["samples"]).all()


class TestRope:
    def test_rope_sizes(self):
        cos, sin, sizes = get_rotary_pos_embed(
            DiTConfig(), "884-16c-hy", 129, 720, 1280)
        assert sizes == (33, 45, 80)
        assert cos.shape == (33 * 45 * 80, 128)


class TestCLI:
    def test_defaults_match_reference(self):
        a = parse_args([])
        assert a.model == "HYVideo-T/2-cfgdistill"
        assert a.infer_steps == 50
        assert a.video_size == (720, 1280)
        assert a.video_length == 129
        assert a.cfg_scale == 1.0
        assert a.embedded_cfg_scale == 6.0
        assert a.flow_shift == 7.0
        assert a.vae == "884-16c-hy"

    def test_flag_roundtrip(self):
        a = parse_args(["--video-size", "544", "960", "--ulysses-degree",
                        "4", "--ring-degree", "2", "--use-fp8",
                        "--flow-shift", "17", "--seed", "42"])
        assert a.video_size == (544, 960)
        assert a.ulysses_degree == 4 and a.ring_degree == 2
        assert a.use_fp8 is True
        assert a.flow_shift == 17.0
        assert a.seed == 42

    def test_bad_vae_name(self):
        with pytest.raises(ValueError, match="Invalid VAE name"):
            InferenceArgs(vae="bogus")


class TestPerVideoSeeds:
    def test_num_videos_individually_reproducible(self, sampler):
        two = sampler.predict("x", 32, 32, 1, seed=5, infer_steps=1,
                              num_videos_per_prompt=2)
        one_a = sampler.predict("x", 32, 32, 1, seed=5, infer_steps=1)
        one_b = sampler.predict("x", 32, 32, 1, seed=6, infer_steps=1)
        assert two["seeds"] == [5, 6]
        np.testing.assert_allclose(two["samples"][0], one_a["samples"][0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(two["samples"][1], one_b["samples"][0],
                                   rtol=1e-5, atol=1e-5)


class TestMeshShape:
    def test_mesh_shape_parsing(self):
        from hunyuanvideo_efficiency_tpu.inference import Inference
        from hunyuanvideo_efficiency_tpu.models.text import (CLIPTextConfig,
                                                             LlamaConfig)

        import hunyuanvideo_efficiency_tpu.models.dit_config as dc

        dc.HUNYUAN_VIDEO_CONFIG["tiny-mesh-test"] = TINY_DIT
        args = InferenceArgs(model="tiny-mesh-test",
                             mesh_shape="dp:2,sp:2,ring:2",
                             text_states_dim=64, text_states_dim_2=48)
        inf = Inference.from_pretrained(
            "/tmp/nonexistent-mesh-test", args=args, allow_random_init=True,
            llm_config=LlamaConfig(vocab_size=64, hidden_size=32,
                                   intermediate_size=48,
                                   num_hidden_layers=1,
                                   num_attention_heads=4,
                                   num_key_value_heads=2),
            clip_config=CLIPTextConfig(vocab_size=64, hidden_size=24,
                                       intermediate_size=48,
                                       num_hidden_layers=1,
                                       num_attention_heads=4,
                                       max_position_embeddings=77,
                                       eos_token_id=63))
        assert inf.pcfg.dp_degree == 2
        assert inf.pcfg.ulysses_degree == 2
        assert inf.pcfg.ring_degree == 2
        assert inf.mesh is not None and inf.mesh.devices.size == 8

    def test_bad_axis_raises(self):
        from hunyuanvideo_efficiency_tpu.inference import Inference

        import hunyuanvideo_efficiency_tpu.models.dit_config as dc

        dc.HUNYUAN_VIDEO_CONFIG["tiny-mesh-test"] = TINY_DIT
        args = InferenceArgs(model="tiny-mesh-test", mesh_shape="bogus:2")
        with pytest.raises(ValueError, match="Unknown mesh axis"):
            Inference.from_pretrained("/tmp/x", args=args,
                                      allow_random_init=True)

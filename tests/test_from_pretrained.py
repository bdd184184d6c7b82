"""End-to-end from_pretrained integration: torch .pt fixtures through the
real loading path (pickle read, key mapping, vae. prefix stripping, fp8,
converted-npz artifacts) into a working sampler."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    import torch

    from dataclasses import replace

    from tests.test_checkpoint import (CFG, VCFG, make_dit_state_dict,
                                       make_vae_state_dict)

    cfg4 = replace(CFG, in_channels=VCFG.latent_channels,
                   out_channels=VCFG.latent_channels)
    base = tmp_path_factory.mktemp("ckpts")
    tdir = base / "hunyuan-video-t2v-720p" / "transformers"
    tdir.mkdir(parents=True)
    dit_sd = {k: torch.from_numpy(v) for k, v in
              make_dit_state_dict(cfg4).items()}
    # deepspeed-style container with module key (reference layout)
    torch.save({"module": dit_sd}, tdir / "mp_rank_00_model_states.pt")

    vdir = base / "hunyuan-video-t2v-720p" / "vae"
    vdir.mkdir(parents=True)
    vae_sd = {k: torch.from_numpy(v) for k, v in
              make_vae_state_dict(VCFG).items()}
    torch.save(vae_sd, vdir / "pytorch_model.pt")
    return base


def _make_sampler(ckpt_dir, **kw):
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.config import InferenceArgs
    from hunyuanvideo_efficiency_tpu.inference import HunyuanVideoSampler
    from hunyuanvideo_efficiency_tpu.models.text import (CLIPTextConfig,
                                                         LlamaConfig)
    from tests.test_checkpoint import CFG, VCFG

    from dataclasses import replace

    import hunyuanvideo_efficiency_tpu.inference as inf
    import hunyuanvideo_efficiency_tpu.models.dit_config as dc
    import hunyuanvideo_efficiency_tpu.models.vae_config as vc

    cfg4 = replace(CFG, in_channels=VCFG.latent_channels,
                   out_channels=VCFG.latent_channels)
    # register the tiny architectures under test-local names
    dc.HUNYUAN_VIDEO_CONFIG["tiny-test"] = cfg4
    vc.VAE_CONFIGS["884-16c-tiny"] = VCFG

    args = InferenceArgs(model="tiny-test", text_states_dim=32,
                         text_states_dim_2=24, vae_tiling=False,
                         text_encoder_precision="fp32", **kw)
    args.vae_info = args.vae_info  # keep parsed info
    # point the VAE registry lookup at the tiny config
    orig = inf.load_vae_config
    inf.load_vae_config = lambda name, **o: VCFG
    try:
        sampler = HunyuanVideoSampler.from_pretrained(
            str(ckpt_dir), args=args, allow_random_init=True,
            llm_config=LlamaConfig(vocab_size=128, hidden_size=32,
                                   intermediate_size=64,
                                   num_hidden_layers=2,
                                   num_attention_heads=4,
                                   num_key_value_heads=2),
            clip_config=CLIPTextConfig(vocab_size=96, hidden_size=24,
                                       intermediate_size=48,
                                       num_hidden_layers=2,
                                       num_attention_heads=4,
                                       max_position_embeddings=77,
                                       eos_token_id=95))
    finally:
        inf.load_vae_config = orig
    return sampler


def test_from_pretrained_loads_and_predicts(ckpt_dir):
    sampler = _make_sampler(ckpt_dir)
    # converted deepspeed weights actually loaded (not random): check a
    # stacked kernel matches the fixture
    import torch

    sd = torch.load(str(ckpt_dir / "hunyuan-video-t2v-720p/transformers/"
                        "mp_rank_00_model_states.pt"), weights_only=True)
    want = sd["module"]["double_blocks.0.img_attn_qkv.weight"].numpy().T
    got = np.asarray(
        sampler.transformer_params["double_blocks"]["img_attn_qkv"]
        ["kernel"][0], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)

    out = sampler.predict("a cat", height=32, width=32, video_length=5,
                          seed=3, infer_steps=1)
    assert out["samples"].shape == (1, 3, 5, 32, 32)
    assert np.isfinite(out["samples"]).all()


def test_from_pretrained_fp8(ckpt_dir):
    import jax.numpy as jnp

    sampler = _make_sampler(ckpt_dir, use_fp8=True)
    k = sampler.transformer_params["double_blocks"]["img_attn_qkv"]["kernel"]
    assert k.dtype == jnp.float8_e4m3fn
    out = sampler.predict("a cat", 32, 32, 1, seed=1, infer_steps=1)
    assert np.isfinite(out["samples"]).all()


def test_from_pretrained_npz_artifacts(ckpt_dir, tmp_path):
    """Converted dit.npz / vae.npz artifacts load preferentially."""
    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.utils.checkpoint import save_params_npz

    base = _make_sampler(ckpt_dir)  # torch path, ground truth
    out = tmp_path / "converted"
    out.mkdir()
    save_params_npz(str(out / "dit.npz"),
                    jax.tree.map(np.asarray, base.transformer_params))
    save_params_npz(str(out / "vae.npz"),
                    jax.tree.map(np.asarray, base.vae.params))
    sampler = _make_sampler(out)
    a = jax.tree.leaves(base.transformer_params)
    b = jax.tree.leaves(sampler.transformer_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=1e-2, atol=1e-3)
    res = sampler.predict("a cat", 32, 32, 1, seed=2, infer_steps=1)
    assert np.isfinite(res["samples"]).all()


def test_from_pretrained_text_encoder_quant_int8(ckpt_dir):
    import jax.numpy as jnp

    sampler = _make_sampler(ckpt_dir, text_encoder_quant="int8")
    k = sampler.text_encoder.params["layers"]["self_attn"]["q_proj"]
    assert k["kernel"].dtype == jnp.int8
    assert "scale_out" in k
    # CLIP never quantizes
    assert sampler.text_encoder_2.params["token_embedding"][
        "embedding"].dtype != jnp.int8
    out = sampler.predict("a cat", height=32, width=32, video_length=5,
                          seed=3, infer_steps=1)
    assert np.isfinite(out["samples"]).all()


def test_from_pretrained_int4_modulation(ckpt_dir):
    import jax.numpy as jnp

    sampler = _make_sampler(ckpt_dir, use_int8=True,
                            use_int4_modulation=True)
    blocks = sampler.transformer_params["double_blocks"]
    assert blocks["img_mod"]["kernel_i4"].dtype == jnp.uint8
    assert "kernel" not in blocks["img_mod"]
    # the rest of the int8 tier is intact underneath
    assert blocks["img_attn_qkv"]["kernel"].dtype == jnp.int8
    out = sampler.predict("a cat", height=32, width=32, video_length=5,
                          seed=3, infer_steps=1)
    assert np.isfinite(out["samples"]).all()

"""Checkpoint converter tests: synthetic reference-style state dicts
(reference key names per hyvideo/modules/models.py / hyvideo/vae/*) ->
converted trees -> runnable forwards; npz persistence roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuanvideo_efficiency_tpu.models.dit import dit_forward
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.models.vae import AutoencoderKLCausal3D
from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig
from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
from hunyuanvideo_efficiency_tpu.utils.checkpoint import (
    convert_dit_state_dict, convert_vae_state_dict, coverage_report,
    load_params_npz, save_params_npz)

RNG = np.random.default_rng(0)

CFG = DiTConfig(hidden_size=64, heads_num=4, mm_double_blocks_depth=2,
                mm_single_blocks_depth=2, rope_dim_list=(4, 6, 6),
                text_states_dim=32, text_states_dim_2=24,
                guidance_embed=True, attn_mode="sdpa")


def _r(*shape):
    return RNG.standard_normal(shape).astype(np.float32) * 0.05


def make_dit_state_dict(cfg: DiTConfig):
    """Reference module names (models.py:448-581, token_refiner.py:16-236)."""
    h = cfg.hidden_size
    d = cfg.head_dim
    m = cfg.mlp_hidden_dim
    td, td2 = cfg.text_states_dim, cfg.text_states_dim_2
    sd = {}

    def lin(name, cin, cout, bias=True):
        sd[f"{name}.weight"] = _r(cout, cin)
        if bias:
            sd[f"{name}.bias"] = _r(cout)

    def norm(name, c, bias=True):
        sd[f"{name}.weight"] = _r(c) + 1.0
        if bias:
            sd[f"{name}.bias"] = _r(c)

    sd["img_in.proj.weight"] = _r(h, cfg.in_channels, 1, 2, 2)
    sd["img_in.proj.bias"] = _r(h)
    lin("time_in.mlp.0", 256, h)
    lin("time_in.mlp.2", h, h)
    lin("vector_in.in_layer", td2, h)
    lin("vector_in.out_layer", h, h)
    lin("guidance_in.mlp.0", 256, h)
    lin("guidance_in.mlp.2", h, h)
    lin("txt_in.input_embedder", td, h)
    lin("txt_in.t_embedder.mlp.0", 256, h)
    lin("txt_in.t_embedder.mlp.2", h, h)
    lin("txt_in.c_embedder.linear_1", td, h)
    lin("txt_in.c_embedder.linear_2", h, h)
    for i in range(2):
        b = f"txt_in.individual_token_refiner.blocks.{i}"
        norm(f"{b}.norm1", h)
        lin(f"{b}.self_attn_qkv", h, 3 * h)
        lin(f"{b}.self_attn_proj", h, h)
        norm(f"{b}.norm2", h)
        lin(f"{b}.mlp.fc1", h, 4 * h)
        lin(f"{b}.mlp.fc2", 4 * h, h)
        lin(f"{b}.adaLN_modulation.1", h, 2 * h)
    for i in range(cfg.mm_double_blocks_depth):
        b = f"double_blocks.{i}"
        lin(f"{b}.img_mod.linear", h, 6 * h)
        lin(f"{b}.txt_mod.linear", h, 6 * h)
        lin(f"{b}.img_attn_qkv", h, 3 * h)
        lin(f"{b}.txt_attn_qkv", h, 3 * h)
        norm(f"{b}.img_attn_q_norm", d, bias=False)
        norm(f"{b}.img_attn_k_norm", d, bias=False)
        norm(f"{b}.txt_attn_q_norm", d, bias=False)
        norm(f"{b}.txt_attn_k_norm", d, bias=False)
        lin(f"{b}.img_attn_proj", h, h)
        lin(f"{b}.txt_attn_proj", h, h)
        lin(f"{b}.img_mlp.fc1", h, m)
        lin(f"{b}.img_mlp.fc2", m, h)
        lin(f"{b}.txt_mlp.fc1", h, m)
        lin(f"{b}.txt_mlp.fc2", m, h)
    for i in range(cfg.mm_single_blocks_depth):
        b = f"single_blocks.{i}"
        lin(f"{b}.linear1", h, 3 * h + m)
        lin(f"{b}.linear2", h + m, h)
        norm(f"{b}.q_norm", d, bias=False)
        norm(f"{b}.k_norm", d, bias=False)
        lin(f"{b}.modulation.linear", h, 3 * h)
    lin("final_layer.linear", h, 1 * 2 * 2 * cfg.out_channels)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    return sd


class TestDiTConverter:
    def test_converts_and_runs(self):
        sd = make_dit_state_dict(CFG)
        params = convert_dit_state_dict(sd, CFG)
        params = jax.tree.map(jnp.asarray, params)
        assert params["double_blocks"]["img_attn_qkv"]["kernel"].shape == \
            (2, 64, 192)

        x = jnp.asarray(_r(1, 16, 3, 8, 6) * 10)
        cos, sin = get_nd_rotary_pos_embed(CFG.rope_dim_list, (3, 4, 3),
                                           theta=CFG.rope_theta)
        out = dit_forward(params, x, jnp.full((1,), 500.0),
                          jnp.asarray(_r(1, 8, 32)), jnp.ones((1, 8)),
                          jnp.asarray(_r(1, 24)), cos, sin,
                          jnp.full((1,), 6000.0), cfg=CFG)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_unconverted_keys_raise(self):
        sd = make_dit_state_dict(CFG)
        sd["unexpected.weight"] = _r(4, 4)
        with pytest.raises(ValueError, match="Unconverted DiT keys"):
            convert_dit_state_dict(sd, CFG)

    def test_patchify_weight_layout(self):
        """Conv k=stride=patch equals our reshape+matmul on the converted
        kernel (validates the (C, pt, ph, pw) ordering)."""
        import torch
        import torch.nn.functional as F

        sd = make_dit_state_dict(CFG)
        params = convert_dit_state_dict(sd, CFG)
        x = _r(1, 16, 2, 4, 4)
        want = F.conv3d(torch.tensor(x),
                        torch.tensor(sd["img_in.proj.weight"]),
                        torch.tensor(sd["img_in.proj.bias"]),
                        stride=(1, 2, 2))
        want = want.flatten(2).transpose(1, 2).numpy()  # [B, L, h]
        from hunyuanvideo_efficiency_tpu.models.dit import patchify

        got = np.asarray(patchify(jnp.asarray(x),
                                  jax.tree.map(jnp.asarray,
                                               params["img_in"]),
                                  CFG.patch_size))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


VCFG = VAEConfig(block_out_channels=(32, 32, 64, 64), layers_per_block=1,
                 latent_channels=4, sample_size=32, sample_tsize=8)


def make_vae_state_dict(cfg: VAEConfig):
    """Reference VAE names (vae.py:32-294, unet_causal_3d_blocks.py) with the
    `vae.` prefix variant the loader must strip (vae/__init__.py:98-102)."""
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = _r(cout, cin, k, k, k)
        sd[f"{name}.bias"] = _r(cout)

    def norm(name, c):
        sd[f"{name}.weight"] = _r(c) + 1.0
        sd[f"{name}.bias"] = _r(c)

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = _r(cout, cin)
        sd[f"{name}.bias"] = _r(cout)

    def resnet(base, cin, cout):
        norm(f"{base}.norm1", cin)
        conv(f"{base}.conv1.conv", cin, cout)
        norm(f"{base}.norm2", cout)
        conv(f"{base}.conv2.conv", cout, cout)
        if cin != cout:
            sd[f"{base}.conv_shortcut.conv.weight"] = _r(cout, cin, 1, 1, 1)
            sd[f"{base}.conv_shortcut.conv.bias"] = _r(cout)

    def mid(base, c):
        resnet(f"{base}.resnets.0", c, c)
        resnet(f"{base}.resnets.1", c, c)
        norm(f"{base}.attentions.0.group_norm", c)
        lin(f"{base}.attentions.0.to_q", c, c)
        lin(f"{base}.attentions.0.to_k", c, c)
        lin(f"{base}.attentions.0.to_v", c, c)
        lin(f"{base}.attentions.0.to_out.0", c, c)

    bo = cfg.block_out_channels
    conv("encoder.conv_in.conv", cfg.in_channels, bo[0])
    for i in range(cfg.num_blocks):
        cin, cout = cfg.encoder_block_channels(i)
        resnet(f"encoder.down_blocks.{i}.resnets.0", cin, cout)
        if cfg.downsample_stride(i) is not None:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv.conv",
                 cout, cout)
    mid("encoder.mid_block", bo[-1])
    norm("encoder.conv_norm_out", bo[-1])
    conv("encoder.conv_out.conv", bo[-1], 2 * cfg.latent_channels)

    conv("decoder.conv_in.conv", cfg.latent_channels, bo[-1])
    mid("decoder.mid_block", bo[-1])
    for i in range(cfg.num_blocks):
        cin, cout = cfg.decoder_block_channels(i)
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout)
        if cfg.upsample_factor(i) is not None:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv.conv", cout, cout)
    norm("decoder.conv_norm_out", bo[0])
    conv("decoder.conv_out.conv", bo[0], cfg.out_channels)
    sd["quant_conv.weight"] = _r(2 * cfg.latent_channels,
                                 2 * cfg.latent_channels, 1, 1, 1)
    sd["quant_conv.bias"] = _r(2 * cfg.latent_channels)
    sd["post_quant_conv.weight"] = _r(cfg.latent_channels,
                                      cfg.latent_channels, 1, 1, 1)
    sd["post_quant_conv.bias"] = _r(cfg.latent_channels)
    return {f"vae.{k}": v for k, v in sd.items()}


class TestVAEConverter:
    def test_converts_and_roundtrips(self):
        sd = make_vae_state_dict(VCFG)
        params = convert_vae_state_dict(sd, VCFG)
        params = jax.tree.map(jnp.asarray, params)
        vae = AutoencoderKLCausal3D(VCFG, params)
        x = jnp.asarray(_r(1, 3, 5, 32, 32))
        out = vae(x, sample_posterior=False)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_npz_roundtrip_and_coverage(self, tmp_path):
        sd = make_vae_state_dict(VCFG)
        params = convert_vae_state_dict(sd, VCFG)
        p = str(tmp_path / "vae.npz")
        save_params_npz(p, params)
        loaded = load_params_npz(p)
        missing, extra = coverage_report(loaded, params)
        assert missing == [] and extra == []
        a = jax.tree.leaves(params)
        b = jax.tree.leaves(loaded)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

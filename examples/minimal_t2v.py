"""Minimal end-to-end text-to-video demo (random weights, CPU-runnable).

Demonstrates the full public API wiring — text encoders -> pipeline ->
denoise scan -> VAE decode -> mp4 — at toy sizes, without checkpoints.
With converted checkpoints under ./ckpts, use sample_video.py instead.

    python examples/minimal_t2v.py [output.mp4]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from hunyuanvideo_efficiency_tpu.config import InferenceArgs
from hunyuanvideo_efficiency_tpu.inference import HunyuanVideoSampler
from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig
from hunyuanvideo_efficiency_tpu.models.text import (CLIPTextConfig,
                                                     LlamaConfig, TextEncoder)
from hunyuanvideo_efficiency_tpu.models.vae import (AutoencoderKLCausal3D,
                                                    init_vae_params)
from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig
from hunyuanvideo_efficiency_tpu.utils.file_utils import save_videos_grid


def build_toy_sampler() -> HunyuanVideoSampler:
    dit_cfg = DiTConfig(
        hidden_size=256, heads_num=4, mm_double_blocks_depth=2,
        mm_single_blocks_depth=4, rope_dim_list=(16, 24, 24),
        text_states_dim=128, text_states_dim_2=64, attn_mode="auto")
    llm = TextEncoder(
        "llm", max_length=32,
        model_config=LlamaConfig(vocab_size=512, hidden_size=128,
                                 intermediate_size=256, num_hidden_layers=3,
                                 num_attention_heads=4,
                                 num_key_value_heads=2),
        hidden_state_skip_layer=1, dtype=jnp.float32)
    clip = TextEncoder(
        "clipL", max_length=24,
        model_config=CLIPTextConfig(vocab_size=256, hidden_size=64,
                                    intermediate_size=128,
                                    num_hidden_layers=2,
                                    num_attention_heads=4,
                                    max_position_embeddings=77,
                                    eos_token_id=255),
        dtype=jnp.float32)
    vae_cfg = VAEConfig(block_out_channels=(32, 64, 64, 64),
                        layers_per_block=1)
    vae = AutoencoderKLCausal3D(
        vae_cfg, init_vae_params(jax.random.PRNGKey(1), vae_cfg))
    args = InferenceArgs(text_states_dim=128, text_states_dim_2=64,
                         vae_tiling=False)
    params = init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    return HunyuanVideoSampler(args, vae, llm, clip, params, dit_cfg)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "minimal_t2v.mp4"
    sampler = build_toy_sampler()
    outputs = sampler.predict(
        prompt="A cat walks on the grass, realistic style.",
        height=64, width=64, video_length=9, seed=42, infer_steps=8,
        guidance_scale=3.0, flow_shift=7.0)
    save_videos_grid(outputs["samples"], out_path, fps=8)
    print(f"wrote {out_path} (shape {outputs['samples'].shape}, "
          f"{outputs['gen_time']:.1f}s)")


if __name__ == "__main__":
    main()

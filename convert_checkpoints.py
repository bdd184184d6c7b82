"""One-shot checkpoint migration: reference torch layout -> this framework.

Converts everything a reference user has under `ckpts/` (the layout
documented in the reference README) into JAX-native artifacts:

  ckpts/hunyuan-video-t2v-720p/transformers/*.pt  -> dit.npz (or fp8)
  ckpts/hunyuan-video-t2v-720p/vae/pytorch_model.pt -> vae.npz
  ckpts/text_encoder  (llava LM dir)              -> text_encoder.npz + tokenizer
  ckpts/text_encoder_2 (CLIP dir)                 -> text_encoder_2.npz + tokenizer

Usage:
  python convert_checkpoints.py --model-base ckpts --output-base ckpts_tpu \
      [--load-key module|ema] [--fp8|--int8] [--orbax]
"""
import argparse
import os
import shutil

from hunyuanvideo_efficiency_tpu.utils.logging import logger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-base", default="ckpts")
    p.add_argument("--output-base", default="ckpts_tpu")
    p.add_argument("--load-key", default="module", choices=["module", "ema"])
    p.add_argument("--fp8", action="store_true",
                   help="store DiT block weights as fp8(E4M3)")
    p.add_argument("--int8", action="store_true",
                   help="store DiT block weights as int8 (W8A8 MXU compute;"
                        " per-output-channel scales)")
    p.add_argument("--int4-modulation", action="store_true",
                   help="additionally int4-pack the adaLN modulation "
                        "weights (single-chip 720p memory tier)")
    p.add_argument("--fp8-map", default=None,
                   help="reference *_fp8_map.pt side-car (with an fp8 ckpt)")
    p.add_argument("--orbax", action="store_true",
                   help="write orbax checkpoints instead of .npz")
    a = p.parse_args()
    os.makedirs(a.output_base, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.inference import Inference
    from hunyuanvideo_efficiency_tpu.models.dit_config import load_dit_config
    from hunyuanvideo_efficiency_tpu.models.vae_config import load_vae_config
    from hunyuanvideo_efficiency_tpu.utils import checkpoint as ckpt

    def save(path, params):
        if a.orbax:
            from hunyuanvideo_efficiency_tpu.utils.orbax_io import (
                save_params_orbax)

            save_params_orbax(path, params)
        else:
            ckpt.save_params_npz(path + ".npz", params)
        logger.info(f"wrote {path}{'' if a.orbax else '.npz'}")

    # ---- DiT ----
    class _Args:
        dit_weight = None
        model_base = a.model_base
        load_key = a.load_key

    dit_path = Inference.resolve_dit_weight(_Args)
    if dit_path:
        cfg = load_dit_config("HYVideo-T/2-cfgdistill")
        if a.fp8_map:
            params = ckpt.load_fp8_dit_checkpoint(str(dit_path), a.fp8_map,
                                                  cfg, a.load_key)
        else:
            sd = ckpt.load_torch_state_dict(str(dit_path), a.load_key)
            params = ckpt.convert_dit_state_dict(sd, cfg)
            if a.fp8 or a.int8:
                from hunyuanvideo_efficiency_tpu.ops.quantization import (
                    quantize_dit_params_fp8, quantize_dit_params_int8)

                params = jax.tree.map(
                    lambda x: jnp.asarray(x, jnp.bfloat16), params)
                params = (quantize_dit_params_int8(params) if a.int8
                          else quantize_dit_params_fp8(params))
            if a.int4_modulation:
                from hunyuanvideo_efficiency_tpu.ops.quantization import (
                    quantize_dit_params_int4_modulation)

                params = quantize_dit_params_int4_modulation(params)
        save(os.path.join(a.output_base, "dit"), params)
    else:
        logger.warning(f"no DiT checkpoint under {a.model_base} — skipped")

    # ---- VAE ----
    vae_pt = os.path.join(a.model_base,
                          "hunyuan-video-t2v-720p/vae/pytorch_model.pt")
    if os.path.exists(vae_pt):
        vcfg = load_vae_config("884-16c-hy")
        vsd = ckpt.load_torch_state_dict(vae_pt)
        save(os.path.join(a.output_base, "vae"),
             ckpt.convert_vae_state_dict(vsd, vcfg))
    else:
        logger.warning(f"no VAE checkpoint at {vae_pt} — skipped")

    # ---- text encoders ----
    llm_dir = os.path.join(a.model_base, "text_encoder")
    if os.path.isdir(llm_dir):
        from hunyuanvideo_efficiency_tpu.utils.preprocess_text_encoder import (
            preprocess_text_encoder_tokenizer)

        try:
            preprocess_text_encoder_tokenizer(
                llm_dir, os.path.join(a.output_base, "text_encoder"))
            logger.info("converted llava language tower + tokenizer")
        except Exception as e:
            logger.warning(f"LLM conversion failed ({e}); if the dir already "
                           f"holds a bare LM, copy + convert manually")
    clip_dir = os.path.join(a.model_base, "text_encoder_2")
    if os.path.isdir(clip_dir):
        try:
            import torch

            from hunyuanvideo_efficiency_tpu.models.text import (
                CLIP_L, convert_clip_state_dict)
            from transformers import CLIPTextModel

            model = CLIPTextModel.from_pretrained(clip_dir)
            sd = {k: v.numpy() for k, v in model.state_dict().items()}
            params = convert_clip_state_dict(sd, CLIP_L)
            out = os.path.join(a.output_base, "text_encoder_2")
            os.makedirs(out, exist_ok=True)
            ckpt.save_params_npz(os.path.join(out, "text_encoder_2.npz"),
                                 params)
            for f in os.listdir(clip_dir):
                if "tokenizer" in f or f.endswith((".json", ".txt")):
                    shutil.copy(os.path.join(clip_dir, f), out)
            logger.info("converted CLIP text tower + tokenizer files")
        except Exception as e:
            logger.warning(f"CLIP conversion failed: {e}")
    logger.info("done")


if __name__ == "__main__":
    main()

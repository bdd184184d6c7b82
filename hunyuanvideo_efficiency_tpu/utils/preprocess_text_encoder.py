"""Extract the language model + tokenizer from llava-llama-3-8B and convert
to this framework's format.

TPU-native analog of the reference's preprocessing tool
(reference: hyvideo/utils/preprocess_text_encoder_tokenizer_utils.py:1-46,
which loads `LlavaForConditionalGeneration`, saves `model.language_model`
and the tokenizer): here the language tower is additionally converted to a
JAX param tree and persisted as `text_encoder.npz` next to the HF tokenizer
files, which `Inference.from_pretrained` picks up automatically.
"""
from __future__ import annotations

import argparse
import os


def preprocess_text_encoder_tokenizer(input_dir: str, output_dir: str,
                                      save_npz: bool = True) -> None:
    import torch
    from transformers import AutoProcessor, LlavaForConditionalGeneration

    processor = AutoProcessor.from_pretrained(input_dir)
    model = LlavaForConditionalGeneration.from_pretrained(
        input_dir, torch_dtype=torch.float16, low_cpu_mem_usage=True)

    os.makedirs(output_dir, exist_ok=True)
    lm = model.language_model
    processor.tokenizer.save_pretrained(output_dir)

    if save_npz:
        from ..models.text.llama import LlamaConfig, convert_llama_state_dict
        from .checkpoint import save_params_npz

        hf_cfg = lm.config
        cfg = LlamaConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            intermediate_size=hf_cfg.intermediate_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            num_key_value_heads=hf_cfg.num_key_value_heads,
            rope_theta=float(hf_cfg.rope_theta),
            rms_norm_eps=float(hf_cfg.rms_norm_eps))
        sd = {k: v.float().numpy() for k, v in lm.state_dict().items()}
        params = convert_llama_state_dict(sd, cfg)
        save_params_npz(os.path.join(output_dir, "text_encoder.npz"), params)
    else:
        lm.save_pretrained(output_dir)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True,
                   help="HF llava-llama-3-8b directory")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--hf-only", action="store_true",
                   help="save the HF language model instead of the npz tree")
    a = p.parse_args()
    preprocess_text_encoder_tokenizer(a.input_dir, a.output_dir,
                                      save_npz=not a.hf_only)


if __name__ == "__main__":
    main()

"""Text conditioning: Llama-3 LLM + CLIP-L towers, TextEncoder wrapper
(reference: hyvideo/text_encoder/)."""
from .clip import (CLIP_L, CLIPTextConfig, clip_encode,
                   convert_clip_state_dict, init_clip_params)
from .encoder import (HashTokenizer, TextEncoder, TextEncoderOutput,
                      build_text_encoders)
from .llama import (LLAMA3_8B, LlamaConfig, convert_llama_state_dict,
                    init_llama_params, init_llama_params_int8, llama_encode,
                    quantize_llama_params_int8)

__all__ = [
    "CLIP_L", "CLIPTextConfig", "clip_encode", "convert_clip_state_dict",
    "init_clip_params", "HashTokenizer", "TextEncoder", "TextEncoderOutput",
    "build_text_encoders", "LLAMA3_8B", "LlamaConfig",
    "convert_llama_state_dict", "init_llama_params",
    "init_llama_params_int8", "llama_encode", "quantize_llama_params_int8",
]

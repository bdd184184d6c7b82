"""TextEncoder wrapper: tokenization, prompt templates, crop_start, encode.

JAX re-implementation of the reference TextEncoder
(reference: hyvideo/text_encoder/__init__.py:102-357):

* "llm" type: Llama-3 tower (models/text/llama.py), per-token hidden states
  [B, 256, 4096] tapped at hidden_state_skip_layer=2;
* "clipL" type: CLIP-L tower (models/text/clip.py), pooled output [B, 768];
* instruction templates applied around the prompt, then `crop_start` hidden
  states removed so only prompt tokens remain (:320-332);
* `use_attention_mask` threads the padding mask into the forward.

Tokenizers: HF tokenizers are loaded from a local path when available
(`transformers.AutoTokenizer` / `CLIPTokenizer`); a deterministic
`HashTokenizer` stands in for tests/benchmarks where no tokenizer files
exist (zero-egress environments).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import PROMPT_TEMPLATE
from .clip import CLIP_L, CLIPTextConfig, clip_encode, init_clip_params
from .llama import LLAMA3_8B, LlamaConfig, init_llama_params, llama_encode


@dataclass
class TextEncoderOutput:
    """(reference: TextEncoderModelOutput, text_encoder/__init__.py:78-99)."""
    hidden_state: jnp.ndarray
    attention_mask: Optional[jnp.ndarray] = None


class HashTokenizer:
    """Deterministic stand-in tokenizer (whitespace + stable hash).

    Used when no HF tokenizer files are present; preserves the reference's
    contract: fixed max_length, right padding, attention mask.
    """

    def __init__(self, vocab_size: int, eos_token_id: Optional[int] = None,
                 bos_token_id: int = 1):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id or (vocab_size - 1)
        self.bos_token_id = bos_token_id

    def __call__(self, text, max_length: int = 256, **kw):
        texts = [text] if isinstance(text, str) else list(text)
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [self.bos_token_id]
            for w in t.split():
                toks.append(2 + (hash(w) % (self.vocab_size - 3)))
            toks = toks[: max_length - 1] + [self.eos_token_id]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def load_hf_tokenizer(tokenizer_type: str, path: str):
    """(reference: load_tokenizer, text_encoder/__init__.py:58-75)."""
    if tokenizer_type == "clipL":
        from transformers import CLIPTokenizer

        return CLIPTokenizer.from_pretrained(path, max_length=77)
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path, padding_side="right")


class TextEncoder:
    def __init__(
        self,
        text_encoder_type: str,           # "llm" | "clipL"
        max_length: int,
        params: Dict[str, Any] = None,
        model_config: Union[LlamaConfig, CLIPTextConfig, None] = None,
        tokenizer=None,
        tokenizer_path: Optional[str] = None,
        prompt_template: Optional[dict] = None,
        prompt_template_video: Optional[dict] = None,
        hidden_state_skip_layer: Optional[int] = None,
        apply_final_norm: bool = False,
        use_attention_mask: bool = True,
        dtype=jnp.bfloat16,
        init_key: Optional[jax.Array] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        quant: Optional[str] = None,
    ):
        if text_encoder_type not in ("llm", "clipL"):
            raise ValueError(
                f"Unsupported text encoder type: {text_encoder_type}")
        self.text_encoder_type = text_encoder_type
        self.max_length = max_length
        self.use_attention_mask = use_attention_mask
        self.prompt_template = prompt_template
        self.prompt_template_video = prompt_template_video
        self.hidden_state_skip_layer = hidden_state_skip_layer
        self.apply_final_norm = apply_final_norm
        self.dtype = dtype

        self.use_template = prompt_template is not None
        self.use_video_template = prompt_template_video is not None
        for tpl, nm in ((prompt_template, "prompt_template"),
                        (prompt_template_video, "prompt_template_video")):
            if tpl is not None:
                if not (isinstance(tpl, dict) and "template" in tpl):
                    raise ValueError(
                        f"`{nm}` must be a dict with key 'template'")
                if "{}" not in str(tpl["template"]):
                    raise ValueError(f"`{nm}['template']` must contain {{}}")

        if model_config is None:
            model_config = LLAMA3_8B if text_encoder_type == "llm" else CLIP_L
        self.config = model_config
        # int8 storage tier for the LLM tower (single-chip fit; see
        # llama.quantize_llama_params_int8). CLIP-L is 123M — never worth it.
        if quant not in (None, "int8"):
            raise ValueError(f"text encoder quant must be int8|None: {quant}")
        self.quant = quant if text_encoder_type == "llm" else None
        if params is None:
            if init_key is None:
                init_key = jax.random.PRNGKey(0)
            if self.quant == "int8":
                from .llama import init_llama_params_int8

                params = init_llama_params_int8(init_key, model_config)
            else:
                params = (init_llama_params if text_encoder_type == "llm"
                          else init_clip_params)(init_key, model_config,
                                                 dtype)
        elif self.quant == "int8":
            from .llama import quantize_llama_params_int8

            params = quantize_llama_params_int8(params)
        # Tensor-parallel placement of the LLM tower over the mesh (the 8B
        # tower alone is ~16 GB bf16 — larger than one v5e). CLIP-L (123M)
        # stays replicated. See llama.shard_llama_params.
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is not None and text_encoder_type == "llm":
            from .llama import shard_llama_params

            params = shard_llama_params(params, self.mesh)
        self.params = params

        if tokenizer is None and tokenizer_path is not None:
            tokenizer = load_hf_tokenizer(text_encoder_type, tokenizer_path)
        if tokenizer is None:
            eos = (model_config.eos_token_id
                   if isinstance(model_config, CLIPTextConfig) else None)
            tokenizer = HashTokenizer(model_config.vocab_size,
                                      eos_token_id=eos)
        self.tokenizer = tokenizer

        if text_encoder_type == "llm":
            self._encode_fn = jax.jit(partial(
                llama_encode, cfg=model_config,
                hidden_state_skip_layer=hidden_state_skip_layer or 0,
                apply_final_norm=apply_final_norm, dtype=dtype))
        else:
            self._encode_fn = jax.jit(partial(
                clip_encode, cfg=model_config, dtype=dtype))

    # -- tokenization (reference: text2tokens, :217-269) --
    @staticmethod
    def apply_text_to_template(text: str, template: str) -> str:
        if not isinstance(template, str):
            raise TypeError(f"Unsupported template type: {type(template)}")
        return template.format(text)

    def text2tokens(self, text, data_type: str = "image"):
        if self.use_template:
            tpl = (self.prompt_template if data_type == "image"
                   else self.prompt_template_video)
            if tpl is None:
                raise ValueError(f"Unsupported data type: {data_type}")
            template = tpl["template"]
            if isinstance(text, (list, tuple)):
                text = [self.apply_text_to_template(t, template)
                        for t in text]
            else:
                text = self.apply_text_to_template(text, template)
        enc = self.tokenizer(
            text, truncation=True, max_length=self.max_length,
            padding="max_length", return_attention_mask=True,
            return_tensors="np") if not isinstance(
                self.tokenizer, HashTokenizer) else self.tokenizer(
                    text, max_length=self.max_length)
        return {"input_ids": np.asarray(enc["input_ids"], np.int32),
                "attention_mask": np.asarray(enc["attention_mask"], np.int32)}

    # -- encoding (reference: encode, :271-338) --
    def encode(self, batch_encoding, data_type: str = "image",
               use_attention_mask: Optional[bool] = None) -> TextEncoderOutput:
        use_mask = (self.use_attention_mask if use_attention_mask is None
                    else use_attention_mask)
        ids = jnp.asarray(batch_encoding["input_ids"])
        mask = jnp.asarray(batch_encoding["attention_mask"])
        fwd_mask = mask if use_mask else None

        if self.text_encoder_type == "llm":
            hidden = self._encode_fn(self.params, ids, fwd_mask)
        else:
            _, pooled = self._encode_fn(self.params, ids, fwd_mask)
            return TextEncoderOutput(pooled, None)

        # crop instruction tokens (reference :320-332)
        if self.use_template:
            tpl = (self.prompt_template if data_type == "image"
                   else self.prompt_template_video)
            crop_start = tpl.get("crop_start", -1) if tpl else -1
            if crop_start > 0:
                hidden = hidden[:, crop_start:]
                mask = mask[:, crop_start:]
        return TextEncoderOutput(hidden, mask if use_mask else None)

    def forward(self, text, data_type: str = "image"):
        return self.encode(self.text2tokens(text, data_type), data_type)

    __call__ = forward

    # -- memory tier: host offload (reference analog: sequential cpu
    #    offload, hyvideo/inference.py:443-446 — encoders are only needed
    #    before the denoise loop; freeing their HBM lets the DiT breathe) --
    def offload(self) -> None:
        import numpy as np

        self.params = jax.tree.map(np.asarray, self.params)

    def free(self) -> None:
        """Delete the device weights outright (no host copy) — the one-shot
        phase-sequencing tier: on remote-tunnel runtimes the 8 GB
        device->host copy of offload() costs minutes, the delete is
        instant. The encoder cannot encode again afterwards (same
        semantics as the pipeline's offload_transformer='free')."""
        if self.params is not None:
            jax.tree.map(
                lambda a: a.delete() if hasattr(a, "delete") else None,
                self.params)
        self.params = None

    def load(self, device=None) -> None:
        if (device is None and self.mesh is not None
                and self.text_encoder_type == "llm"):
            from .llama import shard_llama_params

            self.params = shard_llama_params(self.params, self.mesh)
        else:
            self.params = jax.device_put(self.params, device)

    # -- pipeline-facing API --
    def encode_prompt(self, prompt, data_type: str = "video",
                      num_videos: int = 1
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Returns (embeds, mask) repeated per video
        (reference: pipeline encode_prompt, pipeline_hunyuan_video.py:238-449)."""
        out = self.forward(prompt, data_type)
        pe = jnp.repeat(out.hidden_state, num_videos, axis=0)
        mask = (jnp.repeat(out.attention_mask, num_videos, axis=0)
                if out.attention_mask is not None else None)
        return pe, mask


def build_text_encoders(
    *,
    llm_params=None, clip_params=None,
    llm_config: Optional[LlamaConfig] = None,
    clip_config: Optional[CLIPTextConfig] = None,
    tokenizer_path: Optional[str] = None,
    tokenizer_path_2: Optional[str] = None,
    text_len: int = 256, text_len_2: int = 77,
    prompt_template: str = "dit-llm-encode",
    prompt_template_video: str = "dit-llm-encode-video",
    hidden_state_skip_layer: int = 2,
    apply_final_norm: bool = False,
    dtype=jnp.bfloat16,
    mesh: Optional[jax.sharding.Mesh] = None,
    llm_quant: Optional[str] = None,
) -> Tuple[TextEncoder, TextEncoder]:
    """Builds the (llm, clipL) pair the way Inference.from_pretrained does
    (reference: hyvideo/inference.py:210-264): the LLM max_length includes
    the video-template crop_start."""
    tpl = PROMPT_TEMPLATE.get(prompt_template)
    tpl_video = PROMPT_TEMPLATE.get(prompt_template_video)
    crop = max(tpl_video.get("crop_start", 0) if tpl_video else 0,
               tpl.get("crop_start", 0) if tpl else 0)
    llm = TextEncoder(
        "llm", text_len + crop, params=llm_params, model_config=llm_config,
        tokenizer_path=tokenizer_path, prompt_template=tpl,
        prompt_template_video=tpl_video,
        hidden_state_skip_layer=hidden_state_skip_layer,
        apply_final_norm=apply_final_norm, dtype=dtype, mesh=mesh,
        quant=llm_quant)
    clip = TextEncoder(
        "clipL", text_len_2, params=clip_params, model_config=clip_config,
        tokenizer_path=tokenizer_path_2, dtype=dtype)
    return llm, clip

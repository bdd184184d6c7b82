"""CLIP-L/14 text tower (pooled output) in JAX.

TPU-native replacement for the reference's HF `CLIPTextModel` "clipL"
encoder (reference: hyvideo/text_encoder/__init__.py:32-34, output_key
`pooler_output` :171-178): 12 pre-LN transformer layers, hidden 768,
quick-GELU MLP, causal attention, final LayerNorm, pooled output = final
hidden state at the EOS-token position.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import layer_norm

Params = Dict[str, Any]


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


CLIP_L = CLIPTextConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _lin(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _attn(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
          cfg: CLIPTextConfig) -> jnp.ndarray:
    b, l, _ = x.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    q = _lin(p["q_proj"], x).reshape(b, l, h, d)
    k = _lin(p["k_proj"], x).reshape(b, l, h, d)
    v = _lin(p["v_proj"], x).reshape(b, l, h, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk",
                        q.astype(jnp.float32) * (d ** -0.5),
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(scores + bias, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return _lin(p["out_proj"], out.reshape(b, l, h * d))


def _layer(p: Params, x: jnp.ndarray, bias, cfg: CLIPTextConfig):
    h = layer_norm(x, p["layer_norm1"]["scale"], p["layer_norm1"]["bias"],
                   eps=cfg.layer_norm_eps)
    x = x + _attn(p["self_attn"], h, bias, cfg)
    h = layer_norm(x, p["layer_norm2"]["scale"], p["layer_norm2"]["bias"],
                   eps=cfg.layer_norm_eps)
    x = x + _lin(p["mlp"]["fc2"], quick_gelu(_lin(p["mlp"]["fc1"], h)))
    return x


def clip_encode(
    params: Params,
    input_ids: jnp.ndarray,                  # [B, L] int32
    attention_mask: Optional[jnp.ndarray],   # [B, L]
    cfg: CLIPTextConfig,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (last_hidden_state [B, L, H], pooler_output [B, H])."""
    b, l = input_ids.shape
    x = params["token_embedding"]["embedding"][input_ids].astype(dtype)
    x = x + params["position_embedding"]["embedding"][:l].astype(dtype)

    causal = jnp.tril(jnp.ones((l, l), jnp.bool_))
    if attention_mask is not None:
        keep = causal[None, None] & attention_mask.astype(
            jnp.bool_)[:, None, None, :]
    else:
        keep = causal[None, None]
    bias = jnp.where(keep, 0.0, -1e30).astype(jnp.float32)

    def body(h, lp):
        return _layer(lp, h, bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["final_layer_norm"]["scale"],
                   params["final_layer_norm"]["bias"],
                   eps=cfg.layer_norm_eps)

    # pooled = hidden at first EOS position (HF CLIPTextModel semantics)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                         axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def init_clip_params(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    h, m = cfg.hidden_size, cfg.intermediate_size
    ks = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * 8))

    def lin(k, cin, cout):
        return {"kernel": jax.random.normal(k, (cin, cout), dtype)
                / np.sqrt(cin), "bias": jnp.zeros((cout,), dtype)}

    def ln():
        return {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "layer_norm1": ln(),
            "self_attn": {"q_proj": lin(next(ks), h, h),
                          "k_proj": lin(next(ks), h, h),
                          "v_proj": lin(next(ks), h, h),
                          "out_proj": lin(next(ks), h, h)},
            "layer_norm2": ln(),
            "mlp": {"fc1": lin(next(ks), h, m), "fc2": lin(next(ks), m, h)},
        })
    return {
        "token_embedding": {"embedding": 0.02 * jax.random.normal(
            next(ks), (cfg.vocab_size, h), dtype)},
        "position_embedding": {"embedding": 0.01 * jax.random.normal(
            next(ks), (cfg.max_position_embeddings, h), dtype)},
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_layer_norm": ln(),
    }


def convert_clip_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPTextConfig
                            ) -> Params:
    """HF CLIPTextModel state dict -> param tree (`text_model.` prefix)."""
    if any(k.startswith("text_model.") for k in sd):
        sd = {k[len("text_model."):]: v for k, v in sd.items()
              if k.startswith("text_model.")}
    sd = dict(sd)

    def lin(name):
        p = {"kernel": np.ascontiguousarray(sd.pop(f"{name}.weight").T)}
        if f"{name}.bias" in sd:
            p["bias"] = sd.pop(f"{name}.bias")
        return p

    def ln(name):
        return {"scale": sd.pop(f"{name}.weight"),
                "bias": sd.pop(f"{name}.bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        layers.append({
            "layer_norm1": ln(f"{b}.layer_norm1"),
            "self_attn": {"q_proj": lin(f"{b}.self_attn.q_proj"),
                          "k_proj": lin(f"{b}.self_attn.k_proj"),
                          "v_proj": lin(f"{b}.self_attn.v_proj"),
                          "out_proj": lin(f"{b}.self_attn.out_proj")},
            "layer_norm2": ln(f"{b}.layer_norm2"),
            "mlp": {"fc1": lin(f"{b}.mlp.fc1"), "fc2": lin(f"{b}.mlp.fc2")},
        })
    params = {
        "token_embedding": {
            "embedding": sd.pop("embeddings.token_embedding.weight")},
        "position_embedding": {
            "embedding": sd.pop("embeddings.position_embedding.weight")},
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final_layer_norm": ln("final_layer_norm"),
    }
    # legacy transformers checkpoints carry a position_ids buffer; anything
    # else left over is a real weight we failed to convert.
    leftover = [k for k in sd if not k.endswith("position_ids")]
    if leftover:
        raise ValueError(f"Unconverted CLIP keys: {sorted(leftover)[:20]}")
    return params

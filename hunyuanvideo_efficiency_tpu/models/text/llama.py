"""Llama-3 decoder as a text encoder (llava-llama-3-8B language tower).

TPU-native replacement for the reference's HF `AutoModel` LLM text encoder
(reference: hyvideo/text_encoder/__init__.py:32-41, 300-316). The DiT
consumes `hidden_states[-(skip+1)]` with skip=2 — i.e. the output of layer
`num_layers - skip` counted WITHOUT the final RMSNorm (HF collects the
pre-layer hidden state of every layer plus one post-norm entry). We therefore
simply run `num_layers - skip` layers and stop — the remaining layers are
never computed (the reference wastes two full layers' FLOPs to then discard
them).

Architecture (Llama-3-8B): RMSNorm pre-norm, GQA (32 q / 8 kv heads,
head_dim 128), non-interleaved RoPE (rotate-half over split halves,
theta 500000), SwiGLU MLP. Layers run under one `lax.scan` over stacked
parameters (constant compile time in depth).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import rms_norm

Params = Dict[str, Any]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


LLAMA3_8B = LlamaConfig()


def _rope_tables(cfg: LlamaConfig, seq_len: int):
    """HF-style cos/sin [L, head_dim]: angles duplicated by concatenation
    (NOT interleaved — differs from the DiT's video RoPE)."""
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta
                 ** (np.arange(0, d, 2, dtype=np.float32) / d))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv)  # [L, d/2]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(q, k, cos, sin):
    # q/k: [B, L, H, D]; cos/sin: [L, D]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


def _lin(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear dispatch over storage tiers (mirrors models/dit.linear):

    * bf16/fp32 {'kernel'} — plain matmul;
    * int8 {'kernel' s8, 'scale_out' [.., 1, out]} — W8A8: per-token
      activation quant + s8xs8->s32 MXU dot + dequant. At text lengths
      (≤351 tokens) every projection is HBM-bandwidth-bound on the weight
      read, so int8 storage halves the layer time on top of halving the
      tower's footprint (8B bf16 ≈ 16 GB > one v5e's 15.75 GB; int8 ≈ 8 GB
      fits single-chip — the tier the reference lacks, it runs the LLM
      replicated in fp16 on 80 GB GPUs, hyvideo/inference.py:241-264);
    * fp8 {'kernel' e4m3, 'scale'} — storage-only: dequant fuses into the
      matmul operand load.
    """
    w = p["kernel"]
    if w.dtype == jnp.int8:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sx * p["scale_out"][..., 0, :]
        return y.astype(x.dtype)
    if "scale" in p:  # fp8 per-tensor storage
        w = (w.astype(jnp.float32) * p["scale"]).astype(x.dtype)
    else:
        w = w.astype(x.dtype)
    return x @ w


def _attn(p: Params, x: jnp.ndarray, bias: jnp.ndarray, cos, sin,
          cfg: LlamaConfig) -> jnp.ndarray:
    b, l, _ = x.shape
    hq, hkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    q = _lin(p["q_proj"], x).reshape(b, l, hq, d)
    k = _lin(p["k_proj"], x).reshape(b, l, hkv, d)
    v = _lin(p["v_proj"], x).reshape(b, l, hkv, d)
    qf, kf = _apply_rope(q.astype(jnp.float32), k.astype(jnp.float32),
                         cos, sin)
    rep = hq // hkv
    kf = jnp.repeat(kf, rep, axis=2)
    vf = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf * (d ** -0.5), kf)
    scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vf.dtype),
                     vf.astype(x.dtype))
    out = out.reshape(b, l, hq * d)
    return _lin(p["o_proj"], out)


def _mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    g = _lin(p["gate_proj"], x)
    u = _lin(p["up_proj"], x)
    return _lin(p["down_proj"], jax.nn.silu(g) * u)


def _layer(p: Params, x: jnp.ndarray, bias, cos, sin, cfg: LlamaConfig):
    h = rms_norm(x, p["input_layernorm"]["scale"], eps=cfg.rms_norm_eps)
    x = x + _attn(p["self_attn"], h, bias, cos, sin, cfg)
    h = rms_norm(x, p["post_attention_layernorm"]["scale"],
                 eps=cfg.rms_norm_eps)
    return x + _mlp(p["mlp"], h)


def llama_encode(
    params: Params,
    input_ids: jnp.ndarray,      # [B, L] int32
    attention_mask: Optional[jnp.ndarray],  # [B, L] 1=valid
    cfg: LlamaConfig,
    hidden_state_skip_layer: int = 2,
    apply_final_norm: bool = False,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns hidden states [B, L, hidden] at layer
    num_hidden_layers - skip (the reference's hidden_states[-(skip+1)],
    text_encoder/__init__.py:311-316)."""
    b, l = input_ids.shape
    x = params["embed_tokens"]["embedding"][input_ids].astype(dtype)

    causal = jnp.tril(jnp.ones((l, l), jnp.bool_))
    if attention_mask is not None:
        valid = attention_mask.astype(jnp.bool_)[:, None, None, :]
        keep = causal[None, None] & valid
    else:
        keep = causal[None, None]
    bias = jnp.where(keep, 0.0, -1e30).astype(jnp.float32)

    cos, sin = _rope_tables(cfg, l)

    n_run = cfg.num_hidden_layers - max(hidden_state_skip_layer, 0)
    layers = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(h, lp):
        return _layer(lp, h, bias, cos, sin, cfg), None

    x, _ = jax.lax.scan(body, x, layers)
    if hidden_state_skip_layer == 0 or apply_final_norm:
        x = rms_norm(x, params["norm"]["scale"], eps=cfg.rms_norm_eps)
    return x


def _init_layer(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random params for ONE decoder layer."""
    h, m = cfg.hidden_size, cfg.intermediate_size
    d, hq, hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    ks = iter(jax.random.split(key, 7))

    def lin(k, cin, cout):
        return {"kernel": jax.random.normal(k, (cin, cout), dtype)
                / np.sqrt(cin)}

    return {
        "input_layernorm": {"scale": jnp.ones((h,), dtype)},
        "self_attn": {
            "q_proj": lin(next(ks), h, hq * d),
            "k_proj": lin(next(ks), h, hkv * d),
            "v_proj": lin(next(ks), h, hkv * d),
            "o_proj": lin(next(ks), hq * d, h)},
        "post_attention_layernorm": {"scale": jnp.ones((h,), dtype)},
        "mlp": {"gate_proj": lin(next(ks), h, m),
                "up_proj": lin(next(ks), h, m),
                "down_proj": lin(next(ks), m, h)},
    }


def init_llama_params(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random params (tests / benchmarks)."""
    h = cfg.hidden_size
    kl, ke = jax.random.split(key)
    layers = [_init_layer(k, cfg, dtype)
              for k in jax.random.split(kl, cfg.num_hidden_layers)]
    return {
        "embed_tokens": {"embedding": 0.02 * jax.random.normal(
            ke, (cfg.vocab_size, h), dtype)},
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": {"scale": jnp.ones((h,), dtype)},
    }


def quantize_llama_params_int8(params: Params) -> Params:
    """int8 (per-output-channel) storage for every layer linear.

    The single-chip memory tier for the 8B tower: bf16 weights are ~16 GB —
    larger than one v5e's 15.75 GB HBM — while int8 layers + bf16 embedding
    land at ~8 GB, leaving room to encode before the DiT phase begins
    (phase-sequenced: text -> DiT -> VAE). Embedding and RMSNorm scales stay
    high-precision, mirroring the DiT quantizers (ops/quantization.py).
    Works on host (numpy) trees — the checkpoint-load path quantizes BEFORE
    device placement so the bf16 tree never has to fit in HBM — and on jax
    trees (tests). The reference has no analog: it runs the LLM replicated
    in fp16 on 80 GB GPUs (hyvideo/inference.py:241-264).
    """
    from ...ops.quantization import quantize_tensor_int8

    def conv(p):
        if isinstance(p, dict):
            if "kernel" in p:
                w = p["kernel"]
                if isinstance(w, np.ndarray):
                    wf = w.astype(np.float32)
                    amax = np.max(np.abs(wf), axis=-2, keepdims=True)
                    scale = np.maximum(amax, 1e-12) / 127.0
                    q = np.clip(np.round(wf / scale), -127, 127
                                ).astype(np.int8)
                    return {"kernel": q,
                            "scale_out": scale.astype(np.float32)}
                return quantize_tensor_int8(w)
            return {k: conv(v) for k, v in p.items()}
        return p

    out = dict(params)
    out["layers"] = conv(params["layers"])
    return out


def init_llama_params_int8(key, cfg: LlamaConfig) -> Params:
    """Random int8-tier params built layer-by-layer ON DEVICE.

    A full-precision 8B tree never exists: each layer is initialized and
    quantized inside one jitted call (peak transient = one f32 layer,
    ~0.9 GB) and inserted into the preallocated stacked int8 tree with
    buffer donation (same pattern as bench.build_fp8_params)."""
    from functools import partial

    from ...ops.quantization import quantize_tensor_int8

    kl, ke = jax.random.split(key)

    @jax.jit
    def one_layer(k):
        p = _init_layer(k, cfg, jnp.float32)

        def conv(q):
            if isinstance(q, dict):
                if "kernel" in q:
                    return quantize_tensor_int8(q["kernel"])
                return {k2: conv(v) for k2, v in q.items()}
            return q

        out = conv(p)
        # norms stored bf16 (they are not linears)
        for nk in ("input_layernorm", "post_attention_layernorm"):
            out[nk] = {"scale": p[nk]["scale"].astype(jnp.bfloat16)}
        return out

    @partial(jax.jit, donate_argnums=0)
    def insert(stacked, i, layer):
        return jax.tree.map(
            lambda s, b: jax.lax.dynamic_update_index_in_dim(
                s, b.astype(s.dtype), i, 0), stacked, layer)

    proto = jax.eval_shape(one_layer, kl)
    stacked = jax.tree.map(
        lambda a: jnp.zeros((cfg.num_hidden_layers,) + a.shape, a.dtype),
        proto)
    for i, k in enumerate(jax.random.split(kl, cfg.num_hidden_layers)):
        stacked = insert(stacked, i, one_layer(k))

    h = cfg.hidden_size
    return {
        "embed_tokens": {"embedding": (0.02 * jax.random.normal(
            ke, (cfg.vocab_size, h), jnp.float32)).astype(jnp.bfloat16)},
        "layers": stacked,
        "norm": {"scale": jnp.ones((h,), jnp.bfloat16)},
    }


def shard_llama_params(params: Params, mesh: jax.sharding.Mesh) -> Params:
    """Megatron-style tensor-parallel placement over ALL mesh axes combined.

    Pure param placement — the model code is untouched; XLA's SPMD
    partitioner propagates the shardings through `llama_encode` and inserts
    the all-reduces after the row-parallel matmuls (o_proj, down_proj).
    Layout (stacked layer kernels are [n_layers, cin, cout]):

      q/k/v/gate/up : column-parallel  -> shard cout
      o/down        : row-parallel     -> shard cin
      embeddings / norm scales : replicated

    Llama-3-8B over 8 chips: ~0.9B layer params/chip + the 0.5B embedding
    replicated — the tower that cannot fit next to the DiT on one 16 GB v5e
    drops to ~2.9 GB/chip in bf16. The reference instead runs the full LLM
    replicated on every rank (hyvideo/inference.py, text encoders
    replicated). Falls back to replication for any tensor whose dim is not
    divisible by the device count.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    n = mesh.devices.size
    col = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    row = {"o_proj", "down_proj"}

    def place(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        spec = P()
        if leaf.ndim == 3 and names and names[-1] == "kernel":
            proj = names[-2]
            if proj in col and leaf.shape[2] % n == 0:
                spec = P(None, None, axes)
            elif proj in row and leaf.shape[1] % n == 0:
                spec = P(None, axes, None)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def convert_llama_state_dict(sd: Dict[str, np.ndarray], cfg: LlamaConfig
                             ) -> Params:
    """HF LlamaModel state dict (`model.` prefix optional) -> param tree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    sd = dict(sd)

    def lin(name):
        return {"kernel": np.ascontiguousarray(sd.pop(f"{name}.weight").T)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"layers.{i}"
        layers.append({
            "input_layernorm": {
                "scale": sd.pop(f"{b}.input_layernorm.weight")},
            "self_attn": {
                "q_proj": lin(f"{b}.self_attn.q_proj"),
                "k_proj": lin(f"{b}.self_attn.k_proj"),
                "v_proj": lin(f"{b}.self_attn.v_proj"),
                "o_proj": lin(f"{b}.self_attn.o_proj")},
            "post_attention_layernorm": {
                "scale": sd.pop(f"{b}.post_attention_layernorm.weight")},
            "mlp": {"gate_proj": lin(f"{b}.mlp.gate_proj"),
                    "up_proj": lin(f"{b}.mlp.up_proj"),
                    "down_proj": lin(f"{b}.mlp.down_proj")},
        })
    params = {
        "embed_tokens": {"embedding": sd.pop("embed_tokens.weight")},
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "norm": {"scale": sd.pop("norm.weight")},
    }
    # lm_head (tied or not) and rotary inv_freq buffers are not part of the
    # encoding tower; anything else left over is an unconverted weight.
    leftover = [k for k in sd
                if not (k.endswith("inv_freq") or k.startswith("lm_head."))]
    if leftover:
        raise ValueError(f"Unconverted Llama keys: {sorted(leftover)[:20]}")
    return params

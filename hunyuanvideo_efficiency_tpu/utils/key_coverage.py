"""Full-scale checkpoint key-coverage gate (SURVEY.md §7 stage 1).

Generates the COMPLETE state-dict namespace (key -> shape) of every torch
checkpoint the reference pipeline loads — the 13B DiT, the causal-3D VAE
("884-16ch"), CLIP-L, and the llava-llama-3-8B language tower — and runs
the real converters over zero-memory shape-only arrays, proving:

  * every reference checkpoint key is CONSUMED by the converter
    (no silently-dropped weights), and
  * the converted tree produces EVERY param leaf of the JAX model with the
    exact shape `init_*_params` would build (no missing / extra leaves).

No weights are needed: skeleton entries are `np.broadcast_to` views of a
zero scalar (0 bytes of data), and conversion runs under a scoped
shape-only mode where the two materializing ops the converters use
(`np.ascontiguousarray`, `np.stack`) preserve shapes without copying —
a 13B coverage check runs in milliseconds.

Reference namespaces reproduced here:
  DiT    — hyvideo/modules/models.py:448-581, token_refiner.py:16-236,
           embed_layers.py, mlp_layers.py (checkpoint loaded at
           hyvideo/inference.py:279-354)
  VAE    — hyvideo/vae/vae.py:32-294, unet_causal_3d_blocks.py:49-916
           (loaded at hyvideo/vae/__init__.py:94-102)
  CLIP-L — HF CLIPTextModel state dict (loaded via
           hyvideo/text_encoder/__init__.py load_text_encoder)
  Llama  — HF LlamaModel/LlamaForCausalLM state dict produced by the
           reference's preprocess tool
           (hyvideo/utils/preprocess_text_encoder_tokenizer_utils.py:1-46)
"""
from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import numpy as np

Shape = Tuple[int, ...]
Skeleton = Dict[str, np.ndarray]


def _z(*shape: int) -> np.ndarray:
    """Zero-memory full-shape array (broadcast view of a scalar)."""
    return np.broadcast_to(np.zeros((), np.float32), shape)


@contextlib.contextmanager
def shape_only_conversion():
    """Run checkpoint converters without materializing weight data.

    The converters copy in exactly two places: `np.ascontiguousarray`
    (layout transposes) and `np.stack` (block stacking). Within this scope
    both become shape-preserving zero-memory equivalents, so a conversion
    over `_z`-built skeletons never allocates. Scoped and reentrant-safe;
    library behavior outside the `with` is untouched.
    """
    orig_acont, orig_stack = np.ascontiguousarray, np.stack

    def fake_acont(a, *args, **kwargs):
        return _z(*np.shape(a))

    def fake_stack(arrays, axis=0, **kwargs):
        arrays = list(arrays)
        shape = list(np.shape(arrays[0]))
        shape.insert(axis if axis >= 0 else len(shape) + 1 + axis,
                     len(arrays))
        return _z(*shape)

    np.ascontiguousarray, np.stack = fake_acont, fake_stack
    try:
        yield
    finally:
        np.ascontiguousarray, np.stack = orig_acont, orig_stack


# --------------------------------------------------------------------------
# Reference state-dict skeletons (full scale, key -> shaped zero view)
# --------------------------------------------------------------------------

def dit_reference_skeleton(cfg) -> Skeleton:
    """HYVideoDiffusionTransformer.state_dict() namespace at full scale
    (reference: hyvideo/modules/models.py:448-581 module tree; parameter
    names follow torch's `<module path>.weight/.bias` convention)."""
    h, d, m = cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden_dim
    td, td2 = cfg.text_states_dim, cfg.text_states_dim_2
    pt, ph, pw = cfg.patch_size
    sd: Skeleton = {}

    def lin(name, cin, cout, bias=True):
        sd[f"{name}.weight"] = _z(cout, cin)
        if bias:
            sd[f"{name}.bias"] = _z(cout)

    def norm(name, c, bias=True):
        sd[f"{name}.weight"] = _z(c)
        if bias:
            sd[f"{name}.bias"] = _z(c)

    sd["img_in.proj.weight"] = _z(h, cfg.in_channels, pt, ph, pw)
    sd["img_in.proj.bias"] = _z(h)
    lin("time_in.mlp.0", 256, h)
    lin("time_in.mlp.2", h, h)
    lin("vector_in.in_layer", td2, h)
    lin("vector_in.out_layer", h, h)
    if cfg.guidance_embed:
        lin("guidance_in.mlp.0", 256, h)
        lin("guidance_in.mlp.2", h, h)
    if cfg.text_projection == "single_refiner":
        lin("txt_in.input_embedder", td, h)
        lin("txt_in.t_embedder.mlp.0", 256, h)
        lin("txt_in.t_embedder.mlp.2", h, h)
        lin("txt_in.c_embedder.linear_1", td, h)
        lin("txt_in.c_embedder.linear_2", h, h)
        for i in range(2):  # refiner depth 2 (token_refiner.py:212)
            b = f"txt_in.individual_token_refiner.blocks.{i}"
            norm(f"{b}.norm1", h)
            lin(f"{b}.self_attn_qkv", h, 3 * h)
            lin(f"{b}.self_attn_proj", h, h)
            norm(f"{b}.norm2", h)
            lin(f"{b}.mlp.fc1", h, 4 * h)
            lin(f"{b}.mlp.fc2", 4 * h, h)
            lin(f"{b}.adaLN_modulation.1", h, 2 * h)
    else:
        lin("txt_in.linear_1", td, h)
        lin("txt_in.linear_2", h, h)
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
    lin("final_layer.linear", h, pt * ph * pw * cfg.out_channels)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    return sd


def vae_reference_skeleton(cfg, with_prefix: bool = False) -> Skeleton:
    """AutoencoderKLCausal3D.state_dict() namespace at full scale
    (reference: hyvideo/vae/vae.py:32-294 module tree; CausalConv3d wraps
    a plain Conv3d as `.conv`, unet_causal_3d_blocks.py:49-116)."""
    sd: Skeleton = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = _z(cout, cin, k, k, k)
        sd[f"{name}.bias"] = _z(cout)

    def norm(name, c):
        sd[f"{name}.weight"] = _z(c)
        sd[f"{name}.bias"] = _z(c)

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = _z(cout, cin)
        sd[f"{name}.bias"] = _z(cout)

    def resnet(base, cin, cout):
        norm(f"{base}.norm1", cin)
        conv(f"{base}.conv1.conv", cin, cout)
        norm(f"{base}.norm2", cout)
        conv(f"{base}.conv2.conv", cout, cout)
        if cin != cout:
            conv(f"{base}.conv_shortcut.conv", cin, cout, k=1)

    def mid(base, c):
        resnet(f"{base}.resnets.0", c, c)
        resnet(f"{base}.resnets.1", c, c)
        if cfg.mid_block_add_attention:
            norm(f"{base}.attentions.0.group_norm", c)
            lin(f"{base}.attentions.0.to_q", c, c)
            lin(f"{base}.attentions.0.to_k", c, c)
            lin(f"{base}.attentions.0.to_v", c, c)
            lin(f"{base}.attentions.0.to_out.0", c, c)

    bo = cfg.block_out_channels
    conv("encoder.conv_in.conv", cfg.in_channels, bo[0])
    for i in range(cfg.num_blocks):
        cin, cout = cfg.encoder_block_channels(i)
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout)
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
    sd["quant_conv.weight"] = _z(2 * cfg.latent_channels,
                                 2 * cfg.latent_channels, 1, 1, 1)
    sd["quant_conv.bias"] = _z(2 * cfg.latent_channels)
    sd["post_quant_conv.weight"] = _z(cfg.latent_channels,
                                      cfg.latent_channels, 1, 1, 1)
    sd["post_quant_conv.bias"] = _z(cfg.latent_channels)
    if with_prefix:
        return {f"vae.{k}": v for k, v in sd.items()}
    return sd


def clip_reference_skeleton(cfg, include_buffers: bool = True) -> Skeleton:
    """HF CLIPTextModel.state_dict() namespace (text_model.* prefix), incl.
    the legacy `position_ids` buffer older transformers checkpoints carry."""
    h, m = cfg.hidden_size, cfg.intermediate_size
    sd: Skeleton = {}

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = _z(cout, cin)
        sd[f"{name}.bias"] = _z(cout)

    def ln(name):
        sd[f"{name}.weight"] = _z(h)
        sd[f"{name}.bias"] = _z(h)

    p = "text_model."
    sd[f"{p}embeddings.token_embedding.weight"] = _z(cfg.vocab_size, h)
    sd[f"{p}embeddings.position_embedding.weight"] = _z(
        cfg.max_position_embeddings, h)
    if include_buffers:
        sd[f"{p}embeddings.position_ids"] = _z(
            1, cfg.max_position_embeddings)
    for i in range(cfg.num_hidden_layers):
        b = f"{p}encoder.layers.{i}"
        ln(f"{b}.layer_norm1")
        lin(f"{b}.self_attn.q_proj", h, h)
        lin(f"{b}.self_attn.k_proj", h, h)
        lin(f"{b}.self_attn.v_proj", h, h)
        lin(f"{b}.self_attn.out_proj", h, h)
        ln(f"{b}.layer_norm2")
        lin(f"{b}.mlp.fc1", h, m)
        lin(f"{b}.mlp.fc2", m, h)
    ln(f"{p}final_layer_norm")
    return sd


def llama_reference_skeleton(cfg, causal_lm: bool = True) -> Skeleton:
    """State dict of the language tower the reference's preprocess tool
    extracts from llava-llama-3-8b (LlamaForCausalLM: `model.*` + lm_head;
    newer transformers exports a bare LlamaModel — set causal_lm=False)."""
    h, m = cfg.hidden_size, cfg.intermediate_size
    d, hq, hkv = cfg.head_dim, cfg.num_attention_heads, \
        cfg.num_key_value_heads
    p = "model." if causal_lm else ""
    sd: Skeleton = {f"{p}embed_tokens.weight": _z(cfg.vocab_size, h)}
    for i in range(cfg.num_hidden_layers):
        b = f"{p}layers.{i}"
        sd[f"{b}.input_layernorm.weight"] = _z(h)
        sd[f"{b}.self_attn.q_proj.weight"] = _z(hq * d, h)
        sd[f"{b}.self_attn.k_proj.weight"] = _z(hkv * d, h)
        sd[f"{b}.self_attn.v_proj.weight"] = _z(hkv * d, h)
        sd[f"{b}.self_attn.o_proj.weight"] = _z(h, hq * d)
        sd[f"{b}.post_attention_layernorm.weight"] = _z(h)
        sd[f"{b}.mlp.gate_proj.weight"] = _z(m, h)
        sd[f"{b}.mlp.up_proj.weight"] = _z(m, h)
        sd[f"{b}.mlp.down_proj.weight"] = _z(h, m)
    sd[f"{p}norm.weight"] = _z(h)
    if causal_lm:
        sd["lm_head.weight"] = _z(cfg.vocab_size, h)
    return sd


# --------------------------------------------------------------------------
# Coverage check
# --------------------------------------------------------------------------

def leaf_shapes(tree, prefix: str = "") -> Dict[str, Shape]:
    """Flatten a (possibly abstract) param tree to {path: shape}."""
    out: Dict[str, Shape] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(leaf_shapes(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(leaf_shapes(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tuple(np.shape(tree))
    return out


def check_coverage(converted, init_tree) -> None:
    """Assert converted-vs-init leaf paths AND shapes agree; raises
    AssertionError with the full diff otherwise."""
    got, want = leaf_shapes(converted), leaf_shapes(init_tree)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"param-leaf mismatch: missing={missing[:10]} extra={extra[:10]} "
        f"({len(missing)} missing / {len(extra)} extra)")
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"shape mismatches (got, want): {dict(list(bad.items())[:10])}"

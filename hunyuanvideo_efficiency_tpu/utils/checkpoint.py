"""Checkpoint conversion: reference PyTorch pickles -> JAX param trees.

Covers the reference's loading surface (SURVEY.md §5.4):
  * DiT: HunyuanDiT-style `pytorch_model_{module,ema}.pt` and deepspeed
    `*_model_states.pt` with `module`/`ema` keys + `--load-key` selection
    (reference: hyvideo/inference.py:279-354);
  * VAE: `pytorch_model.pt` with optional `state_dict`/`vae.` prefix
    stripping (reference: hyvideo/vae/__init__.py:94-102);
  * FP8 side-car: rather than loading `*_fp8_map.pt` scales, we re-derive
    per-tensor scales at conversion time (ops/quantization.py), which is
    exactly how the reference produced its map.

Layout conventions converted here:
  torch Linear  [out, in]            -> kernel [in, out] (transpose)
  torch Conv3d  [out, cin, kt,kh,kw] -> kernel [kt, kh, kw, cin, out]
  torch Conv3d k=stride=patch (PatchEmbed) -> matmul kernel
     [out, cin*pt*ph*pw]^T (row-major (cin, pt, ph, pw) matches
     models/dit.py patchify ordering)
  norm `weight` -> `scale`

Torch is used purely as a host-side pickle reader; everything lands in
numpy/JAX arrays. Converted trees can be saved/loaded as flat `.npz`.
"""
from __future__ import annotations

import io
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# torch pickle reading
# --------------------------------------------------------------------------

def _to_numpy(t) -> np.ndarray:
    import torch

    if t.dtype in (torch.bfloat16, getattr(torch, "float8_e4m3fn", None),
                   getattr(torch, "float8_e5m2", None)):
        return t.detach().float().cpu().numpy()
    return t.detach().cpu().numpy()


def load_torch_state_dict(path: str, load_key: str = "module"
                          ) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint into {name: ndarray}
    (reference: hyvideo/inference.py:279-354 bare vs deepspeed formats)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and load_key in sd:
        sd = sd[load_key]
    elif isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str
                 ) -> Dict[str, np.ndarray]:
    """(reference: hyvideo/vae/__init__.py:98-102 strips 'vae.')."""
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return sd


# --------------------------------------------------------------------------
# elementary converters
# --------------------------------------------------------------------------

def _lin(sd, name) -> Params:
    p = {"kernel": np.ascontiguousarray(sd.pop(f"{name}.weight").T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd.pop(f"{name}.bias")
    return p


def _norm(sd, name) -> Params:
    p = {}
    if f"{name}.weight" in sd:
        p["scale"] = sd.pop(f"{name}.weight")
    if f"{name}.bias" in sd:
        p["bias"] = sd.pop(f"{name}.bias")
    return p


def _conv3d(sd, name) -> Params:
    w = sd.pop(f"{name}.weight")  # [out, cin, kt, kh, kw]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd.pop(f"{name}.bias")
    return p


def _conv1x1_as_linear(sd, name) -> Params:
    w = sd.pop(f"{name}.weight")  # [out, in, 1, 1, 1] or [out, in]
    w = w.reshape(w.shape[0], w.shape[1])
    p = {"kernel": np.ascontiguousarray(w.T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd.pop(f"{name}.bias")
    return p


def _ts_embedder(sd, name) -> Params:
    return {"mlp_0": _lin(sd, f"{name}.mlp.0"),
            "mlp_2": _lin(sd, f"{name}.mlp.2")}


def _stack(blocks: List[Params]) -> Params:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


# --------------------------------------------------------------------------
# DiT
# --------------------------------------------------------------------------

def convert_dit_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    """Reference HYVideoDiffusionTransformer state dict -> models/dit.py tree
    (module names cited from hyvideo/modules/models.py:448-581,
    token_refiner.py:16-236, embed_layers.py, mlp_layers.py)."""
    sd = dict(sd)
    params: Params = {}

    # PatchEmbed conv -> matmul kernel (embed_layers.py:40-47)
    w = sd.pop("img_in.proj.weight")  # [h, C, pt, ph, pw]
    params["img_in"] = {
        "kernel": np.ascontiguousarray(w.reshape(w.shape[0], -1).T),
        "bias": sd.pop("img_in.proj.bias"),
    }
    params["time_in"] = _ts_embedder(sd, "time_in")
    params["vector_in"] = {"in_layer": _lin(sd, "vector_in.in_layer"),
                           "out_layer": _lin(sd, "vector_in.out_layer")}
    if cfg.guidance_embed:
        params["guidance_in"] = _ts_embedder(sd, "guidance_in")

    if cfg.text_projection == "single_refiner":
        blocks = []
        i = 0
        base = "txt_in.individual_token_refiner.blocks"
        while f"{base}.{i}.norm1.weight" in sd:
            b = f"{base}.{i}"
            blocks.append({
                "norm1": _norm(sd, f"{b}.norm1"),
                "self_attn_qkv": _lin(sd, f"{b}.self_attn_qkv"),
                "self_attn_proj": _lin(sd, f"{b}.self_attn_proj"),
                "norm2": _norm(sd, f"{b}.norm2"),
                "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                        "fc2": _lin(sd, f"{b}.mlp.fc2")},
                "adaLN_modulation": _lin(sd, f"{b}.adaLN_modulation.1"),
            })
            i += 1
        params["txt_in"] = {
            "input_embedder": _lin(sd, "txt_in.input_embedder"),
            "t_embedder": _ts_embedder(sd, "txt_in.t_embedder"),
            "c_embedder": {
                "linear_1": _lin(sd, "txt_in.c_embedder.linear_1"),
                "linear_2": _lin(sd, "txt_in.c_embedder.linear_2")},
            "blocks": blocks,
        }
    else:
        params["txt_in"] = {"linear_1": _lin(sd, "txt_in.linear_1"),
                            "linear_2": _lin(sd, "txt_in.linear_2")}

    dbl = []
    for i in range(cfg.mm_double_blocks_depth):
        b = f"double_blocks.{i}"
        dbl.append({
            "img_mod": _lin(sd, f"{b}.img_mod.linear"),
            "txt_mod": _lin(sd, f"{b}.txt_mod.linear"),
            "img_attn_qkv": _lin(sd, f"{b}.img_attn_qkv"),
            "txt_attn_qkv": _lin(sd, f"{b}.txt_attn_qkv"),
            "img_attn_q_norm": _norm(sd, f"{b}.img_attn_q_norm"),
            "img_attn_k_norm": _norm(sd, f"{b}.img_attn_k_norm"),
            "txt_attn_q_norm": _norm(sd, f"{b}.txt_attn_q_norm"),
            "txt_attn_k_norm": _norm(sd, f"{b}.txt_attn_k_norm"),
            "img_attn_proj": _lin(sd, f"{b}.img_attn_proj"),
            "txt_attn_proj": _lin(sd, f"{b}.txt_attn_proj"),
            "img_mlp": {"fc1": _lin(sd, f"{b}.img_mlp.fc1"),
                        "fc2": _lin(sd, f"{b}.img_mlp.fc2")},
            "txt_mlp": {"fc1": _lin(sd, f"{b}.txt_mlp.fc1"),
                        "fc2": _lin(sd, f"{b}.txt_mlp.fc2")},
        })
    params["double_blocks"] = _stack(dbl)

    sgl = []
    for i in range(cfg.mm_single_blocks_depth):
        b = f"single_blocks.{i}"
        sgl.append({
            "linear1": _lin(sd, f"{b}.linear1"),
            "linear2": _lin(sd, f"{b}.linear2"),
            "q_norm": _norm(sd, f"{b}.q_norm"),
            "k_norm": _norm(sd, f"{b}.k_norm"),
            "modulation": _lin(sd, f"{b}.modulation.linear"),
        })
    params["single_blocks"] = _stack(sgl)

    params["final_layer"] = {
        "linear": _lin(sd, "final_layer.linear"),
        "adaLN_modulation": _lin(sd, "final_layer.adaLN_modulation.1"),
    }

    if sd:
        leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
        if leftover:
            raise ValueError(f"Unconverted DiT keys: {sorted(leftover)[:20]}")
    return params


def load_fp8_dit_checkpoint(ckpt_path: str, fp8_map_path: str, cfg,
                            load_key: str = "module"):
    """Load a reference FP8 DiT checkpoint + its scale side-car.

    The reference ships fp8(E4M3) weights with a `*_fp8_map.pt` of one scale
    per quantized linear (reference: hyvideo/modules/fp8_optimization.py:
    85-90 loads the map and multiplies at dequant). We upcast the fp8
    weights, apply the side-car scales, convert names/layouts, and
    re-quantize into this framework's per-block fp8 storage — numerically
    identical dequantized weights.
    """
    sd = load_torch_state_dict(ckpt_path, load_key)
    fp8_map = load_torch_state_dict(fp8_map_path)
    for name, scale in fp8_map.items():
        key = name if name in sd else name.replace(".scale", ".weight")
        if key in sd:
            sd[key] = sd[key].astype(np.float32) * np.asarray(scale,
                                                             np.float32)
    params = convert_dit_state_dict(sd, cfg)
    from ..ops.quantization import quantize_dit_params_fp8
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    return quantize_dit_params_fp8(params)


# --------------------------------------------------------------------------
# VAE
# --------------------------------------------------------------------------

def _resnet_from(sd, base) -> Params:
    p = {"norm1": _norm(sd, f"{base}.norm1"),
         "conv1": _conv3d(sd, f"{base}.conv1.conv"),
         "norm2": _norm(sd, f"{base}.norm2"),
         "conv2": _conv3d(sd, f"{base}.conv2.conv")}
    if f"{base}.conv_shortcut.conv.weight" in sd:
        p["conv_shortcut"] = _conv3d(sd, f"{base}.conv_shortcut.conv")
    return p


def _attn_from(sd, base) -> Params:
    return {"group_norm": _norm(sd, f"{base}.group_norm"),
            "to_q": _lin(sd, f"{base}.to_q"),
            "to_k": _lin(sd, f"{base}.to_k"),
            "to_v": _lin(sd, f"{base}.to_v"),
            "to_out": _lin(sd, f"{base}.to_out.0")}


def _mid_from(sd, base, has_attn: bool) -> Params:
    p = {"resnets": [_resnet_from(sd, f"{base}.resnets.0"),
                     _resnet_from(sd, f"{base}.resnets.1")]}
    if has_attn:
        p["attentions"] = [_attn_from(sd, f"{base}.attentions.0")]
    return p


def convert_vae_state_dict(sd: Dict[str, np.ndarray], cfg) -> Params:
    """Reference AutoencoderKLCausal3D state dict -> models/vae.py tree
    (module names from hyvideo/vae/vae.py:32-294,
    unet_causal_3d_blocks.py:49-916; CausalConv3d wraps `.conv`)."""
    sd = strip_prefix(dict(sd), "vae.")

    enc: Params = {"conv_in": _conv3d(sd, "encoder.conv_in.conv"),
                   "down_blocks": []}
    for i in range(cfg.num_blocks):
        blk = {"resnets": []}
        j = 0
        while f"encoder.down_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(
                _resnet_from(sd, f"encoder.down_blocks.{i}.resnets.{j}"))
            j += 1
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv.conv"
        if f"{ds}.weight" in sd:
            blk["downsampler"] = _conv3d(sd, ds)
        enc["down_blocks"].append(blk)
    enc["mid_block"] = _mid_from(sd, "encoder.mid_block",
                                 cfg.mid_block_add_attention)
    enc["conv_norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv3d(sd, "encoder.conv_out.conv")

    dec: Params = {"conv_in": _conv3d(sd, "decoder.conv_in.conv"),
                   "up_blocks": []}
    dec["mid_block"] = _mid_from(sd, "decoder.mid_block",
                                 cfg.mid_block_add_attention)
    for i in range(cfg.num_blocks):
        blk = {"resnets": []}
        j = 0
        while f"decoder.up_blocks.{i}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(
                _resnet_from(sd, f"decoder.up_blocks.{i}.resnets.{j}"))
            j += 1
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv.conv"
        if f"{us}.weight" in sd:
            blk["upsampler"] = _conv3d(sd, us)
        dec["up_blocks"].append(blk)
    dec["conv_norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv3d(sd, "decoder.conv_out.conv")

    params = {"encoder": enc, "decoder": dec,
              "quant_conv": _conv1x1_as_linear(sd, "quant_conv"),
              "post_quant_conv": _conv1x1_as_linear(sd, "post_quant_conv")}

    if sd:
        leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
        if leftover:
            raise ValueError(f"Unconverted VAE keys: {sorted(leftover)[:20]}")
    return params


# --------------------------------------------------------------------------
# flat .npz persistence + coverage report
# --------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(n):
        if isinstance(n, dict):
            n = {k: listify(v) for k, v in n.items()}
            if n and all(k.isdigit() for k in n):
                return [n[str(i)] for i in range(len(n))]
        return n

    return listify(tree)


_DTYPE_TAG = "::dtype="


def save_params_npz(path: str, params: Params) -> None:
    """Flat .npz; exotic dtypes (bfloat16, float8_*) are stored as raw bytes
    with the dtype recorded in the key (np.savez would silently degrade
    them to void types)."""
    flat = {}
    for k, v in _flatten(params).items():
        v = np.asarray(v)
        if v.dtype.kind == "V" or "bfloat16" in str(v.dtype) \
                or "float8" in str(v.dtype):
            flat[f"{k}{_DTYPE_TAG}{v.dtype}"] = v.view(np.uint8)
        else:
            flat[k] = v
    np.savez(path, **flat)


def load_params_npz(path: str) -> Params:
    import ml_dtypes

    flat = {}
    with np.load(path) as z:
        for k in z.files:
            v = z[k]
            if _DTYPE_TAG in k:
                k, dtype_name = k.split(_DTYPE_TAG)
                v = v.view(np.dtype(getattr(ml_dtypes, dtype_name)))
            flat[k] = v
    return _unflatten(flat)


def coverage_report(converted: Params, reference_tree: Params
                    ) -> Tuple[List[str], List[str]]:
    """Key-coverage gate (SURVEY.md §7 stage 1): returns (missing, extra)
    leaf paths of `converted` vs a reference-shaped tree."""
    a = set(_flatten(converted))
    b = set(_flatten(reference_tree))
    return sorted(b - a), sorted(a - b)

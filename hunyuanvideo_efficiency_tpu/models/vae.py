"""Causal-3D VAE (TPU-native, functional).

Re-implements the reference AutoencoderKLCausal3D
(reference: hyvideo/vae/autoencoder_kl_causal_3d.py:53-578, vae.py:32-294,
unet_causal_3d_blocks.py:49-916) as pure functions over a parameter pytree:

* channels-last [B, T, H, W, C] layout internally (XLA:TPU-friendly);
  the public wrapper accepts/returns the reference's [B, C, T, H, W].
* CausalConv3d = replicate-padded lax.conv (ops/conv3d.py).
* mid-block attention uses a frame-causal mask (token i attends to frames
  <= its own) via the chunked online-softmax kernel — O(L·chunk) memory
  instead of the reference's explicit L×L mask.
* spatial/temporal tiled encode/decode with vectorized linear blending.
* the fork's t-ops (temporal pool / stride / interp surgery) are read from a
  static `TOpsConfig` instead of monkey-patching modules.

Parameter tree (all kernels DHWIO, pointwise convs [Cin, Cout]):
  encoder: conv_in, down_blocks[i].resnets[j].{norm1,conv1,norm2,conv2,
           conv_shortcut?}, down_blocks[i].downsampler?, mid_block.{resnets,
           attentions}, conv_norm_out, conv_out
  decoder: conv_in, mid_block, up_blocks[i].{resnets, upsampler?},
           conv_norm_out, conv_out
  quant_conv, post_quant_conv
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import chunked_attention, frame_causal_block_bias, sdpa_attention
from ..ops.conv3d import (
    causal_avg_pool_t,
    causal_conv3d,
    conv3d_1x1,
    interpolate_nearest_t,
    upsample_nearest_causal_3d,
)
from ..ops.norms import group_norm
from .vae_config import MidBlockTOps, TOpsConfig, VAEConfig

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Parameter initialization (for tests / random weights; real weights come from
# the checkpoint converter in utils/checkpoint.py)
# --------------------------------------------------------------------------

def _conv_init(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (kt, kh, kw, cin, cout), dtype) / np.sqrt(fan_in)
    return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}


def _norm_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _linear_init(key, cin, cout, dtype):
    w = jax.random.normal(key, (cin, cout), dtype) / np.sqrt(cin)
    return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}


def _resnet_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _norm_init(cin, dtype),
        "conv1": _conv_init(ks[0], 3, 3, 3, cin, cout, dtype),
        "norm2": _norm_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv_init(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": _norm_init(c, dtype),
        "to_q": _linear_init(ks[0], c, c, dtype),
        "to_k": _linear_init(ks[1], c, c, dtype),
        "to_v": _linear_init(ks[2], c, c, dtype),
        "to_out": _linear_init(ks[3], c, c, dtype),
    }


def _mid_block_init(key, c, cfg: VAEConfig, dtype):
    ks = jax.random.split(key, 3)
    p = {"resnets": [_resnet_init(ks[0], c, c, dtype),
                     _resnet_init(ks[1], c, c, dtype)]}
    if cfg.mid_block_add_attention:
        p["attentions"] = [_attn_init(ks[2], c, dtype)]
    return p


def init_vae_params(key, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    bo = cfg.block_out_channels
    lc = cfg.latent_channels

    enc: Params = {"conv_in": _conv_init(next(keys), 3, 3, 3, cfg.in_channels, bo[0], dtype)}
    enc["down_blocks"] = []
    for i in range(cfg.num_blocks):
        cin, cout = cfg.encoder_block_channels(i)
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                _resnet_init(next(keys), cin if j == 0 else cout, cout, dtype))
        if cfg.downsample_stride(i) is not None:
            blk["downsampler"] = _conv_init(next(keys), 3, 3, 3, cout, cout, dtype)
        enc["down_blocks"].append(blk)
    enc["mid_block"] = _mid_block_init(next(keys), bo[-1], cfg, dtype)
    enc["conv_norm_out"] = _norm_init(bo[-1], dtype)
    enc["conv_out"] = _conv_init(next(keys), 3, 3, 3, bo[-1], 2 * lc, dtype)

    dec: Params = {"conv_in": _conv_init(next(keys), 3, 3, 3, lc, bo[-1], dtype)}
    dec["mid_block"] = _mid_block_init(next(keys), bo[-1], cfg, dtype)
    dec["up_blocks"] = []
    for i in range(cfg.num_blocks):
        cin, cout = cfg.decoder_block_channels(i)
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(
                _resnet_init(next(keys), cin if j == 0 else cout, cout, dtype))
        if cfg.upsample_factor(i) is not None:
            blk["upsampler"] = _conv_init(next(keys), 3, 3, 3, cout, cout, dtype)
        dec["up_blocks"].append(blk)
    dec["conv_norm_out"] = _norm_init(bo[0], dtype)
    dec["conv_out"] = _conv_init(next(keys), 3, 3, 3, bo[0], cfg.out_channels, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": {"kernel": jax.random.normal(next(keys), (2 * lc, 2 * lc), dtype) / np.sqrt(2 * lc),
                       "bias": jnp.zeros((2 * lc,), dtype)},
        "post_quant_conv": {"kernel": jax.random.normal(next(keys), (lc, lc), dtype) / np.sqrt(lc),
                            "bias": jnp.zeros((lc,), dtype)},
    }


# --------------------------------------------------------------------------
# Blocks
# --------------------------------------------------------------------------

def _resnet(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """GN -> SiLU -> CausalConv -> GN -> SiLU -> CausalConv + shortcut
    (reference: unet_causal_3d_blocks.py:350-417 with temb=None)."""
    h = group_norm(x, groups, p["norm1"]["scale"], p["norm1"]["bias"])
    h = jax.nn.silu(h)
    h = causal_conv3d(h, p["conv1"]["kernel"], p["conv1"]["bias"])
    h = group_norm(h, groups, p["norm2"]["scale"], p["norm2"]["bias"])
    h = jax.nn.silu(h)
    h = causal_conv3d(h, p["conv2"]["kernel"], p["conv2"]["bias"])
    if "conv_shortcut" in p:
        x = causal_conv3d(x, p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"])
    return x + h


def _mid_attention(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Single-head frame-causal attention with residual (diffusers Attention
    semantics; reference: unet_causal_3d_blocks.py:647-662 + the diffusers
    `Attention` block with residual_connection=True, upcast_softmax=True)."""
    b, t, hh, ww, c = x.shape
    n_hw = hh * ww
    seq = x.reshape(b, t * n_hw, c)
    residual = seq
    h = group_norm(seq, groups, p["group_norm"]["scale"], p["group_norm"]["bias"])
    q = h @ p["to_q"]["kernel"].astype(h.dtype) + p["to_q"]["bias"].astype(h.dtype)
    k = h @ p["to_k"]["kernel"].astype(h.dtype) + p["to_k"]["bias"].astype(h.dtype)
    v = h @ p["to_v"]["kernel"].astype(h.dtype) + p["to_v"]["bias"].astype(h.dtype)
    q = q[:, :, None, :]  # heads=1 (attention_head_dim == channels)
    k = k[:, :, None, :]
    v = v[:, :, None, :]
    l = t * n_hw
    if l <= 4096:
        # explicit mask path for small tiles
        qi = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) // n_hw
        ki = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1) // n_hw
        bias = jnp.where(ki <= qi, 0.0, -1e30).astype(jnp.float32)[None, None]
        out = sdpa_attention(q, k, v, bias=bias)
    else:
        out = chunked_attention(q, k, v, block_bias_fn=frame_causal_block_bias(n_hw),
                                q_chunk=min(l, 2048), k_chunk=min(l, 2048))
    out = out @ p["to_out"]["kernel"].astype(out.dtype) + p["to_out"]["bias"].astype(out.dtype)
    out = out + residual
    return out.reshape(b, t, hh, ww, c)


def _apply_mid_pool(x, conf: Optional[MidBlockTOps], idx: int, where: str):
    if conf is None:
        return x
    flags = (conf.enable_t_pool_before_block if where == "before"
             else conf.enable_t_pool_after_block)
    if idx < len(flags) and flags[idx]:
        x = causal_avg_pool_t(x, conf.pool_t_kernel, conf.pool_t_stride)
    return x


def _mid_block(p: Params, x: jnp.ndarray, cfg: VAEConfig,
               tops_mid: Optional[MidBlockTOps]) -> jnp.ndarray:
    """resnet0, then (attention, resnet)×num_layers with optional t-pooling
    around each resnet (reference: unet_causal_3d_blocks.py:647-678)."""
    groups = cfg.norm_num_groups
    n_res = len(p["resnets"])
    for i in range(n_res):
        if i > 0 and cfg.mid_block_add_attention:
            x = _mid_attention(p["attentions"][i - 1], x, groups)
        x = _apply_mid_pool(x, tops_mid, i, "before")
        x = _resnet(p["resnets"][i], x, groups)
        x = _apply_mid_pool(x, tops_mid, i, "after")
    return x


# --------------------------------------------------------------------------
# Encoder / Decoder
# --------------------------------------------------------------------------

def encoder_forward(params: Params, x: jnp.ndarray, cfg: VAEConfig,
                    tops: Optional[TOpsConfig] = None) -> jnp.ndarray:
    """[B, T, H, W, 3] -> moments [B, T', H/8, W/8, 2*latent]
    (reference: vae.py:118-136)."""
    p = params["encoder"]
    groups = cfg.norm_num_groups
    x = causal_conv3d(x, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    for i, blk in enumerate(p["down_blocks"]):
        bt = tops.down(i) if tops is not None else None
        for j, rp in enumerate(blk["resnets"]):
            if bt is not None and j < len(bt.enable_t_pool_before_block) \
                    and bt.enable_t_pool_before_block[j]:
                x = causal_avg_pool_t(x, bt.pool_t_kernel, bt.pool_t_stride)
            x = _resnet(rp, x, groups)
            if bt is not None and j < len(bt.enable_t_pool_after_block) \
                    and bt.enable_t_pool_after_block[j]:
                x = causal_avg_pool_t(x, bt.pool_t_kernel, bt.pool_t_stride)
        if "downsampler" in blk:
            stride = cfg.downsample_stride(i)
            if bt is not None and bt.downsample_stride is not None:
                stride = bt.downsample_stride
            x = causal_conv3d(x, blk["downsampler"]["kernel"],
                              blk["downsampler"]["bias"], stride=stride)
    x = _mid_block(p["mid_block"], x, cfg,
                   tops.encoder_mid_block if tops is not None else None)
    x = group_norm(x, groups, p["conv_norm_out"]["scale"], p["conv_norm_out"]["bias"])
    x = jax.nn.silu(x)
    x = causal_conv3d(x, p["conv_out"]["kernel"], p["conv_out"]["bias"])
    return conv3d_1x1(x, params["quant_conv"]["kernel"], params["quant_conv"]["bias"])


def decoder_forward(params: Params, z: jnp.ndarray, cfg: VAEConfig,
                    tops: Optional[TOpsConfig] = None) -> jnp.ndarray:
    """[B, T', H/8, W/8, latent] -> [B, T, H, W, 3]
    (reference: vae.py:230-294)."""
    p = params["decoder"]
    groups = cfg.norm_num_groups
    z = conv3d_1x1(z, params["post_quant_conv"]["kernel"],
                   params["post_quant_conv"]["bias"])
    x = causal_conv3d(z, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    x = _mid_block(p["mid_block"], x, cfg,
                   tops.decoder_mid_block if tops is not None else None)
    for i, blk in enumerate(p["up_blocks"]):
        bt = tops.up(i) if tops is not None else None
        for j, rp in enumerate(blk["resnets"]):
            if bt is not None and j < len(bt.enable_t_interp_before_block) \
                    and bt.enable_t_interp_before_block[j]:
                x = interpolate_nearest_t(x, bt.interp_t_scale_factor)
            x = _resnet(rp, x, groups)
            if bt is not None and j < len(bt.enable_t_interp_after_block) \
                    and bt.enable_t_interp_after_block[j]:
                x = interpolate_nearest_t(x, bt.interp_t_scale_factor)
        if "upsampler" in blk:
            x = upsample_nearest_causal_3d(x, cfg.upsample_factor(i))
            x = causal_conv3d(x, blk["upsampler"]["kernel"], blk["upsampler"]["bias"])
    x = group_norm(x, groups, p["conv_norm_out"]["scale"], p["conv_norm_out"]["bias"])
    x = jax.nn.silu(x)
    return causal_conv3d(x, p["conv_out"]["kernel"], p["conv_out"]["bias"])


# --------------------------------------------------------------------------
# Diagonal Gaussian posterior (reference: vae.py:297-358)
# --------------------------------------------------------------------------

class DiagonalGaussian:
    """Channels-last moments [..., 2C] split into mean/logvar."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key) -> jnp.ndarray:
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes)

    def nll(self, sample: jnp.ndarray, axes=(1, 2, 3)) -> jnp.ndarray:
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes)


# --------------------------------------------------------------------------
# Tiling (host-orchestrated; each tile call is jitted per shape)
# --------------------------------------------------------------------------

def _blend(a: jnp.ndarray, b: jnp.ndarray, extent: int, axis: int) -> jnp.ndarray:
    """Linear crossfade of `a`'s trailing `extent` slices into `b`'s leading
    ones along `axis` (reference blend_v/h/t:
    autoencoder_kl_causal_3d.py:344-360)."""
    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent == 0:
        return b
    ramp_shape = [1] * b.ndim
    ramp_shape[axis] = extent
    ramp = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(ramp_shape)
    ramp = ramp.astype(b.dtype)
    a_tail = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis], axis=axis)
    b_head = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
    b_rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
    blended = a_tail * (1 - ramp) + b_head * ramp
    return jnp.concatenate([blended, b_rest], axis=axis)


class AutoencoderKLCausal3D:
    """Stateful convenience wrapper over the functional core.

    Public tensors follow the reference convention [B, C, T, H, W]; internal
    compute is channels-last. Mirrors the reference API surface:
    encode/decode/forward + use_slicing/use_spatial_tiling/use_temporal_tiling
    (reference: autoencoder_kl_causal_3d.py:135-180, 259-342, 543-578).
    """

    def __init__(self, cfg: VAEConfig, params: Params,
                 tops: Optional[TOpsConfig] = None, dtype=jnp.float32,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.params = jax.tree.map(lambda x: x.astype(dtype), params)
        self.tops = tops
        self.dtype = dtype
        self.use_slicing = False
        self.use_spatial_tiling = False
        # Uniform tiling: replicate-pad the latent so every decode tile
        # shares ONE shape. Ragged edge tiles otherwise compile a separate
        # XLA program per distinct shape (~6-8 programs at 544p; minutes
        # each on remote-compile backends). Replicate-padded latents feed
        # the convs the same edge values their own replicate padding
        # would, so only the last ~receptive-field pixels at the
        # bottom/right borders deviate slightly from the reference's
        # per-tile numerics. Off by default (exact parity).
        self.uniform_tiles = False
        self.use_temporal_tiling = False
        self.tile_overlap_factor = cfg.tile_overlap_factor
        # equal-shape tiles batched per dispatch; an encode tile is a
        # full-res pixel block ([1, 65f, 256, 256, 3] -> ~1.1 GB per
        # 128-ch activation plane, several planes live per conv stage), so
        # like decode only ONE fits per dispatch on a 16 GB chip (batch 8
        # compiled a 24.6 GB program at 544p; batch 2 compiled but
        # runtime-exhausted HBM with the next dispatch queued)
        self.encode_tile_batch = 1
        # one full-size decode tile's widest stage is ~4 GB of activations
        # (256ch x 65f x 256^2 + conv/norm transients); batching two made
        # big-tile decode un-compilable on a 16 GB chip
        self.decode_tile_batch = 1
        # With a mesh, tile batches are sharded data-parallel over ALL mesh
        # devices (tiles are independent; the reference instead decodes
        # tile-by-tile on one GPU, autoencoder_kl_causal_3d.py:422-469).
        # Params replicate so every device can run any tile.
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.params = jax.device_put(
                self.params, NamedSharding(self.mesh, PartitionSpec()))
        self._enc = jax.jit(partial(encoder_forward, cfg=cfg, tops=tops))
        self._dec = jax.jit(partial(decoder_forward, cfg=cfg, tops=tops))

    # -- toggles (reference: autoencoder_kl_causal_3d.py:182-214) --
    def enable_temporal_tiling(self, b=True):
        self.use_temporal_tiling = b

    def enable_spatial_tiling(self, b=True):
        self.use_spatial_tiling = b

    def enable_tiling(self, b=True):
        self.enable_spatial_tiling(b)
        self.enable_temporal_tiling(b)

    def disable_tiling(self):
        self.enable_tiling(False)

    def enable_slicing(self, b=True):
        self.use_slicing = b

    # -- core (channels-last internal) --
    def _encode_tile(self, x, params=None):
        return self._enc(self.params if params is None else params,
                         x.astype(self.dtype))

    def _decode_tile(self, z, params=None):
        return self._dec(self.params if params is None else params,
                         z.astype(self.dtype))

    def _sub_params(self, sub_mesh):
        """Params replicated over a device-subset mesh (remainder-tile
        dispatch): jit requires every argument on the SAME device set, and
        self.params is committed to the full mesh. Cached per subset size;
        the extra replica costs one VAE param copy on those devices."""
        from jax.sharding import NamedSharding, PartitionSpec

        d = sub_mesh.devices.size
        if not hasattr(self, "_sub_params_cache"):
            self._sub_params_cache = {}
        if d not in self._sub_params_cache:
            self._sub_params_cache[d] = jax.device_put(
                self.params, NamedSharding(sub_mesh, PartitionSpec()))
        return self._sub_params_cache[d]

    def _run_tiles_batched(self, tiles, fn, tile_batch: int):
        """Run equal-shaped tiles through fn in batched groups.

        Independent tiles share one device dispatch and batch the convs
        (the per-dispatch overhead and small-batch conv inefficiency both
        hurt the reference-style tile-by-tile loop). `tile_batch` bounds the
        group size so decoder activations stay within HBM.

        With `self.mesh`, each dispatch takes `tile_batch` tiles PER DEVICE,
        sharded on the stacked batch axis; tiles are independent, so the
        conv net partitions batch-parallel with zero collectives and per-
        device memory stays at the single-device tile_batch bound.
        """
        from collections import defaultdict

        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        groups = defaultdict(list)
        for idx, t in enumerate(tiles):
            groups[t.shape].append(idx)
        out = [None] * len(tiles)
        for shape, idxs in groups.items():
            per_dispatch = tile_batch * n_dev
            for s in range(0, len(idxs), per_dispatch):
                chunk = idxs[s:s + per_dispatch]
                batch = [tiles[i] for i in chunk]
                stacked = jnp.concatenate(batch, axis=0)
                rows = stacked.shape[0]
                pad_rows = 0
                params = None
                if n_dev > 1:
                    # When rows doesn't divide the device count, shard over
                    # the smallest device subset that keeps the SAME
                    # per-device row count as full-mesh padding would —
                    # identical wall-clock, but wasted (zero-pad) rows drop
                    # below one device's share instead of whole duplicate
                    # tiles (6 tiles on 8 devices: 6 devices x 1 row,
                    # 0 waste — the old path decoded 8).
                    per_dev = -(-rows // n_dev)
                    d = -(-rows // per_dev)
                    pad_rows = d * per_dev - rows
                    if pad_rows:
                        stacked = jnp.concatenate(
                            [stacked,
                             jnp.zeros((pad_rows, *stacked.shape[1:]),
                                       stacked.dtype)], axis=0)
                    from jax.sharding import (Mesh, NamedSharding,
                                              PartitionSpec)

                    if d == n_dev:
                        sub = self.mesh
                        spec = PartitionSpec(tuple(self.mesh.axis_names))
                    else:
                        sub = Mesh(self.mesh.devices.ravel()[:d],
                                   ("tile_rows",))
                        spec = PartitionSpec("tile_rows")
                        params = self._sub_params(sub)
                    stacked = jax.device_put(
                        stacked, NamedSharding(sub, spec))
                res = fn(stacked, params) if params is not None \
                    else fn(stacked)
                if params is not None:
                    # back onto the FULL mesh: neighbouring tiles from
                    # full-mesh dispatches live on a different device set,
                    # and blending across committed device sets is invalid
                    from jax.sharding import NamedSharding, PartitionSpec

                    res = jax.device_put(
                        res, NamedSharding(self.mesh, PartitionSpec()))
                if pad_rows:
                    # fn is row-batched 1:1 in/out on axis 0
                    res = res[:res.shape[0] - pad_rows]
                for i, p in zip(chunk,
                                jnp.split(res, len(chunk), axis=0)):
                    out[i] = p
        return out

    def _spatial_tiled_encode(self, x):
        cfg = self.cfg
        overlap = int(cfg.tile_sample_min_size * (1 - self.tile_overlap_factor))
        blend_extent = int(cfg.tile_latent_min_size * self.tile_overlap_factor)
        row_limit = cfg.tile_latent_min_size - blend_extent
        H, W = x.shape[2], x.shape[3]
        ts = cfg.tile_sample_min_size
        stages = len(cfg.block_out_channels) - 1

        def enc_size(s):
            # encoder spatial latent size for a sample extent s: each
            # downsample stage is pad-k//2 + stride-2 VALID -> ceil(s/2)
            for _ in range(stages):
                s = (s + 1) // 2
            return s

        crop_h = crop_w = None
        if self.uniform_tiles:
            # Pad the sample so every encode tile shares ONE shape (see
            # uniform_tiles note in __init__); crop the latent back to the
            # extent the unpadded ragged tiling would produce.
            last_i = ((H - 1) // overlap) * overlap
            last_j = ((W - 1) // overlap) * overlap
            crop_h = (len(range(0, H, overlap)) - 1) * row_limit \
                + min(enc_size(H - last_i), row_limit)
            crop_w = (len(range(0, W, overlap)) - 1) * row_limit \
                + min(enc_size(W - last_j), row_limit)
            pad_h = max(0, last_i + ts - H)
            pad_w = max(0, last_j + ts - W)
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w),
                               (0, 0)), mode="edge")
        in_tiles = []
        grid = []
        for i in range(0, H, overlap):
            row_idx = []
            for j in range(0, W, overlap):
                row_idx.append(len(in_tiles))
                in_tiles.append(x[:, :, i:i + cfg.tile_sample_min_size,
                                  j:j + cfg.tile_sample_min_size, :])
            grid.append(row_idx)
        flat = self._run_tiles_batched(in_tiles, self._encode_tile,
                                       self.encode_tile_batch)
        rows = [[flat[k] for k in row_idx] for row_idx in grid]
        out_rows = []
        for i, row in enumerate(rows):
            out_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = _blend(rows[i - 1][j], tile, blend_extent, axis=2)
                if j > 0:
                    tile = _blend(row[j - 1], tile, blend_extent, axis=3)
                out_row.append(tile[:, :, :row_limit, :row_limit, :])
            out_rows.append(jnp.concatenate(out_row, axis=3))
        out = jnp.concatenate(out_rows, axis=2)
        if crop_h is not None:
            out = out[:, :, :crop_h, :crop_w, :]
        return out

    def _spatial_tiled_decode(self, z):
        cfg = self.cfg
        overlap = int(cfg.tile_latent_min_size * (1 - self.tile_overlap_factor))
        blend_extent = int(cfg.tile_sample_min_size * self.tile_overlap_factor)
        row_limit = cfg.tile_sample_min_size - blend_extent
        H, W = z.shape[2], z.shape[3]
        sf = 2 ** (len(cfg.block_out_channels) - 1)
        tl = cfg.tile_latent_min_size
        crop_h = crop_w = None
        if self.uniform_tiles:
            last_i = ((H - 1) // overlap) * overlap
            last_j = ((W - 1) // overlap) * overlap
            crop_h = (len(range(0, H, overlap)) - 1) * row_limit \
                + min((H - last_i) * sf, row_limit)
            crop_w = (len(range(0, W, overlap)) - 1) * row_limit \
                + min((W - last_j) * sf, row_limit)
            pad_h = max(0, last_i + tl - H)
            pad_w = max(0, last_j + tl - W)
            if pad_h or pad_w:
                z = jnp.pad(z, ((0, 0), (0, 0), (0, pad_h), (0, pad_w),
                               (0, 0)), mode="edge")
        in_tiles = []
        grid = []
        for i in range(0, H, overlap):
            row_idx = []
            for j in range(0, W, overlap):
                row_idx.append(len(in_tiles))
                in_tiles.append(z[:, :, i:i + cfg.tile_latent_min_size,
                                  j:j + cfg.tile_latent_min_size, :])
            grid.append(row_idx)
        flat = self._run_tiles_batched(in_tiles, self._decode_tile,
                                       self.decode_tile_batch)
        rows = [[flat[k] for k in row_idx] for row_idx in grid]
        out_rows = []
        for i, row in enumerate(rows):
            out_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = _blend(rows[i - 1][j], tile, blend_extent, axis=2)
                if j > 0:
                    tile = _blend(row[j - 1], tile, blend_extent, axis=3)
                out_row.append(tile[:, :, :row_limit, :row_limit, :])
            out_rows.append(jnp.concatenate(out_row, axis=3))
        out = jnp.concatenate(out_rows, axis=2)
        if crop_h is not None:
            out = out[:, :, :crop_h, :crop_w, :]
        return out

    def _temporal_tiled_encode(self, x):
        cfg = self.cfg
        T = x.shape[1]
        overlap = int(cfg.tile_sample_min_tsize * (1 - self.tile_overlap_factor))
        blend_extent = int(cfg.tile_latent_min_tsize * self.tile_overlap_factor)
        t_limit = cfg.tile_latent_min_tsize - blend_extent
        if self.uniform_tiles:
            # Edge-pad so every temporal encode tile shares ONE shape (the
            # decode path does the same); crop the latent back afterwards.
            last_i = ((T - 1) // overlap) * overlap
            pad_t = max(0, last_i + cfg.tile_sample_min_tsize + 1 - T)
            true_t = T
            if pad_t:
                x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0), (0, 0),
                               (0, 0)), mode="edge")
        tiles = []
        for i in range(0, true_t if self.uniform_tiles else T, overlap):
            tile = x[:, i:i + cfg.tile_sample_min_tsize + 1]
            if self.use_spatial_tiling and (
                    tile.shape[2] > cfg.tile_sample_min_size
                    or tile.shape[3] > cfg.tile_sample_min_size):
                enc = self._spatial_tiled_encode(tile)
            else:
                enc = self._encode_tile(tile)
            if i > 0:
                enc = enc[:, 1:]
            tiles.append(enc)
        out = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = _blend(tiles[i - 1], tile, blend_extent, axis=1)
                out.append(tile[:, :t_limit])
            else:
                out.append(tile[:, :t_limit + 1])
        res = jnp.concatenate(out, axis=1)
        if self.uniform_tiles:
            # crop to the LATENT frame count the unpadded tiling would
            # produce: T sample frames -> (T-1)//tf + 1 latent frames
            tf = 4  # 884 temporal factor
            res = res[:, :(true_t - 1) // tf + 1]
        return res

    def _temporal_tiled_decode(self, z):
        cfg = self.cfg
        T = z.shape[1]
        overlap = int(cfg.tile_latent_min_tsize * (1 - self.tile_overlap_factor))
        blend_extent = int(cfg.tile_sample_min_tsize * self.tile_overlap_factor)
        t_limit = cfg.tile_sample_min_tsize - blend_extent
        if self.uniform_tiles:
            last_i = ((T - 1) // overlap) * overlap
            pad_t = max(0, last_i + cfg.tile_latent_min_tsize + 1 - T)
            true_t = T
            if pad_t:
                z = jnp.pad(z, ((0, 0), (0, pad_t), (0, 0), (0, 0),
                               (0, 0)), mode="edge")
        tiles = []
        for i in range(0, true_t if self.uniform_tiles else T, overlap):
            tile = z[:, i:i + cfg.tile_latent_min_tsize + 1]
            if self.use_spatial_tiling and (
                    tile.shape[2] > cfg.tile_latent_min_size
                    or tile.shape[3] > cfg.tile_latent_min_size):
                dec = self._spatial_tiled_decode(tile)
            else:
                dec = self._decode_tile(tile)
            if i > 0:
                dec = dec[:, 1:]
            tiles.append(dec)
        out = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = _blend(tiles[i - 1], tile, blend_extent, axis=1)
                out.append(tile[:, :t_limit])
            else:
                out.append(tile[:, :t_limit + 1])
        res = jnp.concatenate(out, axis=1)
        if self.uniform_tiles:
            # crop to the frame count the unpadded tiling would produce
            tf = 4  # 884 temporal factor
            res = res[:, :(true_t - 1) * tf + 1]
        return res

    # -- public API ([B, C, T, H, W] boundary) --
    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, T, H, W] -> moments [B, 2*latent, T', H', W']."""
        xl = jnp.transpose(x, (0, 2, 3, 4, 1))
        cfg = self.cfg
        if self.use_temporal_tiling and xl.shape[1] > cfg.tile_sample_min_tsize:
            m = self._temporal_tiled_encode(xl)
        elif self.use_spatial_tiling and (
                xl.shape[2] > cfg.tile_sample_min_size
                or xl.shape[3] > cfg.tile_sample_min_size):
            m = self._spatial_tiled_encode(xl)
        else:
            m = self._encode_tile(xl)
        return jnp.transpose(m, (0, 4, 1, 2, 3))

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        if self.use_slicing and x.shape[0] > 1:
            moments = jnp.concatenate(
                [self.encode_moments(xs) for xs in jnp.split(x, x.shape[0])], 0)
        else:
            moments = self.encode_moments(x)
        # posterior splits on the channel axis (dim=1 for 5-D)
        return DiagonalGaussian(jnp.moveaxis(moments, 1, -1))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B, latent, T', H', W'] -> [B, 3, T, H, W]."""
        def one(zb):
            zl = jnp.transpose(zb, (0, 2, 3, 4, 1))
            cfg = self.cfg
            if self.use_temporal_tiling and zl.shape[1] > cfg.tile_latent_min_tsize:
                d = self._temporal_tiled_decode(zl)
            elif self.use_spatial_tiling and (
                    zl.shape[2] > cfg.tile_latent_min_size
                    or zl.shape[3] > cfg.tile_latent_min_size):
                d = self._spatial_tiled_decode(zl)
            else:
                d = self._decode_tile(zl)
            return jnp.transpose(d, (0, 4, 1, 2, 3))

        if self.use_slicing and z.shape[0] > 1:
            return jnp.concatenate([one(zs) for zs in jnp.split(z, z.shape[0])], 0)
        return one(z)

    def __call__(self, sample: jnp.ndarray, sample_posterior: bool = False,
                 key=None, return_posterior: bool = False):
        """Round-trip like the reference forward
        (autoencoder_kl_causal_3d.py:543-578)."""
        posterior = self.encode(sample)
        if sample_posterior:
            assert key is not None, "need PRNG key to sample the posterior"
            z = posterior.sample(key)
        else:
            z = posterior.mode()
        z = jnp.moveaxis(z, -1, 1)
        dec = self.decode(z)
        if return_posterior:
            return dec, posterior
        return dec

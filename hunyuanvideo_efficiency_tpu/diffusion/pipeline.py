"""HunyuanVideo T2V pipeline — jitted denoise scan + tiled VAE decode.

Re-designs the reference HunyuanVideoPipeline
(reference: hyvideo/diffusion/pipelines/pipeline_hunyuan_video.py:144-1100)
the TPU way: the entire 50-step denoise loop is ONE `lax.scan` inside ONE
`jit` (no per-step Python dispatch), latents stay in fp32 through the Euler
step while the DiT computes in bf16, CFG batching happens inside the scanned
body, and seeds are explicit PRNG keys.

Preserved reference semantics:
  * CFG concat order [negative, positive] (:896-903)
  * guidance_expand = embedded_cfg_scale * 1000 in model dtype (:976-985)
  * rescale_noise_cfg per arXiv 2305.08891 §3.4 (:56-71)
  * latents / scaling_factor (+ shift_factor) before decode (:1060-1069)
  * output = (image / 2 + 0.5).clamp(0, 1) (:1090)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit import dit_forward
from ..models.dit_config import DiTConfig
from ..models.vae import AutoencoderKLCausal3D
from .scheduler import FlowMatchDiscreteScheduler, euler_step


def rescale_noise_cfg(noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray,
                      guidance_rescale: float) -> jnp.ndarray:
    """(reference: pipeline_hunyuan_video.py:56-71)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


@partial(jax.jit, static_argnames=("cfg", "do_cfg", "guidance_scale",
                                   "embedded_guidance_scale", "guidance_rescale"))
def denoise_step(
    dit_params: Dict[str, Any],
    latents: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
    t: jnp.ndarray,
    prompt_embeds: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    prompt_embeds_2: jnp.ndarray,
    freqs_cos: jnp.ndarray,
    freqs_sin: jnp.ndarray,
    cfg: DiTConfig,
    do_cfg: bool,
    guidance_scale: float,
    embedded_guidance_scale: Optional[float],
    guidance_rescale: float,
) -> jnp.ndarray:
    """One denoise step as its own dispatch — the host-driven alternative
    to the fused scan (`scan_denoise=False`): per-step progress callbacks,
    early abort, and single-dispatch on-device times bounded by one step
    (required where the runtime limits program duration; see CLAUDE.md).
    Numerics are identical to the scan body."""
    mult = 2 if do_cfg else 1
    latent_in = (jnp.concatenate([latents] * mult, axis=0)
                 if do_cfg else latents)
    t_expand = jnp.full((latent_in.shape[0],), t, jnp.float32)
    guidance = None
    if cfg.guidance_embed:
        guidance = jnp.full((latent_in.shape[0],),
                            (embedded_guidance_scale or 0.0) * 1000.0,
                            jnp.float32)
    v = dit_forward(dit_params, latent_in, t_expand, prompt_embeds,
                    prompt_mask, prompt_embeds_2, freqs_cos, freqs_sin,
                    guidance, cfg=cfg)
    v = v.astype(jnp.float32)
    if do_cfg:
        v_uncond, v_text = jnp.split(v, 2, axis=0)
        v = v_uncond + guidance_scale * (v_text - v_uncond)
        if guidance_rescale > 0.0:
            v = rescale_noise_cfg(v, v_text, guidance_rescale)
    return euler_step(latents, v, sigma, sigma_next)


@partial(jax.jit, static_argnames=("cfg", "do_cfg", "embedded_guidance_scale"))
def _staged_step_prep(latents, t, cfg, do_cfg, embedded_guidance_scale):
    mult = 2 if do_cfg else 1
    latent_in = (jnp.concatenate([latents] * mult, axis=0)
                 if do_cfg else latents)
    t_expand = jnp.full((latent_in.shape[0],), t, jnp.float32)
    guidance = None
    if cfg.guidance_embed:
        guidance = jnp.full((latent_in.shape[0],),
                            (embedded_guidance_scale or 0.0) * 1000.0,
                            jnp.float32)
    return latent_in, t_expand, guidance


@partial(jax.jit, static_argnames=("do_cfg", "guidance_scale",
                                   "guidance_rescale"))
def _staged_step_epilogue(latents, v, sigma, sigma_next, do_cfg,
                          guidance_scale, guidance_rescale):
    v = v.astype(jnp.float32)
    if do_cfg:
        v_uncond, v_text = jnp.split(v, 2, axis=0)
        v = v_uncond + guidance_scale * (v_text - v_uncond)
        if guidance_rescale > 0.0:
            v = rescale_noise_cfg(v, v_text, guidance_rescale)
    return euler_step(latents, v, sigma, sigma_next)


def denoise_step_staged(
    dit_params, latents, sigma, sigma_next, t,
    prompt_embeds, prompt_mask, prompt_embeds_2,
    freqs_cos, freqs_sin, cfg, do_cfg, guidance_scale,
    embedded_guidance_scale, guidance_rescale,
    block_chunks=(2, 4), sync=None,
) -> jnp.ndarray:
    """denoise_step with the DiT forward cut into host-driven chunked
    programs (models.dit.dit_forward_staged) for configs whose single-step
    program exceeds the runtime's ~60 s on-device watchdog (720p x 129f;
    CLAUDE.md). Numerics identical to denoise_step (tested). `sync` is
    forwarded to dit_forward_staged to serialize program dispatch."""
    from ..models.dit import dit_forward_staged

    latent_in, t_expand, guidance = _staged_step_prep(
        latents, t, cfg=cfg, do_cfg=do_cfg,
        embedded_guidance_scale=embedded_guidance_scale)
    v = dit_forward_staged(
        dit_params, latent_in, t_expand, prompt_embeds, prompt_mask,
        prompt_embeds_2, freqs_cos, freqs_sin, guidance, cfg=cfg,
        double_chunks=block_chunks[0], single_chunks=block_chunks[1],
        sync=sync)
    return _staged_step_epilogue(
        latents, v, sigma, sigma_next, do_cfg=do_cfg,
        guidance_scale=float(guidance_scale),
        guidance_rescale=float(guidance_rescale))


@partial(jax.jit, static_argnames=("cfg", "do_cfg", "guidance_scale",
                                   "embedded_guidance_scale", "guidance_rescale"))
def denoise_latents(
    dit_params: Dict[str, Any],
    latents: jnp.ndarray,           # [B, C, T', H', W'] fp32
    sigmas: jnp.ndarray,            # [N+1] fp32
    timesteps: jnp.ndarray,         # [N] fp32
    prompt_embeds: jnp.ndarray,     # [B or 2B, L, D]
    prompt_mask: jnp.ndarray,       # [B or 2B, L]
    prompt_embeds_2: jnp.ndarray,   # [B or 2B, D2]
    freqs_cos: jnp.ndarray,
    freqs_sin: jnp.ndarray,
    cfg: DiTConfig,
    do_cfg: bool,
    guidance_scale: float,
    embedded_guidance_scale: Optional[float],
    guidance_rescale: float,
) -> jnp.ndarray:
    """Full denoise loop as a single scan (reference loop :960-1045)."""
    mult = 2 if do_cfg else 1

    def body(latents, step):
        sigma, sigma_next, t = step
        latent_in = jnp.concatenate([latents] * mult, axis=0) if do_cfg else latents
        t_expand = jnp.full((latent_in.shape[0],), t, jnp.float32)
        guidance = None
        if cfg.guidance_embed:
            guidance = jnp.full((latent_in.shape[0],),
                                (embedded_guidance_scale or 0.0) * 1000.0,
                                jnp.float32)
        v = dit_forward(dit_params, latent_in, t_expand, prompt_embeds,
                        prompt_mask, prompt_embeds_2, freqs_cos, freqs_sin,
                        guidance, cfg=cfg)
        v = v.astype(jnp.float32)
        if do_cfg:
            v_uncond, v_text = jnp.split(v, 2, axis=0)
            v = v_uncond + guidance_scale * (v_text - v_uncond)
            if guidance_rescale > 0.0:
                v = rescale_noise_cfg(v, v_text, guidance_rescale)
        latents = euler_step(latents, v, sigma, sigma_next)
        return latents, None

    steps = (sigmas[:-1], sigmas[1:], timesteps)
    latents, _ = jax.lax.scan(body, latents.astype(jnp.float32), steps)
    return latents


@dataclass
class HunyuanVideoPipelineOutput:
    videos: np.ndarray  # [B, C, T, H, W] in [0, 1], float32


class HunyuanVideoPipeline:
    """Orchestrates text encoding -> denoise scan -> VAE decode.

    `text_encoder` / `text_encoder_2` follow the TextEncoder interface in
    models/text/encoder.py; they may be None if prompt embeddings are passed
    directly (the reference requires encoders; we additionally support
    precomputed embeddings for staged bring-up and benchmarking).
    """

    vae_scale_factor = 8

    def __init__(self, vae: AutoencoderKLCausal3D, text_encoder,
                 text_encoder_2, transformer_params: Dict[str, Any],
                 transformer_cfg: DiTConfig,
                 scheduler: FlowMatchDiscreteScheduler,
                 precision: str = "bf16", vae_precision: str = "fp16",
                 args=None, offload_encoders: bool = False,
                 offload_transformer: bool = False,
                 mesh=None, pcfg=None, transformer_builder=None):
        # multi-chip: with a mesh of world_size > 1 the denoise loop runs
        # sequence-parallel (parallel/sp_dit.py) — the TPU-native analog of
        # the reference wiring parallelize_transformer into the live
        # pipeline (reference: hyvideo/inference.py:408-409)
        self.mesh = mesh
        self.pcfg = pcfg
        self._sp_fns: Dict[Any, Any] = {}
        self._sp_params_placed = False
        self.offload_encoders = offload_encoders or bool(
            getattr(args, "use_cpu_offload", False))
        # park DiT weights in host memory while the VAE decodes (the
        # reference's sequential cpu-offload, inference.py:443-446 /
        # pipeline :164-166): on a 16 GB chip the 12.8 GB quantized DiT
        # plus decode-tile activations do not fit together.
        # True: round-trip the weights to host RAM (reusable pipeline).
        # "free": DELETE the device weights before decode — the right mode
        # for one-shot generation (sample_video.py runs one video per
        # process); on remote-tunnel runtimes the 13.5 GB device->host
        # copy of True costs ~20 minutes, the delete is instant. The
        # pipeline cannot denoise again afterwards.
        self.offload_transformer = offload_transformer or bool(
            getattr(args, "use_cpu_offload", False))
        self.vae = vae
        self.text_encoder = text_encoder
        self.text_encoder_2 = text_encoder_2
        self.transformer_params = transformer_params
        # Deferred DiT materialization for phase-sequenced single-chip runs:
        # with the int8 tiers the 8B LLM tower (~8 GB) and the 13B DiT
        # (~12.4 GB) cannot coexist in one v5e's 15.75 GB HBM. Pass
        # transformer_params=None plus a zero-arg builder; the pipeline
        # calls it AFTER the text phase has encoded and the encoders were
        # freed (offload_encoders="free"), so each phase owns the chip:
        # text -> DiT -> VAE. (The reference's analog is diffusers
        # sequential cpu-offload, hyvideo/inference.py:443-446 — a
        # host-round-trip tier that costs ~minutes/GB through a remote
        # runtime link, where the build/free sequencing is instant.)
        self.transformer_builder = transformer_builder
        self.transformer_cfg = transformer_cfg
        self.scheduler = scheduler
        self.precision = precision
        self.vae_precision = vae_precision
        self.args = args

    # ---- input validation (reference: :482-555) ----
    @staticmethod
    def check_inputs(height: int, width: int, video_length: int,
                     vae_ver: str = "884-16c-hy"):
        if height % 8 != 0 or width % 8 != 0:
            raise ValueError(
                f"`height` and `width` have to be divisible by 8 but are {height} and {width}.")
        if "884" in vae_ver:
            if video_length != 1 and (video_length - 1) % 4 != 0:
                raise ValueError(
                    f"`video_length` has to be 1 or a multiple of 4 plus 1 but is {video_length}.")
        elif "888" in vae_ver:
            if video_length != 1 and (video_length - 1) % 8 != 0:
                raise ValueError(
                    f"`video_length` has to be 1 or a multiple of 8 plus 1 but is {video_length}.")

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool,
                      data_type: str = "video",
                      num_videos_per_prompt: int = 1):
        """Encode with both encoders; returns CFG-concatenated [neg, pos]
        arrays (reference: encode_prompt :238-449 + concat :896-903)."""
        pe, mask = self.text_encoder.encode_prompt(
            prompt, data_type=data_type, num_videos=num_videos_per_prompt)
        pe2, _ = self.text_encoder_2.encode_prompt(
            prompt, data_type=data_type, num_videos=num_videos_per_prompt)
        if isinstance(prompt, (list, tuple)) and isinstance(
                negative_prompt, str):
            # one negative per prompt (reference: diffusers replicates a
            # single negative_prompt across the batch, :238-449)
            negative_prompt = [negative_prompt] * len(prompt)
        if do_cfg:
            npe, nmask = self.text_encoder.encode_prompt(
                negative_prompt, data_type=data_type,
                num_videos=num_videos_per_prompt)
            npe2, _ = self.text_encoder_2.encode_prompt(
                negative_prompt, data_type=data_type,
                num_videos=num_videos_per_prompt)
            pe = jnp.concatenate([npe, pe], axis=0)
            mask = jnp.concatenate([nmask, mask], axis=0)
            pe2 = jnp.concatenate([npe2, pe2], axis=0)
        return pe, mask, pe2

    def _denoise_sharded(self, latents, sigmas, timesteps, pe, mask, pe2,
                         freqs_cis, *, do_cfg, guidance_scale,
                         embedded_guidance_scale, guidance_rescale,
                         scan_denoise, progress_callback=None):
        """Sequence-parallel denoise over `self.mesh`: the latent travels
        as flat patch tokens sharded over (dp, ulysses, ring) for the WHOLE
        loop and is gathered exactly once before VAE decode.

        The TPU-native analog of the reference applying
        `parallelize_transformer` to the live pipeline (reference:
        hyvideo/inference.py:408-409 patching forward at :40-104) — but as
        shard_map sharding instead of a forward monkey-patch, and without
        the reference's per-step all_gather (inference.py:97-100).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models.dit import patchify_raw, unpatchify
        from ..parallel import (DP_AXIS, SP_AXES, cfg_reorder_for_dp,
                                check_sp_compat, make_sp_denoise_fn,
                                make_sp_step_fn, shard_dit_params,
                                shard_params)

        cfg = self.transformer_cfg
        pcfg = self.pcfg
        mesh = self.mesh
        b, c, lt_, lh, lw = latents.shape
        pt, ph, pw = cfg.patch_size
        grid = (lt_ // pt, lh // ph, lw // pw)
        check_sp_compat(cfg, pcfg, grid, b)

        tokens = patchify_raw(latents.astype(jnp.float32), cfg.patch_size)
        tok_sh = NamedSharding(mesh, P(DP_AXIS, SP_AXES, None))
        freq_sh = NamedSharding(mesh, P(SP_AXES, None))
        bat_sh = NamedSharding(mesh, P(DP_AXIS))
        tokens = jax.device_put(tokens, tok_sh)
        f_cos = jax.device_put(jnp.asarray(freqs_cis[0]), freq_sh)
        f_sin = jax.device_put(jnp.asarray(freqs_cis[1]), freq_sh)
        dp = pcfg.dp_degree
        if do_cfg and dp > 1:
            # the dp shards each need their own contiguous [neg | pos] pair
            pe = cfg_reorder_for_dp(pe, dp)
            mask = cfg_reorder_for_dp(mask, dp)
            pe2 = cfg_reorder_for_dp(pe2, dp)
        pe = jax.device_put(pe, bat_sh)
        mask = jax.device_put(mask, bat_sh)
        pe2 = jax.device_put(pe2, bat_sh)
        shard_weights = bool(getattr(self.args, "shard_dit_weights", False))
        if not self._sp_params_placed:
            if shard_weights:
                # beyond-reference memory tier: block stacks weight-sharded
                # over the sp axes, re-gathered chunk-by-chunk in the
                # forward (parallel/sp_dit.py:shard_dit_params)
                self.transformer_params, self._sp_param_axes = \
                    shard_dit_params(self.transformer_params, mesh, pcfg)
            else:
                self.transformer_params = shard_params(
                    self.transformer_params, mesh)
                self._sp_param_axes = None
            self._sp_params_placed = True
        params = self.transformer_params

        key = (bool(do_cfg), float(guidance_scale),
               embedded_guidance_scale, float(guidance_rescale), grid,
               bool(scan_denoise), shard_weights)
        if key not in self._sp_fns:
            maker = make_sp_denoise_fn if scan_denoise else make_sp_step_fn
            self._sp_fns[key] = maker(
                mesh, cfg, pcfg, do_cfg=do_cfg,
                guidance_scale=float(guidance_scale),
                embedded_guidance_scale=embedded_guidance_scale,
                guidance_rescale=float(guidance_rescale), token_grid=grid,
                param_axes=self._sp_param_axes)
        fn = self._sp_fns[key]

        if scan_denoise:
            tokens = fn(params, tokens, sigmas, timesteps, pe, mask, pe2,
                        f_cos, f_sin)
        else:
            for i in range(int(timesteps.shape[0])):
                tokens = fn(params, tokens, sigmas[i], sigmas[i + 1],
                            timesteps[i], pe, mask, pe2, f_cos, f_sin)
                # serialize dispatches (see the single-device loop below);
                # a single-ELEMENT slice, not ravel: reshaping the sharded
                # carry could make GSPMD gather all shards every step
                jax.device_get(tokens[0, 0, 0])
                if progress_callback is not None:
                    progress_callback(i, tokens)

        # the single gather of the run: token shards -> host -> 5D latent
        tokens = jnp.asarray(jax.device_get(tokens))
        return unpatchify(tokens, *grid, cfg.out_channels, cfg.patch_size)

    def __call__(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        height: int = 720,
        width: int = 1280,
        video_length: int = 129,
        *,
        num_inference_steps: int = 50,
        guidance_scale: float = 1.0,
        negative_prompt: Optional[str] = None,
        num_videos_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        prompt_mask: Optional[jnp.ndarray] = None,
        prompt_embeds_2: Optional[jnp.ndarray] = None,
        guidance_rescale: float = 0.0,
        embedded_guidance_scale: Optional[float] = None,
        freqs_cis: Tuple[jnp.ndarray, jnp.ndarray] = None,
        vae_ver: str = "884-16c-hy",
        enable_tiling: bool = False,
        output_type: str = "pil",
        data_type: str = "video",
        n_tokens: Optional[int] = None,
        scan_denoise: Optional[bool] = None,
        block_chunks: Optional[Tuple[int, int]] = None,
        progress_callback=None,
        output_dtype: str = "float32",
    ) -> HunyuanVideoPipelineOutput:
        self.check_inputs(height, width, video_length, vae_ver)
        do_cfg = guidance_scale > 1.0

        if prompt_embeds is None:
            pe, mask, pe2 = self.encode_prompt(
                prompt, negative_prompt, do_cfg, data_type,
                num_videos_per_prompt)
            if self.offload_encoders:
                # free encoder HBM before the denoise loop (reference
                # sequential cpu-offload analog, inference.py:443-446);
                # "free" deletes the device weights outright (one-shot)
                # instead of round-tripping them to host
                for enc in (self.text_encoder, self.text_encoder_2):
                    if enc is None:
                        continue
                    if self.offload_encoders == "free":
                        enc.free()
                    elif hasattr(enc, "offload"):
                        enc.offload()
        else:
            pe, mask, pe2 = prompt_embeds, prompt_mask, prompt_embeds_2

        if self.transformer_params is None and self.transformer_builder:
            # phase-sequenced build: the encoders' HBM is free now
            self.transformer_params, self.transformer_builder = (
                self.transformer_builder(), None)

        batch = pe.shape[0] // (2 if do_cfg else 1)

        # timesteps (reference retrieve_timesteps :906-917)
        self.scheduler.set_timesteps(num_inference_steps, n_tokens=n_tokens)
        sigmas = jnp.asarray(self.scheduler.sigmas, jnp.float32)
        timesteps = jnp.asarray(self.scheduler.timesteps, jnp.float32)

        # latent frame count (reference :919-924)
        if "884" in vae_ver:
            latent_t = (video_length - 1) // 4 + 1
        elif "888" in vae_ver:
            latent_t = (video_length - 1) // 8 + 1
        else:
            latent_t = video_length

        cfg = self.transformer_cfg
        shape = (batch, cfg.in_channels, latent_t,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            assert key is not None, "need a PRNG key when latents not given"
            if isinstance(key, (list, tuple)):
                # one key per video: each sample individually reproducible
                # (reference: per-video torch.Generator, inference.py:534-566)
                assert len(key) == batch, (len(key), batch)
                latents = jnp.stack([
                    jax.random.normal(k, shape[1:], jnp.float32)
                    for k in key])
            else:
                latents = jax.random.normal(key, shape, jnp.float32)
        latents = latents.astype(jnp.float32)

        use_sp = (self.mesh is not None and self.pcfg is not None
                  and self.pcfg.world_size > 1)
        if scan_denoise is None:
            # runtime-aware default: fuse all steps where the runtime
            # allows, fall back to per-step (or block-chunked) dispatch
            # under a program-duration watchdog (diffusion/dispatch.py)
            from .dispatch import plan_dispatch

            plan = plan_dispatch(
                cfg, shape, num_steps=int(timesteps.shape[0]),
                do_cfg=do_cfg,
                sp_degree=self.pcfg.sp_degree if use_sp else 1)
            scan_denoise = plan.scan_denoise
            if block_chunks is None:
                block_chunks = plan.block_chunks
        if self.offload_transformer and not use_sp:
            if self.transformer_params is None:
                raise RuntimeError(
                    "transformer weights were freed by a previous "
                    "offload_transformer='free' run; reload the pipeline")
            # sequential offload: only the phase that is executing keeps
            # its weights on device. Offload the VAE BEFORE materializing
            # the DiT — peak HBM must be the max, not the sum, of the two
            # phases (the 13 GB fp8 tier OOMs in the other order; measured
            # RESOURCE_EXHAUSTED, r5)
            if self.vae is not None:
                self.vae.params = jax.device_put(
                    self.vae.params, jax.devices("cpu")[0])
            self.transformer_params = jax.device_put(
                self.transformer_params, jax.devices()[0])
        egs = (float(embedded_guidance_scale)
               if embedded_guidance_scale is not None else None)
        if use_sp:
            latents = self._denoise_sharded(
                latents, sigmas, timesteps, pe, mask, pe2, freqs_cis,
                do_cfg=do_cfg, guidance_scale=float(guidance_scale),
                embedded_guidance_scale=egs,
                guidance_rescale=float(guidance_rescale),
                scan_denoise=scan_denoise,
                progress_callback=progress_callback)
        elif scan_denoise:
            # the TPU-native default: all steps fused in one program
            latents = denoise_latents(
                self.transformer_params, latents, sigmas, timesteps,
                pe, mask, pe2, freqs_cis[0], freqs_cis[1],
                cfg=cfg, do_cfg=do_cfg,
                guidance_scale=float(guidance_scale),
                embedded_guidance_scale=egs,
                guidance_rescale=float(guidance_rescale))
        else:
            # host-driven loop: one dispatch per step (progress callbacks,
            # early abort, bounded per-program device time); same compiled
            # step reused across iterations, numerics identical to the scan
            for i in range(int(timesteps.shape[0])):
                if block_chunks is not None:
                    # watchdog-bounded configs (720p): cut the step's DiT
                    # forward itself into chunked programs, each synced
                    latents = denoise_step_staged(
                        self.transformer_params, latents, sigmas[i],
                        sigmas[i + 1], timesteps[i],
                        pe, mask, pe2, freqs_cis[0], freqs_cis[1],
                        cfg=cfg, do_cfg=do_cfg,
                        guidance_scale=float(guidance_scale),
                        embedded_guidance_scale=egs,
                        guidance_rescale=float(guidance_rescale),
                        block_chunks=block_chunks,
                        sync=lambda a: jax.device_get(a.ravel()[0]))
                else:
                    latents = denoise_step(
                        self.transformer_params, latents, sigmas[i],
                        sigmas[i + 1], timesteps[i],
                        pe, mask, pe2, freqs_cis[0], freqs_cis[1],
                        cfg=cfg, do_cfg=do_cfg,
                        guidance_scale=float(guidance_scale),
                        embedded_guidance_scale=egs,
                        guidance_rescale=float(guidance_rescale))
                # Serialize: async dispatch lets the runtime overlap
                # program workspaces (several GB each) and exhaust HBM;
                # a scalar readback is the reliable sync even on remote
                # runtimes where block_until_ready can be a no-op. Costs
                # one 4-byte device->host transfer per step.
                jax.device_get(latents.ravel()[0])
                if progress_callback is not None:
                    progress_callback(i, latents)

        if output_type == "latent":
            return HunyuanVideoPipelineOutput(videos=np.asarray(latents))

        if self.offload_transformer and not use_sp:
            latents = jax.device_put(np.asarray(latents))  # force + detach
            if self.offload_transformer == "free":
                # drop the device weights outright (no host copy): frees
                # the ~13 GB instantly where the host round-trip would
                # re-transfer the whole tree through the runtime link
                jax.tree.map(
                    lambda a: a.delete() if hasattr(a, "delete") else None,
                    self.transformer_params)
                self.transformer_params = None
            else:
                cpu = jax.devices("cpu")[0]
                self.transformer_params = jax.device_put(
                    self.transformer_params, cpu)
            self.vae.params = jax.device_put(self.vae.params,
                                             jax.devices()[0])

        # decode (reference :1047-1092)
        vcfg = self.vae.cfg
        if vcfg.shift_factor:
            z = latents / vcfg.scaling_factor + vcfg.shift_factor
        else:
            z = latents / vcfg.scaling_factor
        if enable_tiling:
            self.vae.enable_tiling()
        image = self.vae.decode(z)
        image = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        # cast ON DEVICE before the host transfer: the fp32 720p x 129f
        # video is 1.43 GB and the readback rides this environment's
        # remote tunnel (measured ~120 s of the warm E2E's decode leg);
        # uint8 is what the mp4 writer quantizes to anyway (4x fewer
        # bytes), float16 halves the bytes losslessly for [0, 1] video
        if output_dtype == "uint8":
            image = jnp.round(image * 255.0).astype(jnp.uint8)
        elif output_dtype == "float16":
            image = image.astype(jnp.float16)
        elif output_dtype != "float32":
            raise ValueError(f"output_dtype must be float32|float16|uint8, "
                             f"got {output_dtype!r}")
        return HunyuanVideoPipelineOutput(videos=np.asarray(image))

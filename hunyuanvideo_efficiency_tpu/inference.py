"""Orchestration: model loading + the HunyuanVideoSampler predict API.

TPU-native analog of the reference orchestration layer
(reference: hyvideo/inference.py:143-671):

* `Inference.from_pretrained` builds DiT + VAE + both text encoders from an
  `InferenceArgs`. Weights load through the torch->JAX converters
  (utils/checkpoint.py) when checkpoint files exist; `allow_random_init=True`
  (benchmarks/tests, no reference analog) builds random weights instead.
* Multi-chip setup is ONE `jax.sharding.Mesh` (parallel/mesh.py) instead of
  NCCL process groups — a single host process drives all chips.
* `HunyuanVideoSampler.predict` mirrors the reference semantics: seed
  handling (int / list / None -> per-video keys, :534-566), H/W alignment
  to 16 (:584-585), fresh scheduler with runtime flow_shift (:609-614),
  RoPE table construction (:450-495), pipeline call (:645-664).
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import InferenceArgs, parse_vae_name
from .constants import NEGATIVE_PROMPT, PRECISION_TO_TYPE
from .diffusion.pipeline import HunyuanVideoPipeline
from .diffusion.scheduler import FlowMatchDiscreteScheduler
from .models.dit import init_dit_params
from .models.dit_config import DiTConfig, load_dit_config
from .models.text import build_text_encoders
from .models.vae import AutoencoderKLCausal3D, init_vae_params
from .models.vae_config import load_vae_config
from .ops.quantization import (quantize_dit_params_fp8,
                               quantize_dit_params_int8)
from .ops.rope import get_nd_rotary_pos_embed
from .parallel import ParallelConfig, make_mesh
from .utils.data_utils import align_to


def get_rotary_pos_embed(cfg: DiTConfig, vae_name: str, video_length: int,
                         height: int, width: int):
    """(reference: hyvideo/inference.py:450-495)."""
    info = parse_vae_name(vae_name)
    latent_t = info.latent_frames(video_length)
    lat_h, lat_w = height // info.spatial_ratio, width // info.spatial_ratio
    pt, ph, pw = cfg.patch_size
    sizes = (latent_t // pt, lat_h // ph, lat_w // pw)
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, sizes,
                                       theta=cfg.rope_theta)
    return cos, sin, sizes


class Inference:
    def __init__(self, args: InferenceArgs, vae, text_encoder, text_encoder_2,
                 transformer_params, transformer_cfg: DiTConfig,
                 mesh=None, pcfg: Optional[ParallelConfig] = None,
                 logger=None):
        self.args = args
        self.vae = vae
        self.text_encoder = text_encoder
        self.text_encoder_2 = text_encoder_2
        self.transformer_params = transformer_params
        self.transformer_cfg = transformer_cfg
        self.mesh = mesh
        self.pcfg = pcfg
        self.logger = logger

    # -- checkpoint resolution (reference: inference.py:279-354) --
    @staticmethod
    def resolve_dit_weight(args: InferenceArgs) -> Optional[Path]:
        if args.dit_weight:
            return Path(args.dit_weight)
        base = Path(args.model_base) / "hunyuan-video-t2v-720p/transformers"
        for cand in (f"pytorch_model_{args.load_key}.pt",
                     "mp_rank_00_model_states.pt"):
            p = base / cand
            if p.exists():
                return p
        return None

    @classmethod
    def from_pretrained(cls, pretrained_model_path: Optional[str] = None,
                        args: Optional[InferenceArgs] = None,
                        allow_random_init: bool = False, logger=None,
                        **kwargs):
        args = args or InferenceArgs()
        if pretrained_model_path is not None:
            args.model_base = str(pretrained_model_path)

        # warm-start every entry point: compiled executables persist across
        # processes (utils/compile_cache.py; the reference's eager CUDA
        # kernels never pay a compile, so cold-process compiles are a
        # TPU-only cost this removes after the first run)
        cache_dir = getattr(args, "compile_cache_dir", "auto")
        if cache_dir:
            from .utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(
                None if cache_dir == "auto" else cache_dir)

        if getattr(args, "mesh_shape", None):
            # "--mesh-shape dp:2,ulysses:2,ring:2" (sp: alias for ulysses)
            degrees = {"dp": 1, "ulysses": 1, "ring": 1}
            for part in args.mesh_shape.split(","):
                name, _, val = part.partition(":")
                name = {"sp": "ulysses"}.get(name.strip(), name.strip())
                if name not in degrees:
                    raise ValueError(f"Unknown mesh axis {name!r} in "
                                     f"--mesh-shape {args.mesh_shape!r}")
                degrees[name] = int(val)
            pcfg = ParallelConfig(dp_degree=degrees["dp"],
                                  ulysses_degree=degrees["ulysses"],
                                  ring_degree=degrees["ring"])
        else:
            pcfg = ParallelConfig(ulysses_degree=args.ulysses_degree,
                                  ring_degree=args.ring_degree)
        mesh = make_mesh(pcfg) if pcfg.world_size > 1 else None

        dtype = PRECISION_TO_TYPE[args.precision]
        cfg = load_dit_config(
            args.model, rope_theta=float(args.rope_theta),
            attn_mode=getattr(args, "attn_mode", "auto"),
            sta_window=tuple(getattr(args, "sta_window", (3, 3, 3))),
            sta_dense_double_blocks=getattr(args, "sta_dense_blocks", 0),
            sta_dense_single_blocks=getattr(args, "sta_dense_blocks", 0),
            mlp_chunk_tokens=getattr(args, "mlp_chunk_tokens", 8192))

        dit_npz = Path(args.model_base) / "dit.npz"
        dit_path = cls.resolve_dit_weight(args)
        if dit_npz.exists():
            # converted artifact (convert_checkpoints.py); fp8 leaves keep
            # their dtype, everything else casts to the requested precision
            from .utils.checkpoint import load_params_npz

            params = load_params_npz(str(dit_npz))
            params = jax.tree.map(
                lambda x: jnp.asarray(x) if x.dtype.kind == "V"
                or "float8" in str(x.dtype) else jnp.asarray(x, dtype),
                params)
        elif dit_path is not None:
            from .utils.checkpoint import (convert_dit_state_dict,
                                           load_torch_state_dict)

            sd = load_torch_state_dict(str(dit_path), args.load_key)
            params = convert_dit_state_dict(sd, cfg)
            params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        elif allow_random_init:
            params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype)
        else:
            raise FileNotFoundError(
                f"No DiT checkpoint under {args.model_base}; pass "
                f"--dit-weight or allow_random_init=True")
        if args.use_fp8:
            params = quantize_dit_params_fp8(params)
        if getattr(args, "use_int8", False):
            params = quantize_dit_params_int8(params)
        if getattr(args, "use_int4_modulation", False):
            from .ops.quantization import quantize_dit_params_int4_modulation

            params = quantize_dit_params_int4_modulation(params)

        vae_cfg = load_vae_config(args.vae)
        vae_dtype = PRECISION_TO_TYPE[args.vae_precision]
        vae_npz = Path(args.model_base) / "vae.npz"
        vae_path = Path(args.model_base) / "hunyuan-video-t2v-720p/vae/pytorch_model.pt"
        if vae_npz.exists():
            from .utils.checkpoint import load_params_npz

            vparams = jax.tree.map(jnp.asarray, load_params_npz(str(vae_npz)))
        elif vae_path.exists():
            from .utils.checkpoint import (convert_vae_state_dict,
                                           load_torch_state_dict)

            vsd = load_torch_state_dict(str(vae_path))
            vparams = convert_vae_state_dict(vsd, vae_cfg)
            vparams = jax.tree.map(lambda x: jnp.asarray(x), vparams)
        elif allow_random_init:
            vparams = init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        else:
            raise FileNotFoundError(f"No VAE checkpoint at {vae_path}")
        # fp16 storage like the reference; VAE compute upcasts per-op as
        # needed (reference: vae_precision fp16, hyvideo/config.py:64-69).
        # The mesh shards tiled encode/decode batches across all devices
        # (the reference runs the VAE replicated on every rank instead,
        # hyvideo/inference.py "Text encoders, VAE run replicated").
        vae = AutoencoderKLCausal3D(vae_cfg, vparams, dtype=vae_dtype,
                                    mesh=mesh)

        te_kwargs: Dict[str, Any] = dict(
            text_len=args.text_len, text_len_2=args.text_len_2,
            prompt_template=args.prompt_template,
            prompt_template_video=args.prompt_template_video,
            hidden_state_skip_layer=args.hidden_state_skip_layer,
            apply_final_norm=args.apply_final_norm,
            dtype=PRECISION_TO_TYPE[args.text_encoder_precision],
            mesh=mesh,  # tensor-parallel LLM tower over the same mesh
            # int8 storage tier: single-chip fit for the 8B tower
            # (llama.quantize_llama_params_int8); TP already shards it at
            # world_size > 1, so the tier matters on one chip
            llm_quant=getattr(args, "text_encoder_quant", None))
        # smaller tower configs (tests / distilled encoders)
        for key in ("llm_config", "clip_config"):
            if key in kwargs:
                te_kwargs[key] = kwargs.pop(key)
        llm_dir = Path(args.model_base) / "text_encoder"
        clip_dir = Path(args.model_base) / "text_encoder_2"
        if llm_dir.exists():
            te_kwargs["tokenizer_path"] = str(llm_dir)
        if clip_dir.exists():
            te_kwargs["tokenizer_path_2"] = str(clip_dir)
        # Model weights for the towers: converted .npz next to the HF dirs,
        # else random (encoders are swappable; see utils/checkpoint.py).
        for name, key in (("text_encoder.npz", "llm_params"),
                          ("text_encoder_2.npz", "clip_params")):
            p = Path(args.model_base) / name
            if p.exists():
                from .utils.checkpoint import load_params_npz

                te_kwargs[key] = load_params_npz(str(p))
        if not (llm_dir.exists() or "llm_params" in te_kwargs
                or allow_random_init):
            raise FileNotFoundError(f"No text encoder under {args.model_base}")
        text_encoder, text_encoder_2 = build_text_encoders(**te_kwargs)

        return cls(args, vae, text_encoder, text_encoder_2, params, cfg,
                   mesh=mesh, pcfg=pcfg, logger=logger)


class HunyuanVideoSampler(Inference):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.pipeline = self.load_diffusion_pipeline()
        self.default_negative_prompt = NEGATIVE_PROMPT

    def load_diffusion_pipeline(self, scheduler=None):
        """(reference: inference.py:411-448)."""
        if scheduler is None:
            scheduler = FlowMatchDiscreteScheduler(
                shift=self.args.flow_shift, reverse=self.args.flow_reverse,
                solver=self.args.flow_solver,
                use_linear_quadratic_schedule=
                self.args.use_linear_quadratic_schedule,
                linear_schedule_end=self.args.linear_schedule_end)
        return HunyuanVideoPipeline(
            vae=self.vae, text_encoder=self.text_encoder,
            text_encoder_2=self.text_encoder_2,
            transformer_params=self.transformer_params,
            transformer_cfg=self.transformer_cfg, scheduler=scheduler,
            precision=self.args.precision,
            vae_precision=self.args.vae_precision, args=self.args,
            mesh=self.mesh, pcfg=self.pcfg)

    def predict(
        self,
        prompt: Union[str, List[str]],
        height: int = 192,
        width: int = 336,
        video_length: int = 129,
        seed: Union[int, List[int], None] = None,
        negative_prompt: Optional[str] = None,
        infer_steps: int = 50,
        guidance_scale: float = 6.0,
        flow_shift: float = 5.0,
        embedded_guidance_scale: Optional[float] = None,
        batch_size: int = 1,
        num_videos_per_prompt: int = 1,
        **kwargs,
    ) -> Dict[str, Any]:
        """(reference: predict, inference.py:497-671)."""
        out_dict: Dict[str, Any] = {}

        # ---- seeds (reference :534-566) ----
        n_total = batch_size * num_videos_per_prompt
        if isinstance(seed, (int, np.integer)):
            seeds = [int(seed) + i for i in range(n_total)]
        elif seed is None:
            seeds = list(np.random.randint(0, 1_000_000, n_total))
        elif isinstance(seed, (list, tuple)):
            seeds = [int(s) for s in seed][:n_total]
            seeds += [seeds[-1] + i + 1 for i in range(n_total - len(seeds))]
        else:
            raise ValueError(f"Seed must be int, list or None, got {seed}")
        keys = [jax.random.PRNGKey(s) for s in seeds]
        out_dict["seeds"] = seeds

        # ---- sizes (reference :575-585) ----
        if video_length != 1 and (video_length - 1) % 4 != 0:
            raise ValueError(
                f"`video_length` has to be 1 or a multiple of 4 plus 1, "
                f"got {video_length}")
        target_height = align_to(height, 16)
        target_width = align_to(width, 16)
        out_dict["size"] = (target_height, target_width, video_length)

        if not isinstance(prompt, str):
            raise TypeError(f"`prompt` must be a string, got {type(prompt)}")
        prompt = [prompt.strip()]
        if negative_prompt is None or negative_prompt == "":
            negative_prompt = self.default_negative_prompt
        if not isinstance(negative_prompt, str):
            raise TypeError(
                f"`negative_prompt` must be a string, got {type(negative_prompt)}")
        negative_prompt = [negative_prompt.strip()]

        # ---- fresh scheduler with runtime shift (reference :609-614) ----
        scheduler = FlowMatchDiscreteScheduler(
            shift=flow_shift, reverse=self.args.flow_reverse,
            solver=self.args.flow_solver,
            use_linear_quadratic_schedule=
            self.args.use_linear_quadratic_schedule,
            linear_schedule_end=self.args.linear_schedule_end)
        self.pipeline.scheduler = scheduler

        # ---- RoPE ----
        cos, sin, (tt, th, tw) = get_rotary_pos_embed(
            self.transformer_cfg, self.args.vae, video_length,
            target_height, target_width)
        n_tokens = tt * th * tw

        from .utils.profiling import maybe_trace

        start = time.time()
        with maybe_trace(getattr(self.args, "profile_dir", None)):
            samples = self.pipeline(
                prompt=prompt[0] if len(prompt) == 1 else prompt,
                height=target_height, width=target_width,
                video_length=video_length,
                num_inference_steps=infer_steps,
                guidance_scale=guidance_scale,
                negative_prompt=negative_prompt[0],
                num_videos_per_prompt=num_videos_per_prompt,
                key=keys if len(keys) > 1 else keys[0],
                embedded_guidance_scale=embedded_guidance_scale,
                freqs_cis=(cos, sin),
                n_tokens=n_tokens,
                vae_ver=self.args.vae,
                enable_tiling=self.args.vae_tiling,
                data_type="video" if video_length > 1 else "image",
                scan_denoise=getattr(self.args, "scan_denoise", None),
                output_dtype=kwargs.pop("output_dtype", "float32"),
            ).videos
        gen_time = time.time() - start
        if self.logger:
            self.logger.info(f"Success, time: {gen_time}")

        out_dict["samples"] = samples
        out_dict["prompts"] = prompt
        out_dict["gen_time"] = gen_time
        return out_dict

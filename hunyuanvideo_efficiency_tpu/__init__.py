"""hunyuanvideo_efficiency_tpu — TPU-native (JAX/XLA/Pallas) rebuild of the
HunyuanVideo efficiency stack.

Top-level layout:
  ops/        low-level compute ops (norms, rope, causal conv3d, attention,
              Pallas kernels, fp8 quant)
  models/     DiT backbone, causal-3D VAE, text encoders
  diffusion/  flow-matching scheduler + T2V pipeline
  parallel/   mesh + sequence-parallel (Ulysses/ring) over ICI
  utils/      checkpoint conversion, video IO, helpers
  evaluation/ PSNR/SSIM/LPIPS/FVD metric stack
  data/       dataset preprocessing (mp4/YUV -> tensors)
"""

__version__ = "0.1.0"

_LAZY = {
    "HunyuanVideoSampler": ".inference",
    "Inference": ".inference",
    "HunyuanVideoPipeline": ".diffusion.pipeline",
    "FlowMatchDiscreteScheduler": ".diffusion.scheduler",
    "InferenceArgs": ".config",
    "parse_args": ".config",
    "TextEncoder": ".models.text",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

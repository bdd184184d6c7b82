"""VAE-only batch round-trip harness with t-ops config
(reference: infer.py:28-123 — the fork's experiment objective path).

Reads `.pt` video tensors, runs encode+decode through the Causal-3D VAE with
an optional temporal-ops experiment config (JSON, same schema as the
reference's t_ops_config.json), saves reconstructions as `.pt` (+ optional
mp4). `sample_posterior=False` (posterior mode), fp16 storage — matching the
reference's settings (:53-60, :104-112).
"""
import argparse
import os
import time

import numpy as np
from hunyuanvideo_efficiency_tpu.utils.logging import logger


def parse_args():
    p = argparse.ArgumentParser(
        description="VAE inference script for video tensors (TPU).")
    p.add_argument("--tensor-dir", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--vae-path", type=str,
                   default="ckpts/hunyuan-video-t2v-720p/vae")
    p.add_argument("--vae-type", type=str, default="884-16c-hy")
    p.add_argument("--vae-precision", type=str, default="fp16")
    p.add_argument("--config-json", type=str, default=None,
                   help="t-ops config JSON (reference t_ops_config.json schema)")
    p.add_argument("--max-files", type=int, default=None)
    p.add_argument("--mp4", action="store_true")
    p.add_argument("--enable-tiling", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard tiled encode/decode batches over all devices")
    p.add_argument("--random-init", action="store_true",
                   help="random VAE weights (smoke tests, no checkpoint)")
    return p.parse_args()


def load_vae(vae_type, vae_precision, vae_path, t_ops_config_path=None,
             test=False, random_init=False, logger=None, data_parallel=False):
    """(reference: hyvideo/vae/__init__.py:70-127). Returns
    (vae, path, spatial_ratio, time_ratio)."""
    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.constants import PRECISION_TO_TYPE
    from hunyuanvideo_efficiency_tpu.models.vae import (
        AutoencoderKLCausal3D, init_vae_params)
    from hunyuanvideo_efficiency_tpu.models.vae_config import (
        TOpsConfig, load_vae_config)

    cfg = load_vae_config(vae_type)
    tops = None
    if t_ops_config_path and test:
        tops = TOpsConfig.from_json(t_ops_config_path)
        if logger:
            logger.info(f"Applied t-ops config from {t_ops_config_path}")

    ckpt = os.path.join(vae_path, "pytorch_model.pt")
    if os.path.exists(ckpt):
        from hunyuanvideo_efficiency_tpu.utils.checkpoint import (
            convert_vae_state_dict, load_torch_state_dict)

        params = convert_vae_state_dict(load_torch_state_dict(ckpt), cfg)
        params = jax.tree.map(jnp.asarray, params)
    elif random_init:
        params = init_vae_params(jax.random.PRNGKey(0), cfg)
    else:
        raise FileNotFoundError(f"No VAE checkpoint at {ckpt}")

    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        from jax.sharding import Mesh

        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("vae_dp",))
        if logger:
            logger.info(f"VAE tile batches sharded over {devs.size} devices")
    vae = AutoencoderKLCausal3D(cfg, params, tops=tops,
                                dtype=PRECISION_TO_TYPE[vae_precision],
                                mesh=mesh)
    return vae, vae_path, cfg.spatial_compression_ratio, \
        cfg.time_compression_ratio


def infer_vae(vae, dataset, output_dir, max_files=None, mp4=False):
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.data.dataset_loader import save_tensor
    from hunyuanvideo_efficiency_tpu.data.mp42tensor import tensor_to_video

    os.makedirs(output_dir, exist_ok=True)
    for idx, (video, file_name) in enumerate(dataset):
        if max_files is not None and idx >= max_files:
            break
        name = file_name.replace(".pt", "")
        x = jnp.asarray(video)[None]  # [1, C, T, H, W]
        logger.info(f"Processing {name}, video shape: {x.shape}")
        t0 = time.time()
        recon = vae(x, sample_posterior=False)
        recon = np.asarray(recon, np.float32)[0]
        logger.info(f"  round-trip {time.time() - t0:.2f}s -> {recon.shape}")
        save_tensor(os.path.join(output_dir, f"{name}.pt"), recon)
        if mp4:
            tensor_to_video(recon, os.path.join(output_dir, f"{name}.mp4"))
    logger.info(f"Saved reconstructions to {output_dir}")


def main():
    args = parse_args()
    logger.info(f"Running inference with args: {args}")
    from hunyuanvideo_efficiency_tpu.data.dataset_loader import (
        VideoTensorDataset)

    vae, _, s_ratio, t_ratio = load_vae(
        args.vae_type, args.vae_precision, args.vae_path,
        t_ops_config_path=args.config_json, test=True,
        random_init=args.random_init, logger=logger,
        data_parallel=args.data_parallel)
    if args.enable_tiling:
        vae.enable_tiling()
    dataset = VideoTensorDataset(args.tensor_dir)
    infer_vae(vae, dataset, args.output_dir, max_files=args.max_files,
              mp4=args.mp4)


if __name__ == "__main__":
    main()

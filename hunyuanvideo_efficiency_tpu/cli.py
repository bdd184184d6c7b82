"""Console entry points (installed via pyproject [project.scripts])."""
from __future__ import annotations


def sample_main():
    """`hyvideo-sample` — the packaged equivalent of sample_video.py."""
    import os
    from datetime import datetime
    from pathlib import Path

    from .config import parse_args
    from .inference import HunyuanVideoSampler
    from .utils.file_utils import save_videos_grid
    from .utils.logging import logger

    args = parse_args()
    models_root_path = Path(args.model_base)
    if not models_root_path.exists():
        raise ValueError(f"`models_root` not exists: {models_root_path}")
    save_path = (args.save_path if args.save_path_suffix == ""
                 else f"{args.save_path}_{args.save_path_suffix}")
    os.makedirs(save_path, exist_ok=True)

    sampler = HunyuanVideoSampler.from_pretrained(
        str(models_root_path), args=args, logger=logger)
    outputs = sampler.predict(
        prompt=args.prompt, height=args.video_size[0],
        width=args.video_size[1], video_length=args.video_length,
        seed=args.seed, negative_prompt=args.neg_prompt,
        infer_steps=args.infer_steps, guidance_scale=args.cfg_scale,
        num_videos_per_prompt=args.num_videos, flow_shift=args.flow_shift,
        batch_size=args.batch_size,
        embedded_guidance_scale=args.embedded_cfg_scale)
    for i in range(len(outputs["samples"])):
        time_flag = datetime.now().strftime("%Y-%m-%d-%H:%M:%S")
        seed = outputs["seeds"][i] if i < len(outputs["seeds"]) else 0
        tag = outputs["prompts"][0][:100].replace("/", "")
        path = f"{save_path}/{time_flag}_seed{seed}_{tag}{args.name_suffix}.mp4"
        save_videos_grid(outputs["samples"][i:i + 1], path, fps=24)
        logger.info(f"Sample save to: {path}")


if __name__ == "__main__":
    sample_main()

"""CLI text-to-video sampling (reference: sample_video.py:12-58).

Same flag surface as the reference (`--prompt`, `--video-size`,
`--video-length`, `--infer-steps`, `--seed`, `--flow-shift`, ...); runs on
however many TPU chips `--ulysses-degree`/`--ring-degree` request (one host
process drives the whole mesh — no torchrun).
"""
import os
from datetime import datetime
from pathlib import Path

from hunyuanvideo_efficiency_tpu.utils.logging import logger

from hunyuanvideo_efficiency_tpu.config import parse_args
from hunyuanvideo_efficiency_tpu.inference import HunyuanVideoSampler
from hunyuanvideo_efficiency_tpu.utils.file_utils import save_videos_grid


def main():
    args = parse_args()
    print(args)
    models_root_path = Path(args.model_base)
    if not models_root_path.exists():
        raise ValueError(f"`models_root` not exists: {models_root_path}")

    save_path = (args.save_path if args.save_path_suffix == ""
                 else f"{args.save_path}_{args.save_path_suffix}")
    os.makedirs(save_path, exist_ok=True)

    sampler = HunyuanVideoSampler.from_pretrained(
        str(models_root_path), args=args, logger=logger)
    args = sampler.args

    outputs = sampler.predict(
        prompt=args.prompt,
        height=args.video_size[0],
        width=args.video_size[1],
        video_length=args.video_length,
        seed=args.seed,
        negative_prompt=args.neg_prompt,
        infer_steps=args.infer_steps,
        guidance_scale=args.cfg_scale,
        num_videos_per_prompt=args.num_videos,
        flow_shift=args.flow_shift,
        batch_size=args.batch_size,
        embedded_guidance_scale=args.embedded_cfg_scale,
    )
    samples = outputs["samples"]

    # single host process: always save (the reference gates on LOCAL_RANK 0,
    # sample_video.py:49 — there is one process per mesh here)
    for i, sample in enumerate(samples):
        sample = samples[i:i + 1]
        time_flag = datetime.fromtimestamp(
            datetime.now().timestamp()).strftime("%Y-%m-%d-%H:%M:%S")
        seed = outputs["seeds"][i] if i < len(outputs["seeds"]) else 0
        prompt_tag = outputs["prompts"][0][:100].replace("/", "")
        cur_save_path = (f"{save_path}/{time_flag}_seed{seed}_{prompt_tag}"
                         f"{args.name_suffix}.mp4")
        save_videos_grid(sample, cur_save_path, fps=24)
        logger.info(f"Sample save to: {cur_save_path}")


if __name__ == "__main__":
    main()

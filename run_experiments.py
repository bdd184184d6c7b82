"""Experiment sweep driver (replaces run_experiments_{pool,stride,buckets}.sh:
generate configs -> per-config VAE round-trip -> metrics -> ranking)."""
import argparse
import json

from hunyuanvideo_efficiency_tpu.utils.logging import logger

from hunyuanvideo_efficiency_tpu.experiments import rank_results, run_sweep


def main():
    p = argparse.ArgumentParser(description="t-ops experiment sweep (TPU)")
    p.add_argument("--tensor-dir", required=True,
                   help=".pt input tensors (mp42tensor output)")
    p.add_argument("--orig-dir", required=True,
                   help="ground-truth videos (mp4 or .pt) for metrics")
    p.add_argument("--out-base", required=True)
    p.add_argument("--mode", default="pool",
                   choices=["pool", "stride", "stride2"])
    p.add_argument("--cap", type=int, default=384)
    p.add_argument("--vae-path", default="ckpts/hunyuan-video-t2v-720p/vae")
    p.add_argument("--max-files", type=int, default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--rank-by", default="psnr",
                   choices=["psnr", "ssim", "lpips"])
    a = p.parse_args()

    results = run_sweep(a.tensor_dir, a.orig_dir, a.out_base, mode=a.mode,
                        cap=a.cap, vae_path=a.vae_path,
                        max_files=a.max_files, random_init=a.random_init,
                        logger=logger)
    ranked = rank_results(results, a.rank_by)
    table = [{"name": r.name, "psnr": r.metrics.mean_psnr,
              "ssim": r.metrics.mean_ssim, "lpips": r.metrics.mean_lpips,
              "seconds": r.seconds} for r in ranked]
    out = f"{a.out_base}/ranking_{a.rank_by}.json"
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    logger.info(f"Ranking written to {out}")
    for row in table[:10]:
        logger.info(row)


if __name__ == "__main__":
    main()

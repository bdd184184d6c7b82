"""Metric computation CLI (reference: evaluation/compute_metrics.py:18-161
serial and compute_metrics_threads.py:20-260 threaded over exp_* dirs).

Pairs original/reconstructed videos by filename (mp4 or .pt), computes
PSNR/SSIM (+ LPIPS when converted AlexNet weights are provided), writes a
timestamped metrics_<ts>.txt per directory.
"""
import argparse

from hunyuanvideo_efficiency_tpu.utils.logging import logger


def main():
    p = argparse.ArgumentParser(description="Video quality metrics (TPU)")
    p.add_argument("--orig-dir", required=True)
    p.add_argument("--recon-dir", required=True,
                   help="reconstruction dir, or a base containing exp_* dirs")
    p.add_argument("--experiments", action="store_true",
                   help="treat --recon-dir as a base of exp_* subdirs "
                        "(threaded, like compute_metrics_threads.py)")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--lpips-weights", type=str, default=None,
                   help=".npz from convert_lpips_weights")
    a = p.parse_args()

    lpips_params = None
    if a.lpips_weights:
        from hunyuanvideo_efficiency_tpu.evaluation import load_lpips_params

        lpips_params = load_lpips_params(a.lpips_weights)

    if a.experiments:
        from hunyuanvideo_efficiency_tpu.evaluation import (
            compute_metrics_experiments)

        results = compute_metrics_experiments(
            a.orig_dir, a.recon_dir, lpips_params=lpips_params,
            num_workers=a.num_workers)
        for name, dm in sorted(results.items()):
            lp = (f" lpips={dm.mean_lpips:.4f}"
                  if dm.mean_lpips is not None else "")
            logger.info(f"{name}: psnr={dm.mean_psnr:.3f} "
                        f"ssim={dm.mean_ssim:.4f}{lp}")
    else:
        from hunyuanvideo_efficiency_tpu.evaluation import compute_metrics_dir

        dm = compute_metrics_dir(a.orig_dir, a.recon_dir,
                                 lpips_params=lpips_params,
                                 max_frames=a.max_frames,
                                 num_workers=a.num_workers)
        lp = f" lpips={dm.mean_lpips:.4f}" if dm.mean_lpips is not None else ""
        logger.info(f"Average: psnr={dm.mean_psnr:.3f} "
                    f"ssim={dm.mean_ssim:.4f}{lp} "
                    f"({len(dm.pairs)} pairs)")


if __name__ == "__main__":
    main()

"""On-chip VAE tiled encode/decode timing at production resolution.

The experiment harness's actual workload (reference: infer.py:28-72) is the
tiled encode -> decode round-trip; this times each leg separately on the
real chip with `uniform_tiles` (single shared XLA program per leg).

Usage:
  python scripts/vae_bench.py [--height 544 --width 960 --frames 129]
      [--decode] [--dtype bf16]

Emits one JSON line per leg. Run serially with other TPU jobs (CLAUDE.md);
each tile program is far under the ~60 s on-device watchdog.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--frames", type=int, default=129)
    ap.add_argument("--decode", action="store_true",
                    help="also time tiled decode of the encoded latent")
    ap.add_argument("--warm", action="store_true",
                    help="re-run each leg on fresh input for a warm "
                         "(compile-free) time")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--decode-only", action="store_true",
                    help="skip the encode leg (decode a random latent)")
    ap.add_argument("--decode-tile-batch", type=int, default=1,
                    help="tiles per decode dispatch (uniform tiles): >1 "
                         "uses post-offload HBM headroom to cut dispatch "
                         "count and fill the chip")
    ap.add_argument("--encode-tile-batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hunyuanvideo_efficiency_tpu.models.vae import (
        AutoencoderKLCausal3D, init_vae_params)
    from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = VAEConfig()
    params = init_vae_params(jax.random.PRNGKey(0), cfg, dtype)
    vae = AutoencoderKLCausal3D(cfg, params, dtype=dtype)
    vae.enable_tiling(True)
    vae.uniform_tiles = True
    vae.decode_tile_batch = args.decode_tile_batch
    vae.encode_tile_batch = args.encode_tile_batch

    h, w, f = args.height, args.width, args.frames

    def sync(a):
        return float(jnp.asarray(a).ravel()[0])

    moments = None
    if not args.decode_only:
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, f, h, w),
                               jnp.float32, -1.0, 1.0)
        t0 = time.perf_counter()
        moments = vae.encode_moments(x)
        sync(moments)
        t_enc = time.perf_counter() - t0
        assert np.isfinite(np.asarray(moments, np.float32)).all()
        print(json.dumps({
            "metric": f"vae tiled encode {w}x{h}x{f}f uniform_tiles "
                      f"{args.dtype}",
            "value": round(t_enc, 2), "unit": "s (incl. compile)",
            "latent_shape": list(moments.shape)}), flush=True)
        if args.warm:
            x2 = x + 0.001
            sync(x2)
            t0 = time.perf_counter()
            sync(vae.encode_moments(x2))
            print(json.dumps({
                "metric": f"vae tiled encode {w}x{h}x{f}f warm",
                "value": round(time.perf_counter() - t0, 2), "unit": "s"}),
                flush=True)

    if args.decode or args.decode_only:
        if moments is not None:
            z = moments[:, :cfg.latent_channels]
        else:
            z = 0.5 * jax.random.normal(
                jax.random.PRNGKey(2),
                (1, cfg.latent_channels, (f - 1) // 4 + 1, h // 8, w // 8),
                jnp.float32)
        t0 = time.perf_counter()
        out = vae.decode(z)
        sync(out)
        t_dec = time.perf_counter() - t0
        assert np.isfinite(np.asarray(out, np.float32)).all()
        print(json.dumps({
            "metric": f"vae tiled decode {w}x{h}x{f}f uniform_tiles "
                      f"{args.dtype} tb={args.decode_tile_batch}",
            "value": round(t_dec, 2), "unit": "s (incl. compile)",
            "video_shape": list(out.shape)}), flush=True)
        if args.warm:
            z2 = z + 0.001
            sync(z2)
            t0 = time.perf_counter()
            sync(vae.decode(z2))
            print(json.dumps({
                "metric": f"vae tiled decode {w}x{h}x{f}f warm "
                          f"tb={args.decode_tile_batch}",
                "value": round(time.perf_counter() - t0, 2), "unit": "s"}),
                flush=True)


if __name__ == "__main__":
    main()

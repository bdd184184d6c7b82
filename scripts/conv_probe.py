"""On-chip probe: direct-3D vs temporally-chunked t2d causal conv.

The VAE decoder's heavy stages (256px tile, 128-512 ch, 3x3x3 kernels) route
through causal_conv3d impl="3d" today (the t2d decomposition materializes kt
full-tensor copies and OOMs). This probe times a third form — t2d over
temporal chunks, which bounds the copies to chunk-local slices while keeping
the 2D NHWC conv layout XLA:TPU tiles best — to decide the decode conv path.

Usage: python scripts/conv_probe.py  (run serially with other TPU jobs)
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from hunyuanvideo_efficiency_tpu.ops.conv3d import causal_conv3d


def t2d_chunked(x, kernel, bias=None, chunk=8):
    """Causal 3x3x3 conv as 2D convs over T-chunks (stride 1 only)."""
    kt, kh, kw, cin, cout = kernel.shape
    b, t, h, w, _ = x.shape
    xp = jnp.pad(x, [(0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                     (kw // 2, kw // 2), (0, 0)], mode="edge")
    hp, wp = xp.shape[2], xp.shape[3]
    outs = []
    for t0 in range(0, t, chunk):
        ln = min(chunk, t - t0)
        xs = xp[:, t0:t0 + ln + kt - 1]  # [B, ln+kt-1, Hp, Wp, Cin]
        acc = None
        for dt in range(kt):
            x2 = xs[:, dt:dt + ln].reshape(b * ln, hp, wp, cin)
            y2 = jax.lax.conv_general_dilated(
                x2, kernel[dt].astype(x.dtype), window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y2 if acc is None else acc + y2
        outs.append(acc.reshape(b, ln, h, w, cout))
    out = jnp.concatenate(outs, axis=1)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def bench(fn, x, kernel, label, reps=3):
    f = jax.jit(fn)
    out = f(x, kernel)
    float(out.ravel()[0])  # compile+sync
    times = []
    for i in range(reps):
        xi = x + jnp.bfloat16(i + 1)
        float(xi.ravel()[0])
        t0 = time.perf_counter()
        out = f(xi, kernel)
        float(out.ravel()[0])
        times.append(time.perf_counter() - t0)
    tt = min(times)
    flops = 2.0 * np.prod(kernel.shape[:4]) * np.prod(out.shape, dtype=float)
    print(f"{label}: {tt*1e3:8.1f} ms  {flops/tt/1e12:6.1f} TFLOP/s "
          f"(shape {tuple(x.shape)} k{tuple(kernel.shape[:3])}"
          f"x{kernel.shape[3]}->{kernel.shape[4]})", flush=True)
    return tt


def main():
    key = jax.random.PRNGKey(0)
    # on-chip numerics check: pallas kernel vs direct XLA conv
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    xs = jax.random.normal(k1, (1, 5, 16, 18, 128), jnp.bfloat16)
    ks = jax.random.normal(k2, (3, 3, 3, 128, 128), jnp.bfloat16) * 0.05
    ref = np.asarray(causal_conv3d(xs, ks, impl="3d"), np.float32)
    out = np.asarray(causal_conv3d(xs, ks, impl="pallas"), np.float32)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    print(f"pallas vs 3d on-chip max rel err: {err:.2e}", flush=True)
    assert err < 2e-2, "pallas conv numerics mismatch on device"

    shapes = [
        # (T, H, W, Cin, Cout) decoder-tile heavy stages, B=1
        (61, 256, 256, 128, 128),
        (31, 128, 128, 256, 256),
        (16, 64, 64, 512, 512),
    ]
    for (t, h, w, cin, cout) in shapes:
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (1, t, h, w, cin), jnp.bfloat16)
        kern = jax.random.normal(k2, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02
        bench(partial(causal_conv3d, impl="3d"), x, kern, "direct-3d   ")
        bench(partial(causal_conv3d, impl="pallas"), x, kern,
              "pallas-auto ")

        def pallas_hb(xx, kk, hb):
            from hunyuanvideo_efficiency_tpu.ops.conv3d_pallas import (
                conv3d_stride1_pallas)
            ww = xx.shape[3]
            w_out = -(-ww // 8) * 8
            wp = -(-(w_out + 2) // 8) * 8
            xp = jnp.pad(xx, [(0, 0), (2, 0), (1, 1),
                              (1, 1 + wp - ww - 2), (0, 0)], mode="edge")
            return conv3d_stride1_pallas(xp, kk, w_out,
                                         h_block=hb)[:, :, :, :ww]
        for hb in (8, 16, 32):
            if x.shape[2] % hb:
                continue
            try:
                bench(partial(pallas_hb, hb=hb), x, kern,
                      f"pallas-hb{hb:<3d}")
            except Exception as e:
                print(f"pallas-hb{hb}: FAILED ({type(e).__name__})",
                      flush=True)

        def pallas_v2(xx, kk, hb):
            from hunyuanvideo_efficiency_tpu.ops.conv3d_pallas import (
                conv3d_stride1_pallas_v2)
            ww = xx.shape[3]
            w_out = -(-ww // 8) * 8
            wp = -(-(w_out + 2) // 8) * 8
            xp = jnp.pad(xx, [(0, 0), (2, 0), (1, 1),
                              (1, 1 + wp - ww - 2), (0, 0)], mode="edge")
            return conv3d_stride1_pallas_v2(xp, kk, w_out,
                                            h_block=hb)[:, :, :, :ww]
        bench(partial(pallas_v2, hb=8), x, kern, "pallasv2-hb8")
        # v2 at hb=16 exceeds the VMEM scoped limit (slab + 3 widened
        # planes ~ 16.5 MB at W=256); hb=8 measured 58.0 TFLOP/s — slower
        # than v1 (see conv3d_pallas.py docstring), so v1 stays routed.
        print(flush=True)


if __name__ == "__main__":
    main()

"""Micro-benchmark: STA kernel vs dense flash at flagship shapes, on-chip.

Times ONE attention layer's joint img+txt attention (the unit `dit_forward`
dispatches per block) so kernel changes can be evaluated in minutes instead
of via full 13B step benchmarks. Reports wall time and effective TFLOP/s
computed from the *valid* sliding-window pairs of the actual tile plan.

Usage (serially, one TPU process at a time):
    python scripts/sta_kernel_bench.py 720 1280 129 [--dense] [--no-int8]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.ops.sta import (sta_joint_attention,
                                                     tile_plan, _ceil)

    h_px, w_px, frames = (int(a) for a in sys.argv[1:4])
    dense = "--dense" in sys.argv
    qk_int8 = "--no-int8" not in sys.argv
    tile = (4, 8, 8)
    window = (3, 3, 3)

    tt = (frames - 1) // 4 + 1
    th, tw = h_px // 16, w_px // 16
    grid = (tt, th, tw)
    s_img = tt * th * tw
    heads, d, lt, b = 24, 128, 256, 1
    block = tile[0] * tile[1] * tile[2]

    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    mk = lambda k, s: (jax.random.normal(k, s, jnp.float32) / (d ** 0.25)
                       ).astype(jnp.bfloat16)  # noqa: E731
    img_q = mk(ks[0], (b, s_img, heads, d))
    img_k = mk(ks[1], (b, s_img, heads, d))
    img_v = mk(ks[2], (b, s_img, heads, d))
    txt_q = mk(ks[3], (b, lt, heads, d))
    txt_k = mk(ks[4], (b, lt, heads, d))
    txt_v = mk(ks[5], (b, lt, heads, d))

    txt_pad = _ceil(lt, block) * block
    plan = tile_plan(grid, tile, window, txt_pad)
    n_valid = int((plan["nbr"] >= 0).sum())
    sta_flops = n_valid * 4.0 * block * block * d * heads
    dense_n = s_img + lt
    dense_flops = 4.0 * dense_n * dense_n * d * heads

    if dense:
        from hunyuanvideo_efficiency_tpu.ops.attention import joint_attention
        fn = jax.jit(lambda a, c, e, f, g, i: joint_attention(
            a, c, e, f, g, i, None, mode="flash"))
        flops = dense_flops
        label = "dense flash"
    else:
        sb = int(os.environ.get("STA_SLOT_BLOCK", 0)) or None
        hb = int(os.environ.get("STA_HEAD_BLOCK", 0)) or None
        rot = ("mega" if "--rotate-mega" in sys.argv else
               ("grouped" if "--rotate" in sys.argv else False))
        ring = "--ring" in sys.argv
        for a_ in sys.argv:
            if a_.startswith("--probe="):
                import hunyuanvideo_efficiency_tpu.ops.sta as sta_mod
                sta_mod._RING_PROBE = a_.split("=", 1)[1]
        fn = jax.jit(lambda a, c, e, f, g, i: sta_joint_attention(
            a, c, e, f, g, i, None, grid=grid, tile=tile, window=window,
            bound_mode="static", qk_int8=qk_int8, slot_block=sb,
            head_block=hb, lane_rotate=rot, ring=ring))
        flops = sta_flops
        label = (f"sta{'_int8' if qk_int8 else ''}"
                 f"{'_rotate_' + rot if rot else ''}{'_ring' if ring else ''}")

    out = fn(img_q, img_k, img_v, txt_q, txt_k, txt_v)
    img_o = out[0] if isinstance(out, tuple) else out
    probing = any(a.startswith("--probe=") for a in sys.argv)
    if not probing:  # probe variants emit non-softmax garbage by design
        assert np.isfinite(float(jnp.sum(img_o[0, :4].astype(jnp.float32))))

    times = []
    for i in range(5):
        qi = img_q + jnp.bfloat16(0.001 * (i + 1))
        float(qi.ravel()[0])
        t0 = time.perf_counter()
        out = fn(qi, img_k, img_v, txt_q, txt_k, txt_v)
        img_o = out[0] if isinstance(out, tuple) else out
        float(img_o[0, 0, 0] if img_o.ndim == 3 else img_o.ravel()[0])
        times.append(time.perf_counter() - t0)
    sec = min(times)
    print(f"{label} {w_px}x{h_px}x{frames}f S={s_img} "
          f"tiles={plan['n_tiles']} slots={plan['n_slots']} "
          f"valid_pairs={n_valid}: {sec * 1e3:.1f} ms  "
          f"{flops / sec / 1e12:.1f} TFLOP/s  "
          f"(x60 layers = {sec * 60:.1f} s/step attn)")


if __name__ == "__main__":
    main()

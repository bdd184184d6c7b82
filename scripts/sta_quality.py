"""STA quality proxy: dense vs sliding-tile attention on identical
params/inputs at production scale.

Real generation metrics (PSNR/LPIPS vs a dense render) need the released
checkpoints, which this environment cannot fetch; this proxies quality as
the output deviation of ONE full 13B forward under the same weights —
the quantity STA's sparsity actually perturbs. Reported per config:
relative L2 and per-token cosine similarity of the [B,C,T,H,W] outputs.

Usage: python scripts/sta_quality.py [--height 544 --width 960 --frames 129
         --dense-double 4 --dense-single 8]
Emits one JSON line; run serially with other TPU jobs (CLAUDE.md).
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
    ap.add_argument("--dense-double", type=int, default=4)
    ap.add_argument("--dense-single", type=int, default=8)
    ap.add_argument("--window", type=int, nargs=3, default=(3, 3, 3))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from bench import build_fp8_params
    from hunyuanvideo_efficiency_tpu.models.dit import dit_forward
    from hunyuanvideo_efficiency_tpu.models.dit_config import load_dit_config
    from hunyuanvideo_efficiency_tpu.ops.rope import (get_nd_rotary_pos_embed,
                                                      make_joint_freqs)

    h, w, f = args.height, args.width, args.frames
    big = h * w >= 720 * 1280
    base = dict(mlp_chunk_tokens=4096 if big else 8192,
                attn_head_chunks=4 if big else 1)
    cfg_dense = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="flash",
                                seq_pad_multiple=1024, **base)
    cfg_sta = load_dit_config(
        "HYVideo-T/2-cfgdistill", attn_mode="sta",
        sta_window=tuple(args.window),
        sta_dense_double_blocks=args.dense_double,
        sta_dense_single_blocks=args.dense_single, **base)

    params = build_fp8_params(cfg_dense, jnp.bfloat16, quant="int8",
                              quant_refiner=big, int4_modulation=big)

    t_lat, h_lat, w_lat = (f - 1) // 4 + 1, h // 8, w // 8
    tt, th, tw = t_lat, h_lat // 2, w_lat // 2
    lt = 256
    cos, sin = get_nd_rotary_pos_embed(cfg_dense.rope_dim_list, (tt, th, tw),
                                       theta=cfg_dense.rope_theta)
    cosj, sinj = make_joint_freqs(cos, sin, lt, cfg_dense.seq_pad_multiple)

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    x = jax.random.normal(ks[0], (1, 16, t_lat, h_lat, w_lat), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pe = jax.random.normal(ks[1], (1, lt, cfg_dense.text_states_dim),
                           jnp.bfloat16)
    mask = jnp.ones((1, lt), jnp.int32)
    pe2 = jax.random.normal(ks[2], (1, cfg_dense.text_states_dim_2),
                            jnp.bfloat16)
    guidance = jnp.full((1,), 6000.0, jnp.float32)

    outs = {}
    for name, cfg, (cc, ss) in [("dense", cfg_dense, (cosj, sinj)),
                                ("sta", cfg_sta, (cos, sin))]:
        fwd = jax.jit(partial(dit_forward, cfg=cfg))
        t0 = time.perf_counter()
        out = fwd(params, x, t, pe, mask, pe2, cc, ss, guidance)
        val = np.asarray(out, np.float32)
        print(f"# {name}: {time.perf_counter() - t0:.1f} s incl. compile",
              file=sys.stderr)
        assert np.isfinite(val).all(), f"{name} produced non-finite output"
        outs[name] = val

    a, b = outs["dense"].ravel(), outs["sta"].ravel()
    rel_l2 = float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12))
    cos_sim = float(np.dot(a, b)
                    / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))
    print(json.dumps({
        "metric": f"sta-vs-dense forward delta {w}x{h}x{f}f "
                  f"w{''.join(map(str, args.window))} "
                  f"dense{args.dense_double}+{args.dense_single}",
        "rel_l2": round(rel_l2, 4), "cosine": round(cos_sim, 6)}))


if __name__ == "__main__":
    main()

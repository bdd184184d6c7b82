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

Each forward runs in its own subprocess (--one): the 13B int8 weights are
~12.4 GB of HBM arguments, and two compiled programs' workspaces cannot
co-reside with them on a 15.75 GB chip (the dense+STA pair exceeds HBM by
~0.3 GB in one process). Outputs are compared host-side from .npy files.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")


def run_one(args, name, out_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from bench import build_fp8_params
    from hunyuanvideo_efficiency_tpu.models.dit import dit_forward_staged
    from hunyuanvideo_efficiency_tpu.models.dit_config import load_dit_config
    from hunyuanvideo_efficiency_tpu.ops.rope import (get_nd_rotary_pos_embed,
                                                      make_joint_freqs)

    h, w, f = args.height, args.width, args.frames
    big = h * w >= 720 * 1280
    base = dict(mlp_chunk_tokens=4096 if big else 8192,
                attn_head_chunks=4 if big else 1)
    # Both forwards run through the staged dispatch's pre-chunked form:
    # staged keeps per-program HBM temp low enough to coexist with the
    # 12.4 GB of int8 weights (one monolithic 13B forward no longer fits
    # beside them), and build_fp8_params cuts chunks at the STA
    # dense-anchor boundary so the anchors are honored exactly.
    dc, sc = 2, 4
    if name == "dense":
        cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="flash",
                              seq_pad_multiple=1024, **base)
    else:
        # Head grouping + finer MLP token chunking shrink the STA chunk
        # programs' working set so they fit beside the 12.4 GB of resident
        # weights. Both are pure schedule knobs with exact numerics
        # (test_sta_head_groups_match_ungrouped, test_mlp_chunk_tokens_exact).
        base["attn_head_chunks"] = max(4, base["attn_head_chunks"])
        base["mlp_chunk_tokens"] = min(4096, base["mlp_chunk_tokens"])
        cfg = load_dit_config(
            "HYVideo-T/2-cfgdistill", attn_mode="sta",
            seq_pad_multiple=1024, sta_window=tuple(args.window),
            sta_dense_double_blocks=args.dense_double,
            sta_dense_single_blocks=args.dense_single, **base)

    params = build_fp8_params(cfg, jnp.bfloat16, quant="int8",
                              quant_refiner=big, int4_modulation=big,
                              block_chunks=(dc, sc))
    # The flagship init zero-inits the adaLN modulation and final layers
    # (reference behavior), which makes every block an IDENTITY map at
    # init (gates are 0) — a random-weight forward would compare dense vs
    # STA on a path where attention never reaches the residual stream.
    # Randomize them (same fixed keys in both subprocesses) with small
    # magnitudes so the 60 gated residuals stay bounded.
    fk = jax.random.split(jax.random.PRNGKey(99), 2)
    for i, leaf in enumerate(("linear", "adaLN_modulation")):
        k = params["final_layer"][leaf]["kernel"]
        params["final_layer"][leaf]["kernel"] = (
            0.02 * jax.random.normal(fk[i], k.shape, k.dtype))

    # Random int8 codes generated host-side (a device fp32 intermediate of
    # the stacked [depth, h, 6h] modulation kernels would not fit next to
    # the resident weights); small constant scale keeps 60 gated residuals
    # bounded. Identical rng seed in both subprocesses.
    mod_rng = np.random.default_rng(123)
    for stacks in (params["double_blocks"], params["single_blocks"]):
        for tree in (stacks if isinstance(stacks, list) else [stacks]):
            for mk in ("modulation", "img_mod", "txt_mod"):
                if mk not in tree or "scale_out" not in tree[mk]:
                    continue
                k, s = tree[mk]["kernel"], tree[mk]["scale_out"]
                # dtype=int8 directly: the default int64 intermediate is
                # ~8 GB per stacked tree and thrashes the 1-core host
                codes = mod_rng.integers(-127, 128, k.shape, dtype=np.int8)
                tree[mk]["kernel"] = jnp.asarray(codes)
                tree[mk]["scale_out"] = jnp.full(s.shape, 2e-5, s.dtype)

    t_lat, h_lat, w_lat = (f - 1) // 4 + 1, h // 8, w // 8
    tt, th, tw = t_lat, h_lat // 2, w_lat // 2
    lt = 256
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (tt, th, tw),
                                       theta=cfg.rope_theta)
    if name == "dense":
        cos, sin = make_joint_freqs(cos, sin, lt, cfg.seq_pad_multiple)

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    x = jax.random.normal(ks[0], (1, 16, t_lat, h_lat, w_lat), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pe = jax.random.normal(ks[1], (1, lt, cfg.text_states_dim),
                           jnp.bfloat16)
    mask = jnp.ones((1, lt), jnp.int32)
    pe2 = jax.random.normal(ks[2], (1, cfg.text_states_dim_2),
                            jnp.bfloat16)
    guidance = jnp.full((1,), 6000.0, jnp.float32)

    sync = lambda a: jax.device_get(a.ravel()[0])  # noqa: E731
    fwd = partial(dit_forward_staged, cfg=cfg, double_chunks=dc,
                  single_chunks=sc, sync=sync)
    t0 = time.perf_counter()
    out = fwd(params, x, t, pe, mask, pe2, cos, sin, guidance)
    val = np.asarray(out, np.float32)
    print(f"# {name}: {time.perf_counter() - t0:.1f} s incl. compile",
          file=sys.stderr)
    assert np.isfinite(val).all(), f"{name} produced non-finite output"
    np.save(out_path, val)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--frames", type=int, default=129)
    ap.add_argument("--dense-double", type=int, default=4)
    ap.add_argument("--dense-single", type=int, default=8)
    ap.add_argument("--window", type=int, nargs=3, default=(3, 3, 3))
    ap.add_argument("--one", choices=("dense", "sta"), default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.one:
        run_one(args, args.one, args.out)
        return

    import numpy as np

    tmp = tempfile.mkdtemp(prefix="sta_quality_")
    outs = {}
    for name in ("dense", "sta"):
        path = os.path.join(tmp, f"{name}.npy")
        cmd = [sys.executable, __file__, "--one", name, "--out", path,
               "--height", str(args.height), "--width", str(args.width),
               "--frames", str(args.frames),
               "--dense-double", str(args.dense_double),
               "--dense-single", str(args.dense_single),
               "--window"] + [str(v) for v in args.window]
        # The tunnel relay can lag releasing the previous subprocess's
        # ~12.4 GB of weight buffers; give it time and retry on OOM.
        for attempt in range(3):
            if attempt:
                time.sleep(90)
            proc = subprocess.run(cmd, timeout=3600)
            if proc.returncode == 0:
                break
            print(f"# {name} attempt {attempt + 1} failed (rc "
                  f"{proc.returncode}); retrying", file=sys.stderr)
        else:
            raise SystemExit(f"{name} forward subprocess failed")
        outs[name] = np.load(path)
        time.sleep(30)

    a, b = outs["dense"].ravel(), outs["sta"].ravel()
    rel_l2 = float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12))
    cos_sim = float(np.dot(a, b)
                    / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))
    print(json.dumps({
        "metric": f"sta-vs-dense forward delta "
                  f"{args.width}x{args.height}x{args.frames}f "
                  f"w{''.join(map(str, args.window))} "
                  f"dense{args.dense_double}+{args.dense_single}",
        "rel_l2": round(rel_l2, 4), "cosine": round(cos_sim, 6)}))


if __name__ == "__main__":
    main()

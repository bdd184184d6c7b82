"""Ulysses/ring collective microbench — the measured-bytes backing for
docs/SCALING.md's 8-chip projection.

Times the EXACT collective pattern the sequence-parallel denoise runs per
attention layer (parallel/sp_attention.py): the Ulysses head-scatter /
seq-gather `lax.all_to_all` pair over q/k/v (+ the inverse on the output)
and the ring `ppermute` K/V rotation — at flagship shapes, inside
shard_map over the same mesh axes the pipeline uses. Reports bytes moved
per device per layer and the measured collective wall time.

On the virtual CPU mesh (--virtual) the timing is host-memcpy, not ICI —
the value is the BYTES table plus a harness that runs UNCHANGED on a real
v5e-8 slice the day hardware exists (then the time column becomes the
measured ICI cost and SCALING.md's 2.1–2.4 s projection gets replaced by
arithmetic on measured numbers).

    python scripts/usp_collective_bench.py --virtual [--mesh ulysses:8]
        [--config 720 1280 129]

Emits one JSON line per collective op.
(reference: xfuser's all-to-all/P2P inside xFuserLongContextAttention,
hyvideo/modules/attenion.py:159-212 — the NCCL path this replaces.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--mesh", default="ulysses:8")
    ap.add_argument("--config", nargs=3, type=int, default=[720, 1280, 129])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--head-dim", type=int, default=128)
    args = ap.parse_args()

    if args.virtual:
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform")]
        flags.append("--xla_force_host_platform_device_count=8")
        os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from functools import partial

    from hunyuanvideo_efficiency_tpu.parallel import (ParallelConfig,
                                                      make_mesh)

    degrees = {"dp": 1, "ulysses": 1, "ring": 1}
    for part in args.mesh.split(","):
        name, _, val = part.partition(":")
        degrees[name.strip()] = int(val)
    pcfg = ParallelConfig(dp_degree=degrees["dp"],
                          ulysses_degree=degrees["ulysses"],
                          ring_degree=degrees["ring"])
    mesh = make_mesh(pcfg)
    u, r = degrees["ulysses"], degrees["ring"]
    sp = u * r

    h_px, w_px, frames = args.config
    s_img = ((frames - 1) // 4 + 1) * (h_px // 16) * (w_px // 16)
    s_img -= s_img % sp  # the pipeline pads tokens to the sp degree
    heads, d, b = args.heads, args.head_dim, 1
    dtype = jnp.bfloat16

    x = jnp.zeros((b, s_img, heads, d), dtype)
    spec = P(None, ("ulysses", "ring"), None, None)

    def time_op(fn, in_specs, out_specs, *arrs, label, bytes_per_dev):
        f = jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False))
        out = f(*arrs)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*arrs)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        sec = min(times)
        rec = {"op": label, "mesh": args.mesh,
               "config": f"{w_px}x{h_px}x{frames}",
               "bytes_per_device": int(bytes_per_dev),
               "sec": round(sec, 6),
               "eff_GBps": round(bytes_per_dev / max(sec, 1e-9) / 1e9, 2),
               "backend": jax.default_backend(),
               "virtual": bool(args.virtual)}
        print(json.dumps(rec), flush=True)
        return sec

    results = {}
    if u > 1:
        # Ulysses head-scatter: [B, S/sp, H, D] -> [B, S/r, H/u, D].
        # Each device keeps 1/u of its data and exchanges (u-1)/u.
        def a2a(xl):
            return lax.all_to_all(xl, axis_name="ulysses", split_axis=2,
                                  concat_axis=1, tiled=True)

        shard_bytes = b * (s_img // sp) * heads * d * 2
        moved = shard_bytes * (u - 1) // u
        results["a2a_one"] = time_op(
            a2a, (spec,), spec, x, label="ulysses_all_to_all_1tensor",
            bytes_per_dev=moved)

        # the real per-layer pattern: q, k, v scattered + output gathered
        # = 4 all_to_alls of one [B, S/sp, H, D] tensor each
        def a2a_layer(q, k, v):
            qg, kg, vg = a2a(q), a2a(k), a2a(v)
            o = (qg + kg + vg) / 3.0  # stand-in for attention
            return lax.all_to_all(o, axis_name="ulysses", split_axis=1,
                                  concat_axis=2, tiled=True)

        results["a2a_layer"] = time_op(
            a2a_layer, (spec, spec, spec), spec, x, x, x,
            label="ulysses_layer_qkv_plus_out",
            bytes_per_dev=4 * moved)

    if r > 1:
        # ring K/V rotation: r-1 hops x 2 tensors of [B, S/sp*u?, ...] —
        # per hop each device sends its K and V shard to the neighbor
        def ring_pass(k, v):
            def hop(i, kv):
                kk, vv = kv
                perm = [(j, (j + 1) % r) for j in range(r)]
                return (lax.ppermute(kk, "ring", perm),
                        lax.ppermute(vv, "ring", perm))
            return lax.fori_loop(0, r - 1, hop, (k, v))

        shard_bytes = b * (s_img // sp) * heads * d * 2
        results["ring"] = time_op(
            ring_pass, (spec, spec), (spec, spec), x, x,
            label="ring_kv_rotation_full",
            bytes_per_dev=2 * shard_bytes * (r - 1))

    # per-step totals at 60 layers
    per_layer = results.get("a2a_layer", 0.0) + results.get("ring", 0.0)
    print(json.dumps({"op": "per_step_total_60_layers", "mesh": args.mesh,
                      "config": f"{w_px}x{h_px}x{frames}",
                      "sec": round(per_layer * 60, 4),
                      "backend": jax.default_backend(),
                      "virtual": bool(args.virtual)}), flush=True)


if __name__ == "__main__":
    main()

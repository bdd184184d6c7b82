"""Stage-level timing of sta_joint_attention at a flagship shape.

Separates (a) the Pallas STA kernel itself (pre-permuted inputs), (b) the
tile-major permute/pad/concat plumbing, (c) the static-bound norm
reductions, (d) the txt-query chunked attention — to find where the
176 ms/layer actually goes. One TPU process at a time.

Usage: python scripts/sta_stage_probe.py 720 1280 129
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    ref = out[0] if isinstance(out, tuple) else out
    import jax.numpy as jnp
    float(jnp.sum(ref.ravel()[:1].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        ref = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(ref.ravel()[:1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    import functools

    from hunyuanvideo_efficiency_tpu.ops import sta as S

    h_px, w_px, frames = (int(a) for a in sys.argv[1:4])
    tile, window = (4, 8, 8), (3, 3, 3)
    tt = (frames - 1) // 4 + 1
    grid = (tt, h_px // 16, w_px // 16)
    s_img = grid[0] * grid[1] * grid[2]
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

    txt_pad = S._ceil(lt, block) * block
    plan = S.tile_plan(grid, tile, window, txt_pad)
    n_slots = plan["n_slots"]
    nbr = jnp.asarray(plan["nbr"])
    scale = d ** -0.5

    # ---- full call
    full = jax.jit(functools.partial(
        S.sta_joint_attention, grid=grid, tile=tile, window=window,
        bound_mode="static", qk_int8=False))
    t_full = timeit(lambda: full(img_q, img_k, img_v, txt_q, txt_k, txt_v,
                                 None))
    print(f"full sta_joint_attention: {t_full * 1e3:8.1f} ms")

    # ---- full call with a precomputed analytic bound (the dit path)
    fullb = jax.jit(functools.partial(
        S.sta_joint_attention, grid=grid, tile=tile, window=window,
        bound_mode="static", qk_int8=False,
        score_bound=jnp.float32(d ** 0.5)))
    t_fullb = timeit(lambda: fullb(img_q, img_k, img_v, txt_q, txt_k,
                                   txt_v, None))
    print(f"full with analytic score_bound: {t_fullb * 1e3:8.1f} ms")

    # ---- plumbing only: permute q/k/v + pad/concat + unpermute a dummy
    @jax.jit
    def plumbing(q, k, v):
        qp = S._permute_tokens(q, grid, tile, plan)
        kp = S._permute_tokens(k, grid, tile, plan)
        vp = S._permute_tokens(v, grid, tile, plan)
        kcat = jnp.concatenate(
            [kp, jnp.zeros((b, txt_pad, heads * d), kp.dtype)], axis=1)
        vcat = jnp.concatenate(
            [vp, jnp.zeros((b, txt_pad, heads * d), vp.dtype)], axis=1)
        out = S._unpermute_tokens(qp + kcat[:, :qp.shape[1]]
                                  + vcat[:, :qp.shape[1]], grid, plan)
        return out
    t_plumb = timeit(lambda: plumbing(img_q, img_k, img_v))
    print(f"permute x3 + concat + unpermute: {t_plumb * 1e3:8.1f} ms")

    # ---- norm reductions
    @jax.jit
    def norms(q, k, tk):
        qn = jnp.max(jnp.sqrt(jnp.sum(
            jnp.square(q.astype(jnp.float32)), axis=-1)), axis=1)
        kn = jnp.maximum(
            jnp.max(jnp.sqrt(jnp.sum(
                jnp.square(k.astype(jnp.float32)), axis=-1)), axis=1),
            jnp.max(jnp.sqrt(jnp.sum(
                jnp.square(tk.astype(jnp.float32)), axis=-1)), axis=1))
        return qn * kn * scale
    t_norm = timeit(lambda: norms(img_q, img_k, txt_k))
    print(f"static-bound norms: {t_norm * 1e3:8.1f} ms")

    # ---- kernel only (pre-permuted static inputs)
    qp = jax.jit(lambda q: S._permute_tokens(q, grid, tile, plan))(img_q)
    kp = jax.jit(lambda q: S._permute_tokens(q, grid, tile, plan))(img_k)
    vp = jax.jit(lambda q: S._permute_tokens(q, grid, tile, plan))(img_v)
    kcat = jnp.concatenate(
        [kp, jnp.zeros((b, txt_pad, heads * d), kp.dtype)], axis=1)
    vcat = jnp.concatenate(
        [vp, jnp.zeros((b, txt_pad, heads * d), vp.dtype)], axis=1)
    kb = jnp.zeros((b, 8, kcat.shape[1]), jnp.float32)
    c = norms(img_q, img_k, txt_k)

    def kern(q):
        return S._sta_call_nomax(nbr, kb, q, kcat, vcat, c, heads,
                                 float(scale), block, n_slots, False, False)
    t_kern = timeit(lambda: kern(qp))
    n_valid = int((plan["nbr"] >= 0).sum())
    fl = n_valid * 4.0 * block * block * d * heads
    print(f"STA kernel alone: {t_kern * 1e3:8.1f} ms "
          f"({fl / t_kern / 1e12:.1f} TFLOP/s)")

    # ---- txt chunked attention
    from hunyuanvideo_efficiency_tpu.ops.attention import attention
    @jax.jit
    def txt_attn(tq, iq, ik, iv, tk, tv):
        k_all = jnp.concatenate([ik, tk], axis=1)
        v_all = jnp.concatenate([iv, tv], axis=1)
        return attention(tq, k_all, v_all, mode="chunked", scale=scale)
    t_txt = timeit(lambda: txt_attn(txt_q, img_q, img_k, img_v,
                                    txt_k, txt_v))
    print(f"txt chunked attention (+concat): {t_txt * 1e3:8.1f} ms")

    print(f"sum of stages: {(t_plumb + t_norm + t_kern + t_txt) * 1e3:8.1f}"
          f" ms vs full {t_full * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Per-program timing of one staged 720p denoise-step forward.

dit_forward_staged dispatches `double_chunks + single_chunks + 3` programs
and calls `sync` after each; wrapping sync with timestamps yields the
per-program breakdown of the measured step time (bench.py reports only the
total). Identifies where the gap between the measured step and the
int8-linear + STA FLOP floor lives.

Usage: python scripts/staged_step_probe.py [720 1280 129] [--reps 2]
Run serially with other TPU jobs (CLAUDE.md).
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    h, w, f = (int(a) for a in args[:3]) if len(args) >= 3 else (720, 1280,
                                                                 129)
    reps = 2

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_fp8_params
    from hunyuanvideo_efficiency_tpu.models.dit import dit_forward_staged
    from hunyuanvideo_efficiency_tpu.models.dit_config import load_dit_config
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    dc, sc = 4, 6
    big = h * w >= 720 * 1280
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="sta",
                          mlp_chunk_tokens=4096 if big else 8192,
                          seq_pad_multiple=1024,
                          attn_head_chunks=4 if big else 1)
    params = build_fp8_params(cfg, jnp.bfloat16, quant="int8",
                              quant_refiner=big, int4_modulation=big,
                              block_chunks=(dc, sc))

    t_lat, h_lat, w_lat = (f - 1) // 4 + 1, h // 8, w // 8
    tt, th, tw = t_lat, h_lat // 2, w_lat // 2
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (tt, th, tw),
                                       theta=cfg.rope_theta)
    lt = 256
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (1, 16, t_lat, h_lat, w_lat), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pe = jax.random.normal(ks[1], (1, lt, cfg.text_states_dim), jnp.bfloat16)
    mask = jnp.ones((1, lt), jnp.int32)
    pe2 = jax.random.normal(ks[2], (1, cfg.text_states_dim_2), jnp.bfloat16)
    guidance = jnp.full((1,), 6000.0, jnp.float32)

    stamps = []

    def sync(a):
        jax.device_get(a.ravel()[0])
        stamps.append(time.perf_counter())

    fwd = partial(dit_forward_staged, cfg=cfg, double_chunks=dc,
                  single_chunks=sc, sync=sync)
    out = fwd(params, x, t, pe, mask, pe2, cos, sin, guidance)  # compile
    assert np.isfinite(np.asarray(out[..., :1], np.float32)).all()

    n_prog = len(stamps)
    best = None
    for i in range(reps):
        stamps.clear()
        xi = x + jnp.bfloat16(i + 1)
        float(jnp.sum(xi[0, 0, 0, 0]))
        t0 = time.perf_counter()
        out = fwd(params, xi, t, pe, mask, pe2, cos, sin, guidance)
        float(out[0, 0, 0, 0, 0])
        tot = time.perf_counter() - t0
        durs = [stamps[0] - t0] + [stamps[j] - stamps[j - 1]
                                   for j in range(1, len(stamps))]
        durs.append(tot - (stamps[-1] - t0))  # final program (after last sync)
        if best is None or tot < best[0]:
            best = (tot, durs)
    tot, durs = best
    names = (["pre"] + [f"double[{j}]" for j in range(dc)]
             + [f"single[{j}]" for j in range(sc)] + ["final+unpatch"])
    if len(durs) != len(names):
        names = [f"prog{j}" for j in range(len(durs))]
    print(f"step total: {tot:.2f} s  ({n_prog} sync'd programs)")
    for nm, dd in zip(names, durs):
        print(f"  {nm:16s} {dd * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()

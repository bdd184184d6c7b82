"""Benchmark: sec/denoise-step of the flagship 13B MM-DiT on one TPU chip.

Measures one full denoise-step forward (BASELINE.json config 2:
"Single DiT denoise step, 129f x 544x960 latent, bf16, one chip") with the
complete HYVideo-T/2-cfgdistill architecture — hidden 3072, 24 heads,
20 double + 40 single blocks, token refiner, 3-axis RoPE, Pallas flash
attention — fp8(E4M3) weight storage with bf16 compute (the 13B bf16 weights
alone exceed one v5e's 16 GB HBM; the reference's fp8 mode is the same trade,
hyvideo/modules/fp8_optimization.py).

vs_baseline: the reference's derived 38.1 s/step is at 720p x 129f on one
80GB-class GPU (README.md:408-431). We scale that number by the matmul+attn
FLOP ratio between the two configs (both runs are compute-bound) to get the
reference-equivalent time at our benchmarked shape, then report
ref_time / our_time (>1 = faster than the reference per step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def model_flops(n_tokens: int, hidden: int, depth: int = 60) -> float:
    """Matmul+attention FLOPs for one DiT forward. Both double and single
    blocks cost ~24*N*h^2 (qkv/proj/mlp or fused linear1/linear2) + 4*N^2*h
    (QK^T and PV) — see SURVEY.md §2.1 shape contract."""
    return depth * (24.0 * n_tokens * hidden ** 2 + 4.0 * n_tokens ** 2 * hidden)


def build_fp8_params(cfg, dtype, quant="fp8", quant_refiner=False,
                     int4_modulation=False, block_chunks=(1, 1)):
    """Flagship param tree with block linears stored fp8 (per-block scales)
    or int8 (per-output-channel scales, W8A8 MXU compute path).

    Weights are random (benchmark measures speed, not quality); built one
    block at a time and stacked quantized so peak host/device memory stays
    low.
    """
    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.models.dit import (
        _double_block_init, _refiner_init, _single_block_init,
        _ts_embedder_init, _lin_init)
    from hunyuanvideo_efficiency_tpu.ops.quantization import (
        quantize_tensor_fp8, quantize_tensor_int4, quantize_tensor_int8)

    qfn = (quantize_tensor_int8 if quant == "int8"
           else lambda w: quantize_tensor_fp8(w, False))
    MOD_KEYS = ("modulation", "img_mod", "txt_mod")
    h = cfg.hidden_size
    pt, ph, pw = cfg.patch_size
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))

    def quant_block(p, name=None):
        if isinstance(p, dict):
            if "kernel" in p and p["kernel"].ndim >= 2:
                rest = {k: v for k, v in p.items() if k != "kernel"}
                if int4_modulation and name in MOD_KEYS:
                    return {**rest, **quantize_tensor_int4(p["kernel"])}
                return {**rest, **qfn(p["kernel"])}
            return {k: quant_block(v, k) for k, v in p.items()}
        return p

    @jax.jit
    def one_double(k):
        return quant_block(_double_block_init(k, cfg, dtype))

    @jax.jit
    def one_single(k):
        return quant_block(_single_block_init(k, cfg, dtype))

    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def insert(stacked, i, block):
        return jax.tree.map(lambda s, b: s.at[i].set(b), stacked, block)

    def build_stack(one_fn, keys, chunks=1, n_dense=0):
        """Incremental stacking with buffer donation: peak device memory is
        the final stacked tree + ONE block (13B bf16 would not fit).

        chunks>1 returns a LIST of stacked trees (for dit_forward_staged's
        pre-chunked param form) built directly at chunk granularity —
        re-slicing one big stack afterwards would transiently double the
        block weights in HBM. n_dense cuts the plan at the STA dense-anchor
        boundary (the same plan dit_forward_staged computes)."""
        from hunyuanvideo_efficiency_tpu.models.dit import _chunk_plan

        proto = jax.eval_shape(one_fn, keys[0])

        def build_range(kk):
            stacked = jax.tree.map(
                lambda s: jnp.zeros((len(kk),) + s.shape, s.dtype), proto)
            for i, k in enumerate(kk):
                stacked = insert(stacked, i, one_fn(k))
            return jax.block_until_ready(stacked)

        if chunks == 1:
            return build_range(keys)
        plan = _chunk_plan(len(keys), chunks, n_dense, cfg)
        return [build_range(keys[s0:s0 + ln]) for (s0, ln, _) in plan]

    dks = jax.random.split(next(ks), cfg.mm_double_blocks_depth)
    sks = jax.random.split(next(ks), cfg.mm_single_blocks_depth)

    params = {
        "img_in": _lin_init(next(ks), cfg.in_channels * pt * ph * pw, h, dtype),
        "time_in": _ts_embedder_init(next(ks), h, dtype),
        "vector_in": {
            "in_layer": _lin_init(next(ks), cfg.text_states_dim_2, h, dtype),
            "out_layer": _lin_init(next(ks), h, h, dtype)},
        "guidance_in": _ts_embedder_init(next(ks), h, dtype),
        "txt_in": (quant_block(_refiner_init(next(ks), cfg, dtype))
                   if quant_refiner
                   else _refiner_init(next(ks), cfg, dtype)),
        "final_layer": {
            "linear": _lin_init(next(ks), h, pt * ph * pw * cfg.out_channels,
                                dtype, zero=True),
            "adaLN_modulation": _lin_init(next(ks), h, 2 * h, dtype,
                                          zero=True)},
        "double_blocks": build_stack(one_double, dks, block_chunks[0],
                                     cfg.sta_dense_double_blocks),
        "single_blocks": build_stack(one_single, sks, block_chunks[1],
                                     cfg.sta_dense_single_blocks),
    }
    return params


def bench_step(height, width, frames, repeats=3, sta=False, int8=False,
               attn_int8=False, staged=None, sta_int8=False,
               int8_impl="xla", mlp_chunk=None, head_chunks=None):
    """staged: None = one monolithic jitted forward; (dc, sc) = host-driven
    chunked dispatch (dit_forward_staged) so every on-device program stays
    under the tunneled runtime's ~60 s watchdog — the only way a 720p x 129f
    step (~70 s monolithic) can execute on this backend. Reported time spans
    all programs of one step, synced by scalar readback after each."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from hunyuanvideo_efficiency_tpu.models.dit import (dit_forward,
                                                        dit_forward_staged,
                                                        set_int8_impl)
    from hunyuanvideo_efficiency_tpu.models.dit_config import load_dit_config

    set_int8_impl(int8_impl)

    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed

    attn = ("sta_int8" if sta_int8 else "sta" if sta
            else "flash_int8" if attn_int8 else "flash")
    big = height * width >= 720 * 1280
    cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode=attn,
                          mlp_chunk_tokens=mlp_chunk
                          or (4096 if big else 8192),
                          seq_pad_multiple=1024,
                          attn_head_chunks=(head_chunks if head_chunks
                                            else 2 if big else 1))
    # head_chunks at 720p: 4 -> 2 measured 16.77 -> 16.02 s/step (24-head
    # STA calls run ~12 ms/layer faster than 6-head ones; see
    # docs/KERNELS.md slot_block/head-group notes); 1 fails to compile
    # through the remote-compile helper (program too large).
    params = build_fp8_params(cfg, jnp.bfloat16,
                              quant="int8" if int8 else "fp8",
                              quant_refiner=big and int8,
                              int4_modulation=big,
                              block_chunks=staged or (1, 1))

    t_lat = (frames - 1) // 4 + 1
    h_lat, w_lat = height // 8, width // 8
    tt, th, tw = t_lat, h_lat // 2, w_lat // 2
    n_img = tt * th * tw
    lt = 256
    from hunyuanvideo_efficiency_tpu.ops.rope import make_joint_freqs

    cos, sin = get_nd_rotary_pos_embed(
        cfg.rope_dim_list, (tt, th, tw), theta=cfg.rope_theta)
    if not (sta or sta_int8):
        cos, sin = make_joint_freqs(cos, sin, lt, cfg.seq_pad_multiple)

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(ks[0], (1, 16, t_lat, h_lat, w_lat), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pe = jax.random.normal(ks[1], (1, lt, cfg.text_states_dim), jnp.bfloat16)
    mask = jnp.ones((1, lt), jnp.int32)
    pe2 = jax.random.normal(ks[2], (1, cfg.text_states_dim_2), jnp.bfloat16)
    guidance = jnp.full((1,), 6000.0, jnp.float32)

    if staged:
        sync = lambda a: jax.device_get(a.ravel()[0])  # noqa: E731
        fwd = partial(dit_forward_staged, cfg=cfg,
                      double_chunks=staged[0], single_chunks=staged[1],
                      sync=sync)
    else:
        fwd = jax.jit(partial(dit_forward, cfg=cfg))
    out = fwd(params, x, t, pe, mask, pe2, cos, sin, guidance)  # compile+warm
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # NOTE: block_until_ready does not reliably synchronize on the tunneled
    # TPU backend; a scalar device->host readback is the ground-truth sync.
    times = []
    for i in range(repeats):
        xi = x + jnp.bfloat16(i)  # fresh input defeats any result caching
        float(jnp.sum(xi[0, 0, 0, 0]))
        t0 = time.perf_counter()
        out = fwd(params, xi, t, pe, mask, pe2, cos, sin, guidance)
        float(out[0, 0, 0, 0, 0])  # sync
        times.append(time.perf_counter() - t0)
    return min(times), n_img + lt, cfg.hidden_size


# Reference derived baseline: 38.1 s/step at 720p x 129f (1 GPU),
# img tokens 33*45*80 = 118800 + 256 text.
REF_SEC = 38.1
REF_TOKENS = 118800 + 256


def run_one(height, width, frames, sta=False, int8=False, attn_int8=False,
            staged=None, sta_int8=False, int8_impl="xla", mlp_chunk=None,
            head_chunks=None):
    sec, n_tok, hidden = bench_step(height, width, frames, sta=sta, int8=int8,
                                    attn_int8=attn_int8, staged=staged,
                                    sta_int8=sta_int8, int8_impl=int8_impl,
                                    mlp_chunk=mlp_chunk,
                                    head_chunks=head_chunks)
    ref_equiv = REF_SEC * (model_flops(n_tok, hidden)
                           / model_flops(REF_TOKENS, hidden))
    tag = ((" sta8" if sta_int8 else " sta" if sta else "")
           + (" qk8" if attn_int8 else "")
           + (" staged" if staged else ""))
    print(json.dumps({
        "metric": f"sec/denoise-step 13B {'int8' if int8 else 'fp8'} "
                  f"{width}x{height}x{frames}f"
                  f"{tag} 1chip",
        "value": round(sec, 3),
        "unit": "s",
        "vs_baseline": round(ref_equiv / sec, 3),
    }))


def parse_mesh_spec(spec: str):
    """'dp:1,ulysses:8' / 'dp:2,ulysses:2,ring:2' -> ParallelConfig."""
    from hunyuanvideo_efficiency_tpu.parallel import ParallelConfig

    kv = dict(part.split(":") for part in spec.split(","))
    return ParallelConfig(dp_degree=int(kv.get("dp", 1)),
                          ulysses_degree=int(kv.get("ulysses", 1)),
                          ring_degree=int(kv.get("ring", 1)))


def run_mesh(spec: str, height=720, width=1280, frames=129, steps=5,
             virtual=False):
    """--mesh mode: the SAME bench JSON line, but through the sequence-
    parallel sharded denoise wired into the public pipeline
    (diffusion/pipeline.py:_denoise_sharded -> parallel/sp_dit.py).

    With --virtual (the only option until multi-chip TPU hardware is
    attached): an 8-device virtual CPU mesh drives a tiny-tower model —
    correctness-only certification that one flag away from real hardware
    the sharded path executes end-to-end. On a real multi-chip TPU it runs
    the full 13B int8 STA config and reports vs the reference's 8-GPU
    6.75 s/step (BASELINE.md:11-12, 337.58 s E2E / 50).
    """
    if virtual:
        import os

        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.diffusion.pipeline import (
        HunyuanVideoPipeline)
    from hunyuanvideo_efficiency_tpu.diffusion.scheduler import (
        FlowMatchDiscreteScheduler)
    from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
    from hunyuanvideo_efficiency_tpu.models.vae import (AutoencoderKLCausal3D,
                                                        init_vae_params)
    from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
    from hunyuanvideo_efficiency_tpu.parallel import make_mesh

    pcfg = parse_mesh_spec(spec)
    mesh = make_mesh(pcfg)

    if virtual:
        from hunyuanvideo_efficiency_tpu.models.dit_config import DiTConfig

        cfg = DiTConfig(hidden_size=128, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(8, 12, 12), text_states_dim=64,
                        text_states_dim_2=32, guidance_embed=True,
                        attn_mode="sdpa")
        params = init_dit_params(jax.random.PRNGKey(0), cfg)
        height, width, frames = 64, 128, 5
        vcfg = VAEConfig(block_out_channels=(32, 32, 64, 64),
                         layers_per_block=1)
        vae = AutoencoderKLCausal3D(
            vcfg, init_vae_params(jax.random.PRNGKey(1), vcfg))
    else:
        from hunyuanvideo_efficiency_tpu.models.dit_config import (
            load_dit_config)

        cfg = load_dit_config("HYVideo-T/2-cfgdistill", attn_mode="sta",
                              mlp_chunk_tokens=4096, seq_pad_multiple=1024,
                              attn_head_chunks=4)
        params = build_fp8_params(cfg, jnp.bfloat16, quant="int8",
                                  quant_refiner=True, int4_modulation=True)
        vcfg = VAEConfig()
        vae = AutoencoderKLCausal3D(
            vcfg, init_vae_params(jax.random.PRNGKey(1), vcfg,
                                  jnp.bfloat16), dtype=jnp.bfloat16)
        vae.uniform_tiles = True

    pipe = HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=params, transformer_cfg=cfg,
        scheduler=FlowMatchDiscreteScheduler(shift=7.0, reverse=True),
        mesh=mesh, pcfg=pcfg)

    t_lat = (frames - 1) // 4 + 1
    grid = (t_lat, height // 8 // 2, width // 8 // 2)
    freqs = get_nd_rotary_pos_embed(cfg.rope_dim_list, grid,
                                    theta=cfg.rope_theta)
    b, lt = pcfg.dp_degree, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    pe = jax.random.normal(ks[0], (b, lt, cfg.text_states_dim), jnp.float32)
    mask = jnp.ones((b, lt), jnp.int32)
    pe2 = jax.random.normal(ks[1], (b, cfg.text_states_dim_2), jnp.float32)

    def run():
        return pipe(prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
                    height=height, width=width, video_length=frames,
                    num_inference_steps=steps, guidance_scale=1.0,
                    embedded_guidance_scale=6.0, freqs_cis=freqs,
                    key=jax.random.PRNGKey(42), output_type="latent",
                    enable_tiling=not virtual)

    out = run()  # compile + warm
    assert np.isfinite(out.videos).all()
    t0 = time.perf_counter()
    out = run()
    assert np.isfinite(out.videos).all()
    sec = (time.perf_counter() - t0) / steps

    world = pcfg.world_size
    if virtual:
        print(json.dumps({
            "metric": f"sharded predict {spec} (virtual CPU mesh, "
                      "correctness-only)",
            "value": round(sec, 4), "unit": "s/step",
            "vs_baseline": 0.0}))
    else:
        # reference 8-GPU: 337.58 s E2E / 50 steps = 6.75 s/step
        ref = REF_SEC * (5.64 / 8 * world) ** -1 if world else REF_SEC
        print(json.dumps({
            "metric": f"sec/denoise-step 13B int8 sta {width}x{height}x"
                      f"{frames}f mesh {spec}",
            "value": round(sec, 3), "unit": "s",
            "vs_baseline": round(ref / sec, 3)}))


def probe_device(timeout_s: int = 600) -> bool:
    """Fast health check: a trivial matmul in a subprocess. The tunneled TPU
    backend hangs indefinitely (not errors) when the relay is down, so an
    unguarded bench attempt would burn its whole 1 h timeout; this bounds the
    no-hardware case to `timeout_s`."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "x = jnp.ones((128, 128));"
             "print('PROBE_OK', float((x @ x)[0, 0]))"],
            capture_output=True, text=True, timeout=timeout_s)
        return "PROBE_OK" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    """Try configs largest-first; each attempt runs in a fresh subprocess so
    a failed (OOM) attempt cannot strand HBM for the next one."""
    import subprocess

    if not probe_device():
        raise SystemExit(
            "bench: device unreachable (trivial matmul did not complete; "
            "TPU relay down?) — refusing to start 1h bench attempts")

    # largest-first; int8 W8A8 linears are the default compute path (fastest
    # measured). First attempt is the sliding-tile-attention step
    # (attn_mode=sta; the in-kernel int8-QK variant re-quantizes per fold
    # and measured 11 ms/layer SLOWER than bf16 once the kernel went wide,
    # so bf16 STA is the default) — at 720p attention is ~87% of step FLOPs,
    # and STA (arXiv 2502.04507, HunyuanVideo's own acceleration literature)
    # is what makes the step beat the reference's dense 38.1 s. The STA step
    # runs MONOLITHIC (17.8 s on-device fits the ~60 s watchdog; measured
    # vs 18.3 s staged — no dispatch gaps); the staged (4,6) variant is
    # attempt 2 in case a tighter runtime kills the single program. The
    # dense-flash step only runs staged (74.7 s monolithic would be killed;
    # vs_baseline 0.51, recorded in PARITY.md).
    # STA quality evidence: scripts/sta_quality_e2e.py measured 49.2 dB
    # PSNR / 0.99976 SSIM vs the dense 50-step trajectory (PARITY.md).
    attempts = [
        (720, 1280, 129, ["--int8", "--sta"]),
        (720, 1280, 129, ["--int8", "--sta", "--staged", "4", "6"]),
        (720, 1280, 129, ["--int8", "--staged", "4", "6"]),
        (544, 960, 129, ["--int8"]),
        (544, 960, 65, ["--int8"]),
        (384, 640, 129, ["--int8"]),
    ]
    for (hh, ww, ff, extra) in attempts:
        try:
            proc = subprocess.run(
                [sys.executable, __file__,
                 "--config", str(hh), str(ww), str(ff)] + extra,
                capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"bench config {ww}x{hh}x{ff} timed out after 3600s",
                  file=sys.stderr)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        print(f"bench config {ww}x{hh}x{ff} failed:\n"
              f"{proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else 'no stderr'}",
              file=sys.stderr)
    raise SystemExit("all bench configs failed")


if __name__ == "__main__":
    # every invocation (parent driver AND the per-config subprocess
    # attempts) warm-starts from the persistent compile cache
    from hunyuanvideo_efficiency_tpu.utils.compile_cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    if len(sys.argv) > 1 and sys.argv[1] == "--mesh":
        # e.g. `python bench.py --mesh dp:1,ulysses:8 --virtual` — the
        # sharded-predict bench (virtual CPU mesh: correctness-only;
        # real multi-chip TPU: the 8-GPU-baseline comparison, BASELINE.md)
        hh, ww, ff = 720, 1280, 129
        if "--config" in sys.argv:
            ci = sys.argv.index("--config")
            hh, ww, ff = (int(sys.argv[ci + 1]), int(sys.argv[ci + 2]),
                          int(sys.argv[ci + 3]))
        steps = 5
        if "--steps" in sys.argv:
            steps = int(sys.argv[sys.argv.index("--steps") + 1])
        run_mesh(sys.argv[2], height=hh, width=ww, frames=ff, steps=steps,
                 virtual="--virtual" in sys.argv)
    elif len(sys.argv) > 1 and sys.argv[1] == "--config":
        staged = None
        if "--staged" in sys.argv:
            si = sys.argv.index("--staged")
            staged = (int(sys.argv[si + 1]), int(sys.argv[si + 2]))
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sta="--sta" in sys.argv, int8="--int8" in sys.argv,
                attn_int8="--attn-int8" in sys.argv, staged=staged,
                sta_int8="--sta-int8" in sys.argv,
                int8_impl=("pallas" if "--int8-pallas" in sys.argv
                           else "xla"),
                mlp_chunk=(int(sys.argv[sys.argv.index("--mlp-chunk") + 1])
                           if "--mlp-chunk" in sys.argv else None),
                head_chunks=(int(sys.argv[sys.argv.index("--head-chunks") + 1])
                             if "--head-chunks" in sys.argv else None))
    else:
        main()

"""Sampler-level STA quality evidence: full fixed-seed 50-step denoise +
VAE decode, dense vs sliding-tile attention, on the randomized-weight 13B.

scripts/sta_quality.py measures a ONE-forward delta; this drives the whole
generation trajectory through the public pipeline (the quantity users see):
identical weights/seeds/schedule, the only difference is the attention
operator, and the decoded videos are compared with PSNR/SSIM/MS-SSIM —
including a dense-anchor sweep (sta_dense_blocks in {0, 2, 4} double
anchors, singles at 2x). LPIPS needs the AlexNet weights this zero-egress
environment cannot fetch; checkpoint-level quality metrics remain
env-blocked (PARITY.md).

Weights are random (the released checkpoints are unfetchable) but NOT
degenerate: the zero-init adaLN/final layers are re-randomized with the
same fixed keys in every arm, so all 60 blocks write through their gates
(see the random-weight gotcha in .claude/skills/verify/SKILL.md).

Each arm runs in its own subprocess (12.4 GB int8 weights + program
workspaces cannot co-reside twice on a 15.75 GB chip); decoded videos are
compared host-side from .npy files.

Usage: timeout 14400 python scripts/sta_quality_e2e.py [--steps 50]
Quant-tier sweep (identical real weights, fp8 vs int8 W8A8 vs
int8+int4-modulation, STA fixed): --arms qfp8 qint8 qint8i4
Run serially with other TPU jobs (CLAUDE.md). Emits one JSON line per arm.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

ARMS = {
    # name -> (attn_mode, dense_double, dense_single, quant, int4_mod)
    # STA-vs-dense sweep (identical int8 weights; r3/r4 measured table)
    "dense": ("flash", 0, 0, "int8", False),
    "sta0": ("sta", 0, 0, "int8", False),
    "sta2": ("sta", 2, 4, "int8", False),
    "sta4": ("sta", 4, 8, "int8", False),
    # Quantization-tier sweep (identical attention operator — STA, no
    # anchors; identical REAL base weights via build_fp8_params' fixed
    # key, each arm quantizing them with its own scheme; modulation
    # randomized in REAL space and re-quantized per arm). Anchor = qfp8
    # (the reference's own lossy tier, fp8_optimization.py:82-101); the
    # int8 W8A8 and int4-modulation arms are OUR headline tiers showing
    # their receipts against it.
    "qfp8": ("sta", 0, 0, "fp8", False),
    "qint8": ("sta", 0, 0, "int8", False),
    "qint8i4": ("sta", 0, 0, "int8", True),
}
QUANT_ARMS = ("qfp8", "qint8", "qint8i4")


def run_one(args, name, out_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_fp8_params
    from hunyuanvideo_efficiency_tpu.diffusion.pipeline import (
        HunyuanVideoPipeline)
    from hunyuanvideo_efficiency_tpu.diffusion.scheduler import (
        FlowMatchDiscreteScheduler)
    from hunyuanvideo_efficiency_tpu.models.dit_config import load_dit_config
    from hunyuanvideo_efficiency_tpu.models.vae import (AutoencoderKLCausal3D,
                                                        init_vae_params)
    from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
    from hunyuanvideo_efficiency_tpu.utils.compile_cache import (
        enable_compilation_cache)

    # arms run in fresh subprocesses; shared programs (VAE decode tiles,
    # identical-dtype denoise steps) warm-start from the persistent cache
    enable_compilation_cache()

    attn, dd, ds, quant, int4_mod = ARMS[name]
    h, w, f = args.height, args.width, args.frames
    big = h * w >= 720 * 1280
    dc, sc = 2, 4  # same staged dispatch in every arm (memory headroom)
    cfg = load_dit_config(
        "HYVideo-T/2-cfgdistill", attn_mode=attn, mlp_chunk_tokens=4096,
        seq_pad_multiple=1024, attn_head_chunks=4,
        sta_dense_double_blocks=dd, sta_dense_single_blocks=ds)
    t0 = time.perf_counter()

    # build the VAE FIRST and park its params on host: the 13 GB fp8 DiT
    # tree leaves no room for a co-resident VAE (measured
    # RESOURCE_EXHAUSTED at the denoise-phase VAE offload, r5); the
    # pipeline's sequential offload re-puts it for the decode phase
    vcfg = VAEConfig()
    vae = AutoencoderKLCausal3D(
        vcfg,
        jax.device_put(init_vae_params(jax.random.PRNGKey(1), vcfg,
                                       jnp.bfloat16),
                       jax.devices("cpu")[0]),
        dtype=jnp.bfloat16)
    vae.uniform_tiles = True
    # int4 modulation packing: on where the arm asks for it, else only
    # where HBM demands it (720p+)
    params = build_fp8_params(cfg, jnp.bfloat16, quant=quant,
                              quant_refiner=big,
                              int4_modulation=int4_mod or big,
                              block_chunks=(dc, sc))

    # identical re-randomization in every arm (see module docstring)
    fk = jax.random.split(jax.random.PRNGKey(99), 2)
    for i, leaf in enumerate(("linear", "adaLN_modulation")):
        k = params["final_layer"][leaf]["kernel"]
        params["final_layer"][leaf]["kernel"] = (
            0.02 * jax.random.normal(fk[i], k.shape, k.dtype))
    mod_rng = np.random.default_rng(123)
    if name in QUANT_ARMS:
        # quant-tier sweep: the SAME real-valued modulation weights in
        # every arm, quantized with the arm's own scheme — the decoded
        # delta vs the qfp8 anchor then measures exactly the tier's
        # numeric error over a full trajectory. The requant runs HOST-SIDE
        # in numpy (bit-matching ops/quantization.py): device-putting the
        # 4.5 GB fp32 real tree next to the resident 13 GB fp8 params
        # OOMs the chip (measured RESOURCE_EXHAUSTED, r5); the packed np
        # leaves ride onto the device with the first jitted call instead.
        import ml_dtypes

        def requant(wreal):  # np f32 [depth, kin, kout]
            if int4_mod:  # == quantize_tensor_int4
                amax = np.abs(wreal).max(axis=-2, keepdims=True)
                scale = np.maximum(amax, 1e-12) / 7.0
                q = np.clip(np.round(wreal / scale), -7, 7).astype(np.int8)
                low = q[..., 0::2] & 0xF
                high = q[..., 1::2] & 0xF
                return {"kernel_i4": (low | (high << 4)).astype(np.uint8),
                        "scale_out": scale.astype(np.float32)}
            if quant == "int8":  # == quantize_tensor_int8
                amax = np.abs(wreal).max(axis=-2, keepdims=True)
                scale = np.maximum(amax, 1e-12) / 127.0
                q = np.clip(np.round(wreal / scale), -127,
                            127).astype(np.int8)
                return {"kernel": q, "scale_out": scale.astype(np.float32)}
            # == quantize_tensor_fp8(stacked=True): per-block scales
            amax = np.abs(wreal).max(axis=(1, 2), keepdims=True)
            scale = np.maximum(amax, 1e-12) / 448.0
            q = np.clip(wreal / scale, -448.0, 448.0)
            return {"kernel": q.astype(ml_dtypes.float8_e4m3fn),
                    "scale": scale.astype(np.float32)}

        for stacks in (params["double_blocks"], params["single_blocks"]):
            for tree in (stacks if isinstance(stacks, list) else [stacks]):
                for mk in ("modulation", "img_mod", "txt_mod"):
                    if mk not in tree:
                        continue
                    kk = tree[mk].get("kernel", tree[mk].get("kernel_i4"))
                    depth, kin = kk.shape[0], kk.shape[1]
                    kout = (kk.shape[2] * 2 if "kernel_i4" in tree[mk]
                            else kk.shape[2])
                    # f32 draw (no f64 transient); one call per tree keeps
                    # the stream identical across arms
                    wreal = 0.003 * mod_rng.standard_normal(
                        (depth, kin, kout), dtype=np.float32)
                    rest = {k2: v for k2, v in tree[mk].items()
                            if k2 not in ("kernel", "kernel_i4", "scale",
                                          "scale_out")}
                    tree[mk] = {**rest, **requant(wreal)}
                    del wreal
    else:
        # STA-vs-dense sweep (int8 layout): randomize the int8 CODES
        # directly — identical in every arm of that sweep
        for stacks in (params["double_blocks"], params["single_blocks"]):
            for tree in (stacks if isinstance(stacks, list) else [stacks]):
                for mk in ("modulation", "img_mod", "txt_mod"):
                    if mk not in tree or "scale_out" not in tree[mk]:
                        continue
                    k, s = tree[mk]["kernel"], tree[mk]["scale_out"]
                    codes = mod_rng.integers(-127, 128, k.shape,
                                             dtype=np.int8)
                    tree[mk]["kernel"] = jnp.asarray(codes)
                    tree[mk]["scale_out"] = jnp.full(s.shape, 2e-5, s.dtype)
    print(f"# {name}: params in {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)

    pipe = HunyuanVideoPipeline(
        vae=vae, text_encoder=None, text_encoder_2=None,
        transformer_params=params, transformer_cfg=cfg,
        scheduler=FlowMatchDiscreteScheduler(shift=7.0, reverse=True),
        offload_transformer="free")
    del params

    t_lat = (f - 1) // 4 + 1
    tt, th, tw = t_lat, h // 8 // 2, w // 8 // 2
    freqs = get_nd_rotary_pos_embed(cfg.rope_dim_list, (tt, th, tw),
                                    theta=cfg.rope_theta)
    lt = 256
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    pe = jax.random.normal(ks[0], (1, lt, cfg.text_states_dim), jnp.bfloat16)
    mask = jnp.ones((1, lt), jnp.int32)
    pe2 = jax.random.normal(ks[1], (1, cfg.text_states_dim_2), jnp.bfloat16)

    t1 = time.perf_counter()

    def progress(i, latents):
        if (i + 1) % 10 == 0 or i < 2:
            print(f"# {name}: step {i + 1}/{args.steps} at "
                  f"{time.perf_counter() - t1:.1f} s", file=sys.stderr)

    out = pipe(
        prompt_embeds=pe, prompt_mask=mask, prompt_embeds_2=pe2,
        height=h, width=w, video_length=f,
        num_inference_steps=args.steps, guidance_scale=1.0,
        embedded_guidance_scale=6.0, freqs_cis=freqs,
        key=jax.random.PRNGKey(42), enable_tiling=True,
        scan_denoise=False, block_chunks=(dc, sc),
        progress_callback=progress)
    vid = np.asarray(out.videos, np.float32)
    print(f"# {name}: E2E {time.perf_counter() - t1:.1f} s",
          file=sys.stderr)
    assert vid.shape == (1, 3, f, h, w), vid.shape
    assert np.isfinite(vid).all(), f"{name} produced non-finite video"
    np.save(out_path, vid.astype(np.float16))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--frames", type=int, default=129)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--arms", nargs="+",
                    default=["dense", "sta0", "sta2", "sta4"],
                    choices=list(ARMS),
                    help="STA sweep by default; the quant-tier sweep is "
                         "--arms qfp8 qint8 qint8i4")
    ap.add_argument("--one", choices=list(ARMS), default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", default=None,
                    help="directory to keep the decoded .npy videos in")
    args = ap.parse_args()

    if args.one:
        run_one(args, args.one, args.out)
        return

    import numpy as np

    from hunyuanvideo_efficiency_tpu.evaluation.metrics import (ms_ssim,
                                                                psnr_video,
                                                                ssim_video)

    tmp = args.keep or tempfile.mkdtemp(prefix="sta_quality_e2e_")
    os.makedirs(tmp, exist_ok=True)
    paths = {}
    for name in args.arms:
        path = os.path.join(tmp, f"{name}.npy")
        paths[name] = path
        if os.path.exists(path):
            print(f"# {name}: reusing {path}", file=sys.stderr)
            continue
        cmd = [sys.executable, __file__, "--one", name, "--out", path,
               "--height", str(args.height), "--width", str(args.width),
               "--frames", str(args.frames), "--steps", str(args.steps)]
        for attempt in range(3):
            if attempt:
                time.sleep(90)  # let the relay release HBM
            proc = subprocess.run(cmd, timeout=7200)
            if proc.returncode == 0:
                break
            print(f"# {name} attempt {attempt + 1} failed "
                  f"(rc {proc.returncode}); retrying", file=sys.stderr)
        else:
            raise SystemExit(f"{name} arm subprocess failed")
        time.sleep(30)

    def to_thwc_u8(path):
        v = np.load(path).astype(np.float32)  # [1, C, T, H, W] in [0, 1]
        return (v.clip(0, 1) * 255).astype(np.uint8)[0].transpose(1, 2, 3, 0)

    # two sweep families, each with its own anchor: STA-vs-dense anchors
    # on the dense-flash arm; the quant-tier sweep anchors on qfp8 (the
    # reference's own lossy tier)
    for anchor, label in (("dense", "sta-vs-dense"),
                          ("qfp8", "quant-tier-vs-fp8")):
        members = [n for n in args.arms
                   if (n in QUANT_ARMS) == (anchor == "qfp8")]
        if anchor not in paths or len(members) < 2:
            continue
        a8 = to_thwc_u8(paths[anchor])
        for name in members:
            if name == anchor:
                continue
            b8 = to_thwc_u8(paths[name])
            print(json.dumps({
                "metric": f"{label} E2E {args.width}x{args.height}x"
                          f"{args.frames}f {args.steps}-step",
                "arm": name,
                "psnr_db": round(psnr_video(a8, b8), 3),
                "ssim": round(ssim_video(a8, b8), 5),
                # ms-ssim on every 8th frame (pure-numpy multiscale on a
                # 1-core host; psnr/ssim use the threaded C++ core)
                "ms_ssim": round(float(np.mean(
                    [ms_ssim(x, y) for x, y in zip(a8[::8], b8[::8])])), 5),
                "lpips": "env-blocked (AlexNet weights unfetchable)"}))


if __name__ == "__main__":
    main()

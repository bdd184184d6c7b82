"""Fine-tune the MM-DiT with flow matching on a .pt video/latent dataset.

The reference stack is inference-only (SURVEY.md §5.4) but ships training
checkpoints with dual `module`/`ema` weight sets (reference:
hyvideo/inference.py:279-354); this CLI produces those natively: a sharded
optax(AdamW) flow-matching loop over a dp x ulysses x ring mesh with EMA
tracking, orbax checkpointing, and resume.

Data: a directory of `.pt` tensors — either pixel videos `[C, T, H, W]` in
[-1, 1] (dataset_processor/mp42tensor.py format; encoded through the VAE
per batch) or precomputed latents `[16, T', H', W']` with `--latents`.

Text conditioning comes from precomputed embeddings (`--text-embeds` npz
with pe/mask/pe2) or a fixed random stand-in — the text towers are frozen
in fine-tuning, so embedding once is both faster and exact.

Example (smoke, CPU 8-device mesh):
    python train.py --toy --steps 3 --data-dir /path/to/latents --latents \
        --mesh-shape dp:2,ulysses:2,ring:2 --output-dir /tmp/run
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data-dir", required=True,
                   help=".pt tensor dir (videos, or latents with --latents)")
    p.add_argument("--latents", action="store_true",
                   help="data are VAE latents [16, T', H', W'] already")
    p.add_argument("--output-dir", default="train_outputs")
    p.add_argument("--model", default="HYVideo-T/2-cfgdistill")
    p.add_argument("--dit-weights", default=None,
                   help="npz/orbax DiT params (default: random init)")
    p.add_argument("--vae-weights", default=None,
                   help="npz VAE params (needed unless --latents)")
    p.add_argument("--text-embeds", default=None,
                   help="npz with pe [1,L,4096], mask [1,L], pe2 [1,768]")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=1,
                   help="global batch; must be divisible by dp degree")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--ema-decay", type=float, default=0.9999)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--mesh-shape", default=None,
                   help="e.g. dp:2,ulysses:2,ring:2 (default: all devices "
                        "on ulysses)")
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--resume", default=None,
                   help="checkpoint dir from a previous run")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--attn-mode", default="auto")
    p.add_argument("--toy", action="store_true",
                   help="tiny architecture (CI / smoke testing)")
    return p.parse_args(argv)


def parse_mesh_shape(spec, n_devices):
    from hunyuanvideo_efficiency_tpu.parallel import ParallelConfig

    if not spec:
        return ParallelConfig(ulysses_degree=n_devices)
    deg = {"dp": 1, "ulysses": 1, "ring": 1}
    for part in spec.split(","):
        k, v = part.split(":")
        deg[k.strip()] = int(v)
    return ParallelConfig(dp_degree=deg["dp"], ulysses_degree=deg["ulysses"],
                          ring_degree=deg["ring"])


def build_cfg(args):
    from hunyuanvideo_efficiency_tpu.models.dit_config import (
        DiTConfig, load_dit_config)

    if args.toy:
        return DiTConfig(
            hidden_size=128, heads_num=4, mm_double_blocks_depth=2,
            mm_single_blocks_depth=2, rope_dim_list=(8, 12, 12),
            text_states_dim=64, text_states_dim_2=32, guidance_embed=True,
            attn_mode="sdpa")
    return load_dit_config(args.model, attn_mode=args.attn_mode)


def load_batch(dataset, idxs, args, vae):
    """Stack a batch of latents [B, 16, T', H', W'] from the dataset."""
    import jax.numpy as jnp

    arrs = []
    for i in idxs:
        arr, _ = dataset[int(i) % len(dataset)]
        arrs.append(np.asarray(arr, np.float32))
    x = np.stack(arrs)
    if args.latents:
        return jnp.asarray(x)
    z = vae.encode(jnp.asarray(x)).mode()
    return (z * vae.cfg.scaling_factor).astype(jnp.float32)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from hunyuanvideo_efficiency_tpu.data.dataset_loader import (
        VideoTensorDataset)
    from hunyuanvideo_efficiency_tpu.models.dit import init_dit_params
    from hunyuanvideo_efficiency_tpu.ops.rope import get_nd_rotary_pos_embed
    from hunyuanvideo_efficiency_tpu.parallel import ParallelConfig, make_mesh
    from hunyuanvideo_efficiency_tpu.training import make_sp_train_step_optax
    from hunyuanvideo_efficiency_tpu.utils.orbax_io import (
        load_params_orbax, save_params_orbax)

    pcfg = parse_mesh_shape(args.mesh_shape, len(jax.devices()))
    mesh = make_mesh(pcfg)
    cfg = build_cfg(args)
    if args.batch_size % pcfg.dp_degree:
        raise ValueError(f"--batch-size {args.batch_size} not divisible by "
                         f"dp degree {pcfg.dp_degree}")

    key = jax.random.PRNGKey(args.seed)
    k_init, k_loop = jax.random.split(key)

    # ---- params ----
    if args.dit_weights:
        from hunyuanvideo_efficiency_tpu.utils.checkpoint import (
            load_params_npz)

        if os.path.isdir(args.dit_weights):
            params = load_params_orbax(args.dit_weights)
        else:
            params = load_params_npz(args.dit_weights)
        params = jax.tree.map(jnp.asarray, params)
    else:
        params = init_dit_params(k_init, cfg, jnp.bfloat16)

    # ---- VAE (only to encode pixel videos) ----
    vae = None
    if not args.latents:
        from hunyuanvideo_efficiency_tpu.models.vae import (
            AutoencoderKLCausal3D, init_vae_params)
        from hunyuanvideo_efficiency_tpu.models.vae_config import VAEConfig

        vcfg = VAEConfig()
        if args.vae_weights:
            from hunyuanvideo_efficiency_tpu.utils.checkpoint import (
                load_params_npz)

            vparams = load_params_npz(args.vae_weights)
        else:
            vparams = init_vae_params(jax.random.PRNGKey(7), vcfg,
                                      jnp.float32)
        vae = AutoencoderKLCausal3D(vcfg, vparams, dtype=jnp.float32)

    dataset = VideoTensorDataset(args.data_dir)
    if len(dataset) == 0:
        raise ValueError(f"no .pt tensors under {args.data_dir}")

    # ---- probe one sample for the latent grid / RoPE ----
    z0 = load_batch(dataset, [0], args, vae)
    _, c, t_lat, h_lat, w_lat = z0.shape
    pt, ph, pw = cfg.patch_size
    tt, th, tw = t_lat // pt, h_lat // ph, w_lat // pw
    if th % pcfg.sp_degree:
        raise ValueError(
            f"latent H patch axis {th} not divisible by sp degree "
            f"{pcfg.sp_degree} (reference has the same constraint, "
            f"hyvideo/inference.py:57-64)")
    cos, sin = get_nd_rotary_pos_embed(cfg.rope_dim_list, (tt, th, tw),
                                       theta=cfg.rope_theta)
    d = cos.shape[-1]
    cos_g = cos.reshape(tt, th, tw, d)
    sin_g = sin.reshape(tt, th, tw, d)

    # ---- text conditioning (frozen towers -> precomputed embeddings) ----
    lt = 16 if args.toy else 256
    if args.text_embeds:
        te = np.load(args.text_embeds)
        pe1, mask1, pe21 = (jnp.asarray(te["pe"]), jnp.asarray(te["mask"]),
                            jnp.asarray(te["pe2"]))
    else:
        ks = jax.random.split(jax.random.PRNGKey(11), 2)
        pe1 = jax.random.normal(ks[0], (1, lt, cfg.text_states_dim),
                                jnp.float32)
        mask1 = jnp.ones((1, lt), jnp.int32)
        pe21 = jax.random.normal(ks[1], (1, cfg.text_states_dim_2),
                                 jnp.float32)
    b = args.batch_size
    pe = jnp.tile(pe1, (b, 1, 1))
    mask = jnp.tile(mask1, (b, 1))
    pe2 = jnp.tile(pe21, (b, 1))

    # ---- optimizer / step ----
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(args.lr, weight_decay=args.weight_decay))
    step_fn, init_fn = make_sp_train_step_optax(
        mesh, cfg, pcfg, optimizer,
        ema_decay=None if args.no_ema else args.ema_decay)
    state = init_fn(params)
    start = 0
    if args.resume:
        from hunyuanvideo_efficiency_tpu.parallel.mesh import replicated

        rep = replicated(mesh)

        def restore(sub, target=None):
            tree = load_params_orbax(os.path.join(args.resume, sub),
                                     target=target)
            return jax.device_put(tree, rep)

        params = restore("module")
        state["opt_state"] = restore("opt_state", target=state["opt_state"])
        if state["master"] is not None:
            master_path = os.path.join(args.resume, "master")
            if os.path.exists(master_path):
                state["master"] = restore("master")
            else:  # old checkpoint without a master copy: rebuild from module
                state["master"] = jax.device_put(
                    jax.tree.map(lambda p: p.astype(jnp.float32), params),
                    rep)
        ema_path = os.path.join(args.resume, "ema")
        if state["ema"] is not None and os.path.exists(ema_path):
            state["ema"] = restore("ema")
        meta = json.load(open(os.path.join(args.resume, "meta.json")))
        start = int(meta["step"])
        state["step"] = jnp.asarray(start, jnp.int32)

    os.makedirs(args.output_dir, exist_ok=True)

    def save(step_i, params, state):
        ck = os.path.join(args.output_dir, f"step_{step_i:07d}")
        save_params_orbax(os.path.join(ck, "module"), params)
        save_params_orbax(os.path.join(ck, "opt_state"), state["opt_state"])
        if state["master"] is not None:
            save_params_orbax(os.path.join(ck, "master"), state["master"])
        if state["ema"] is not None:
            save_params_orbax(os.path.join(ck, "ema"), state["ema"])
        with open(os.path.join(ck, "meta.json"), "w") as f:
            json.dump({"step": step_i, "model": args.model,
                       "toy": args.toy}, f)
        return ck

    # ---- loop ----
    losses = []
    for i in range(start, args.steps):
        k_loop, k_b, k_n, k_t = jax.random.split(k_loop, 4)
        idxs = jax.random.randint(k_b, (b,), 0, len(dataset))
        x0 = load_batch(dataset, np.asarray(idxs), args, vae)
        noise = jax.random.normal(k_n, x0.shape, jnp.float32)
        t = jax.random.uniform(k_t, (b,), jnp.float32)
        t0 = time.time()
        params, state, loss = step_fn(params, state, x0, noise, t,
                                      pe, mask, pe2, cos_g, sin_g)
        loss = float(loss)
        losses.append(loss)
        print(f"step {i + 1}/{args.steps} loss {loss:.5f} "
              f"({time.time() - t0:.2f}s)", flush=True)
        if (i + 1) % args.save_every == 0 or (i + 1) == args.steps:
            ck = save(i + 1, params, state)
            print(f"saved {ck}", flush=True)
    return losses


if __name__ == "__main__":
    main()

"""Pallas TPU implicit-GEMM kernel for the VAE's stride-1 CausalConv3d.

XLA's native 3D convolution lowering reaches only 26-52 TFLOP/s on the
decoder's heavy stages (measured via scripts/conv_probe.py: 45.7 TFLOP/s at
[1,61,256,256,128]x3x3x3, 26.5 at [1,16,64,64,512] — 13-27% of v5e bf16
peak), and the t2d shift-decomposition is no better. This kernel formulates
the conv as 27 MXU matmuls per output tile with all input reuse kept in
VMEM:

* Grid (B, Cout/NB, T_out, H_out/HB). Each step produces an output tile
  [HB, W, NB] for one frame.
* The input stays in HBM (`memory_space=ANY`); each step DMAs the
  (kt, HB+kh-1, Wp, Cin) halo slab it needs into a VMEM scratch buffer
  (BlockSpec index maps cannot express overlapping halo blocks).
* For each temporal tap dt, the kw width taps are folded into the
  contraction dim: one widened plane [HB+kh-1, W_out, kw*Cin] is built
  from kw sublane-shifted bf16 copies, then each dh tap is a single
  [HB*W_out, kw*Cin] @ [kw*Cin, NB] dot with fp32 accumulation. W_out is
  pre-padded to a multiple of 8 so the row merge is a free re-tiling.
  (A first version did kt*kh*kw small K=Cin dots plus as many unaligned
  fp32 shift-adds; its 27 MXU pipeline fills + ~27 MB/step of VPU
  relayout capped it at 55 TFLOP/s.)
* The kernel weight slice [kt, kh, kw*Cin, NB] lives in VMEM and is
  re-fetched only when the Cout block changes (second-slowest grid dim).

Per step at the 128-ch stage: ~12 us of MXU work vs ~2.5 us of DMA, so the
kernel is MXU-bound where XLA's conv was not.

Used by ops.conv3d.causal_conv3d(impl="auto") for large stride-1 kernels
with MXU-friendly channel counts; everything else keeps the XLA path.
(reference: hyvideo/vae/unet_causal_3d_blocks.py:49-75 CausalConv3d — the
op this accelerates; the causal replicate padding semantics live in the
caller.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Tests set this True to run the kernel (and causal_conv3d's routing to it)
# in Pallas interpreter mode on CPU. Read at trace time.
INTERPRET_OVERRIDE = False


def _conv_kernel(x_hbm, k_ref, o_ref, slab, xw, sem, *, kt, kh, kw, hb,
                 w_out, wp, nb):
    b = pl.program_id(0)
    t = pl.program_id(2)
    h = pl.program_id(3)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t, kt), pl.ds(h * hb, hb + kh - 1)], slab, sem)
    dma.start()
    dma.wait()
    cin = x_hbm.shape[-1]
    acc = jnp.zeros((hb * w_out, nb), jnp.float32)
    for dt in range(kt):
        # Fold the kw width taps into the contraction dim: the xw scratch
        # holds one widened plane [rows, w_out, kw*Cin] per temporal tap
        # (kw sublane-shifted bf16 stores, done once), then each dh tap is
        # a single matmul with K = kw*Cin. This replaces kt*kh*kw small
        # K=Cin dots + as many unaligned fp32 shift-adds (the first
        # version's bottleneck: 27 MXU pipeline fills + ~27 MB of VPU
        # relayout per step capped it at 55 TFLOP/s). Scratch stores (not
        # jnp.concatenate) because Mosaic cannot concat operands with
        # mismatched sublane offsets.
        for dw in range(kw):
            xw[:, :, dw * cin:(dw + 1) * cin] = slab[dt, :, dw:dw + w_out]
        for dh in range(kh):
            xm = xw[dh:dh + hb].reshape(hb * w_out, kw * cin)
            acc += jnp.dot(xm, k_ref[dt, dh],
                           preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.reshape(hb, w_out, nb).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("w_out", "h_block", "n_block", "interpret"))
def conv3d_stride1_pallas(xp: jnp.ndarray, kernel: jnp.ndarray,
                          w_out: int, h_block: int = 8, n_block: int = 128,
                          interpret: bool = False) -> jnp.ndarray:
    """Stride-1 3D conv of a PRE-PADDED input.

    xp: [B, T+kt-1, H+kh-1, Wp, Cin], kernel: [kt, kh, kw, Cin, Cout].
    Returns [B, T, H, w_out, Cout]. Both Wp and w_out must be multiples
    of 8 with Wp >= w_out + kw - 1 (Mosaic requires the VMEM slab's
    logical width tiling-aligned, and an aligned w_out keeps the
    in-kernel [HB, w_out, kw*Cin] -> [HB*w_out, kw*Cin] reshape a free
    re-tiling) — so callers over-pad W on the right and crop the returned
    width back to their true W.
    """
    kt, kh, kw, cin, cout = kernel.shape
    b, tp, hp, wp, _ = xp.shape
    t_out, h_out = tp - kt + 1, hp - kh + 1
    if h_out % h_block:
        raise ValueError(f"H_out {h_out} not divisible by h_block {h_block}")
    if w_out % 8 or wp % 8 or wp < w_out + kw - 1:
        raise ValueError(f"need Wp ({wp}) and w_out ({w_out}) multiples of "
                         f"8 with Wp >= w_out+kw-1")
    if cout % n_block:
        raise ValueError(f"Cout {cout} not divisible by n_block {n_block}")
    n_n = cout // n_block

    out = pl.pallas_call(
        functools.partial(_conv_kernel, kt=kt, kh=kh, kw=kw, hb=h_block,
                          w_out=w_out, wp=wp, nb=n_block),
        grid=(b, n_n, t_out, h_out // h_block),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kt, kh, kw * cin, n_block),
                         lambda bb, n, t, h: (0, 0, 0, n)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_block, w_out, n_block),
            lambda bb, n, t, h: (bb, t, h, 0, n)),
        out_shape=jax.ShapeDtypeStruct(
            (b, t_out, h_out, w_out, cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((kt, h_block + kh - 1, wp, cin), xp.dtype),
            pltpu.VMEM((h_block + kh - 1, w_out, kw * cin), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "parallel"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(xp, kernel.reshape(kt, kh, kw * cin, cout))
    return out


def _conv_kernel_v2(x_hbm, k_ref, o_ref, slab, xw, sems, *, kt, kh, kw, hb,
                    w_out, nb):
    """Temporal-reuse variant: one new widened plane per grid step.

    MEASURED SLOWER than the v1 kernel on-chip (58.0 vs 59.2 TFLOP/s at
    hb=8 on the 256px 128-ch stage): the circular-buffer slot index is a
    traced value, so the per-tap `xw[slot, dh:dh+hb]` views lose the free
    re-tiling v1's static plane gets, and the "arbitrary" dimension
    semantics this cross-step reuse requires disable the output-write
    pipelining v1's all-parallel grid enjoys. Kept (with interpret-mode
    numerics tests) as the starting point for future tuning; v1 remains
    the routed default.

    Grid (B, Cout/NB, H/HB, T) with T innermost. The xw scratch holds kt
    widened planes [rows, w_out, kw*Cin] in a circular buffer keyed by
    (frame % kt); consecutive output frames share kt-1 of their kt
    temporal taps, so each step fetches only the ONE new frame: a single
    aligned [rows, Wp, Cin] HBM->VMEM DMA (Mosaic requires DMA slices
    8-aligned in the sublane (W) dim, so the kw width shifts cannot be
    source offsets) followed by kw sublane-shifted VPU stores into the
    slot. That cuts v1's per-step VPU relayout by kt x and overlaps the
    DMA with the first kt-1 taps' MXU dots (waited only before the tap
    that needs it).
    """
    b = pl.program_id(0)
    h = pl.program_id(2)
    t = pl.program_id(3)
    cin = x_hbm.shape[-1]
    rows = hb + kh - 1

    def frame_copy(frame, buf):
        return pltpu.make_async_copy(
            x_hbm.at[b, frame, pl.ds(h * hb, rows)], slab.at[buf],
            sems.at[buf])

    def widen(frame, buf):
        slot = frame % kt
        for dw in range(kw):
            xw[slot, :, :, dw * cin:(dw + 1) * cin] = \
                slab[buf, :, dw:dw + w_out]

    # t==0 (fresh h block): all taps stale — fetch+widen frames 0..kt-2.
    @pl.when(t == 0)
    def _():
        for f in range(kt - 1):
            frame_copy(f, f).start()
        for f in range(kt - 1):
            frame_copy(f, f).wait()
            widen(f, f)

    frame_copy(t + kt - 1, kt - 1).start()  # the one new frame this step

    acc = jnp.zeros((hb * w_out, nb), jnp.float32)
    for dt in range(kt):
        if dt == kt - 1:
            frame_copy(t + kt - 1, kt - 1).wait()
            widen(t + kt - 1, kt - 1)
        slot = (t + dt) % kt
        for dh in range(kh):
            xm = xw[slot, dh:dh + hb].reshape(hb * w_out, kw * cin)
            acc += jnp.dot(xm, k_ref[dt, dh],
                           preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.reshape(hb, w_out, nb).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("w_out", "h_block", "n_block", "interpret"))
def conv3d_stride1_pallas_v2(xp: jnp.ndarray, kernel: jnp.ndarray,
                             w_out: int, h_block: int = 8,
                             n_block: int = 128,
                             interpret: bool = False) -> jnp.ndarray:
    """Same contract as conv3d_stride1_pallas (pre-padded input), with the
    DMA-built temporal-reuse kernel. Requires Wp >= w_out + kw - 1 and the
    same 8-alignments."""
    kt, kh, kw, cin, cout = kernel.shape
    b, tp, hp, wp, _ = xp.shape
    t_out, h_out = tp - kt + 1, hp - kh + 1
    if h_out % h_block:
        raise ValueError(f"H_out {h_out} not divisible by h_block {h_block}")
    if w_out % 8 or wp % 8 or wp < w_out + kw - 1:
        raise ValueError(f"need Wp ({wp}) and w_out ({w_out}) multiples of "
                         f"8 with Wp >= w_out+kw-1")
    if cout % n_block:
        raise ValueError(f"Cout {cout} not divisible by n_block {n_block}")

    out = pl.pallas_call(
        functools.partial(_conv_kernel_v2, kt=kt, kh=kh, kw=kw, hb=h_block,
                          w_out=w_out, nb=n_block),
        grid=(b, cout // n_block, h_out // h_block, t_out),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kt, kh, kw * cin, n_block),
                         lambda bb, n, h, t: (0, 0, 0, n)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_block, w_out, n_block),
            lambda bb, n, h, t: (bb, t, h, 0, n)),
        out_shape=jax.ShapeDtypeStruct(
            (b, t_out, h_out, w_out, cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((kt, h_block + kh - 1, wp, cin), xp.dtype),
            pltpu.VMEM((kt, h_block + kh - 1, w_out, kw * cin), xp.dtype),
            pltpu.SemaphoreType.DMA((kt,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(xp, kernel.reshape(kt, kh, kw * cin, cout))
    return out


def _vmem_bytes(hb, wp, w_out, cin, nb, kt, kh, kw, dbytes=2) -> int:
    """Scoped-VMEM footprint estimate for one v1 kernel grid step.

    Slab + widened plane scratch, the (empirically single-buffered: the
    index map varies only on the slow Cout dim) weight block, the fp32
    accumulator, and the double-buffered output block. The ~60 KB of
    Mosaic bookkeeping is absorbed by the caller's budget margin.
    """
    rows = hb + kh - 1
    return (kt * rows * wp * cin * dbytes          # halo slab
            + rows * w_out * kw * cin * dbytes     # widened plane
            + kt * kh * kw * cin * nb * dbytes     # weight block
            + hb * w_out * nb * 4                  # fp32 acc
            + 2 * hb * w_out * nb * dbytes)        # output block (dbuf)


def pick_h_block(x_shape, kernel_shape, n_block: int = 128,
                 budget: int = 60 * 2 ** 20):
    """Largest H block (32/16/8) whose per-step footprint fits the raised
    VMEM budget, or None when even hb=8 exceeds it (route to XLA).

    hb=16 measured 61.4 vs 59.2 TFLOP/s over hb=8 at the decoder's 256px
    128-ch stage; the wide high-channel stages (512-ch at 128px, 256-ch
    at 256px, ~20 MB/step at hb=16) used to fail Mosaic's default ~16 MB
    scoped limit — the kernel now requests vmem_limit_bytes=100 MB (like
    the attention kernels), so the budget here is 60 MB and bigger blocks
    amortize the kh-1 halo rows at exactly those stages (the r3 bench's
    512-ch parity case).
    """
    kt, kh, kw, cin, _ = kernel_shape
    h, w = x_shape[2], x_shape[3]
    w_out = -(-w // 8) * 8
    wp = -(-(w_out + kw - 1) // 8) * 8
    for hb in (32, 16, 8):
        if h % hb == 0 and _vmem_bytes(hb, wp, w_out, cin, n_block,
                                       kt, kh, kw) <= budget:
            return hb
    return None


def pallas_conv_applicable(x_shape, kernel_shape, stride) -> bool:
    """Static gate for routing causal_conv3d through the Pallas kernel."""
    kt, kh, kw, cin, cout = kernel_shape
    b, t, h, w, _ = x_shape
    return (stride == (1, 1, 1)
            and (kt, kh, kw) == (3, 3, 3)
            and cin % 128 == 0 and cout % 128 == 0
            and h % 8 == 0
            and (jax.default_backend() == "tpu" or INTERPRET_OVERRIDE))

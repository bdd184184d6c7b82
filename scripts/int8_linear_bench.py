"""Micro-benchmark: int8 W8A8 linear vs bf16 matmul at DiT shapes.

The 13B step is ~60% block-linear FLOPs; this isolates one [L, h] x [h, n]
projection (the unit `linear()` dispatches) to see how close the W8A8 path
runs to the v5e s8 MXU peak (394 TOPS) and what the per-token activation
quantization pass costs.

Usage: python scripts/int8_linear_bench.py [L] [h] [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from hunyuanvideo_efficiency_tpu.models.dit import _int8_linear_body
    from hunyuanvideo_efficiency_tpu.ops.quantization import (
        quantize_tensor_int8)

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 118800
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3072

    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = (jax.random.normal(kx, (1, L, h), jnp.float32)).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (h, n), jnp.float32) / h ** 0.5
         ).astype(jnp.bfloat16)
    p8 = quantize_tensor_int8(w)
    flops = 2.0 * L * h * n

    REPS = 16  # amortize the ~30 ms tunnel dispatch overhead inside jit

    def timeit(fn, *a):
        out = fn(*a)
        float(out.ravel()[0])
        ts = []
        for i in range(3):
            xi = a[-1] + jnp.bfloat16(0.001 * (i + 1))
            float(xi.ravel()[0])
            t0 = time.perf_counter()
            out = fn(*a[:-1], xi)
            float(out.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / REPS

    def chain(body):
        # fold a scalar of y back into the carry: serializes the REPS
        # iterations without requiring n == h (fc1/fc2 are rectangular)
        def run(p, u):
            def step(carry, _):
                y = body(p, carry)
                # fold a sample touching EVERY output column into the
                # carry: a first-column-only probe let XLA dead-code-
                # eliminate all but the first chunk of unrolled column-
                # chunked forms (measured an impossible 761 TOP/s). Row
                # sampling (full minor dim) keeps the reads contiguous —
                # a column-strided probe (y[..., ::129]) itself cost
                # ~18 ms at [118.8k, 12288]
                s = (0.001 * jnp.mean(y[:, ::1024].astype(jnp.float32))
                     ).astype(carry.dtype)
                return carry + s, None
            out, _ = jax.lax.scan(step, u, None, length=REPS)
            return out
        return jax.jit(run)

    t8 = timeit(chain(_int8_linear_body), p8, x)
    print(f"int8 W8A8 [{L}x{h}]@[{h}x{n}]: {t8 * 1e3:7.2f} ms "
          f"{flops / t8 / 1e12:6.1f} TOP/s", flush=True)

    # the production dispatch (_int8_linear): unchunked where the s32 temp
    # fits, column-chunked above the budget (quantize once, slide the dot
    # over output column blocks)
    from hunyuanvideo_efficiency_tpu.models import dit as _dit
    from hunyuanvideo_efficiency_tpu.models.dit import _int8_linear
    td = timeit(chain(lambda p, u: _int8_linear(p, u)), p8, x)
    print(f"dispatch (col-chunk when needed): {td * 1e3:7.2f} ms "
          f"{flops / td / 1e12:6.1f} TOP/s", flush=True)
    if L > _dit._INT8_CHUNK_TOKENS and L * n * 4 > _dit._INT8_TEMP_BUDGET:
        _dit.set_colchunk_unroll(True)
        try:
            tu = timeit(chain(lambda p, u: _int8_linear(p, u)), p8, x)
            print(f"col-chunk UNROLLED (barrier):     {tu * 1e3:7.2f} ms "
                  f"{flops / tu / 1e12:6.1f} TOP/s", flush=True)
        finally:
            _dit.set_colchunk_unroll(False)

    from hunyuanvideo_efficiency_tpu.ops.int8_matmul import (
        int8_linear_pallas)

    for bl in (512, 1024, 2048):
        for bn in (1536, 3072):
            if bn > n:
                continue
            try:
                tp = timeit(chain(lambda p, u, bl=bl, bn=bn:
                                  int8_linear_pallas(p, u, block_l=bl,
                                                     block_n=bn)), p8, x)
            except Exception as e:  # e.g. VMEM OOM at big tiles
                print(f"pallas W8A8 bl={bl} bn={bn}:  FAILED "
                      f"({type(e).__name__})", flush=True)
                continue
            print(f"pallas W8A8 bl={bl} bn={bn}:  {tp * 1e3:7.2f} ms "
                  f"{flops / tp / 1e12:6.1f} TOP/s", flush=True)

    tb = timeit(chain(lambda wt, u: u @ wt), w, x)
    print(f"bf16 matmul same shape:    {tb * 1e3:7.2f} ms "
          f"{flops / tb / 1e12:6.1f} TFLOP/s")

    # quant pass alone (what the int8 path adds per linear)
    def quant_only(_, u):
        amax = jnp.max(jnp.abs(u), axis=-1, keepdims=True
                       ).astype(jnp.float32)
        sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        return jnp.round(u.astype(jnp.float32) / sx).astype(jnp.int8)
    tq = timeit(chain(quant_only), None, x)
    print(f"activation quant pass:     {tq * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()

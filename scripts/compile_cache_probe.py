"""Probe: does the JAX persistent compilation cache work through the
remote-compile tunnel?

Run twice (fresh processes): the first run compiles and populates the
cache; the second should load the executable from disk instead of
recompiling. Prints compile wall time + cache dir entry count.

    python scripts/compile_cache_probe.py [--big]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hunyuanvideo_efficiency_tpu.utils.compile_cache import (
    enable_compilation_cache)

path = enable_compilation_cache("/tmp/hyvideo_cache_probe")

import jax
import jax.numpy as jnp

big = "--big" in sys.argv


@jax.jit
def f(x, w1, w2):
    # distinctive enough not to collide with other sessions' programs
    y = jnp.tanh(x @ w1) * 1.00017
    return (y @ w2).sum(axis=-1) + jnp.cos(x[..., 0])


k = jax.random.PRNGKey(0)
n = 4096 if big else 1024
x = jax.random.normal(k, (8, n, n), jnp.bfloat16)
w1 = jax.random.normal(k, (n, n), jnp.bfloat16)
w2 = jax.random.normal(k, (n, n), jnp.bfloat16)

t0 = time.perf_counter()
lowered = f.lower(x, w1, w2)
compiled = lowered.compile()
t1 = time.perf_counter()
out = compiled(x, w1, w2)
print(float(out.ravel()[0]))
entries = len(os.listdir(path))
print(f"backend={jax.default_backend()} compile={t1 - t0:.2f}s "
      f"cache_entries={entries} dir={path}")

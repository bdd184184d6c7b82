"""Persistent XLA compilation cache — warm process starts.

The reference's 1,904 s headline is effectively a WARM number: its eager
CUDA kernels are precompiled and `gradio_server.py` holds the model in a
closure across requests (reference: gradio_server.py:14-21). Our jitted
programs instead repay minutes of (remote) XLA compiles in every fresh
process. Enabling JAX's persistent compilation cache makes every entry
point warm-start after the first run on a machine: compiled executables
are serialized to `cache_dir` keyed by (HLO, compile options, backend
version) and deserialized on later hits, skipping compilation entirely.

Measured through this environment's remote-compile tunnel (v5e,
scripts/compile_cache_probe.py): the probe program compiles in 1.26 s
cold and 0.11 s from the cache across fresh processes — the cache
intercepts client-side (serialized executables), so it works even when
XLA compilation itself happens behind a tunnel. Production-scale effect:
see the warm-vs-cold E2E rows in PARITY.md.

Call `enable_compilation_cache()` before building jitted functions (entry
points do it right after parsing args). Opt out with
HYVIDEO_COMPILE_CACHE=0 / --compile-cache-dir "".
"""
from __future__ import annotations

import os
from typing import Optional

_ENV = "HYVIDEO_COMPILE_CACHE"
_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "hyvideo_tpu_xla")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Resolution order: explicit arg > $HYVIDEO_COMPILE_CACHE > the default
    user-cache path. A value of "0"/"" disables and returns None.
    Safe to call more than once; returns the active cache path.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(_ENV, _DEFAULT_DIR)
    if not cache_dir or cache_dir == "0":
        return None
    path = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes >=1 s to compile (the default 2 s-and-
    # large-entries heuristic skips the many small host-driven dispatch
    # programs whose compiles still dominate a staged 720p step)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path

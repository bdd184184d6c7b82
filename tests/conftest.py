"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware."""
import os

# XLA_FLAGS must be set before the CPU client initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The session environment's sitecustomize imports jax and registers a TPU
# backend at interpreter startup, so the env var alone is latched too late —
# override via config (valid until a backend is actually initialized).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# CPU matmuls default to fp32 anyway; make it explicit so parity tolerances
# hold if a test ever runs on TPU hardware.
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state(request):
    """Bound the in-process XLA:CPU compiler state.

    A full-suite run (~280 tests, hundreds of CPU compiles in one process)
    segfaulted twice inside backend_compile at the VAE compiles near the
    end, while both half-suite subsets pass — an XLA:CPU crash tied to
    cumulative compile state, not to any test (128 GB host, negligible
    RSS). Dropping the jit caches just before the late heavyweight modules
    keeps the compiler state bounded at the point that crashed; clearing
    between EVERY module measured ~6x slower (shared kernels recompile)."""
    if request.module.__name__ in ("test_training", "test_utils",
                                   "test_vae"):
        jax.clear_caches()
    yield

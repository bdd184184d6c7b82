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

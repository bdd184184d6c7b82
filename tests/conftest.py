"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware."""
import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU plugin,
# but tests must be hostable anywhere and need 8 virtual devices for the
# sharding suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# CPU matmuls default to fp32 anyway; make it explicit so parity tolerances
# hold if a test ever runs on TPU hardware.
jax.config.update("jax_default_matmul_precision", "highest")

"""Environment fingerprint (reference: utils/collect_env.py:1-201, the
OpenMMLab-style CUDA/cuDNN dump). TPU-native: reports JAX/XLA backend,
device inventory + HBM, compilation cache, and host toolchain."""
from __future__ import annotations

import platform
import subprocess
import sys
from collections import OrderedDict


def collect_env() -> "OrderedDict[str, str]":
    env = OrderedDict()
    env["sys.platform"] = sys.platform
    env["Python"] = sys.version.replace("\n", "")
    env["OS"] = platform.platform()
    env["CPU count"] = str(__import__("os").cpu_count())

    try:
        import jax

        env["JAX"] = jax.__version__
        env["jaxlib"] = getattr(__import__("jaxlib"), "__version__", "?")
        env["Default backend"] = jax.default_backend()
        devs = jax.devices()
        env["Devices"] = ", ".join(
            f"{d.platform}:{d.device_kind}[{d.id}]" for d in devs)
        stats = devs[0].memory_stats() if devs else None
        if stats:
            env["HBM bytes limit"] = str(stats.get("bytes_limit", "?"))
    except Exception as e:  # pragma: no cover
        env["JAX"] = f"unavailable ({e})"

    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "torch",
                "transformers"):
        try:
            m = __import__(mod)
            env[mod] = getattr(m, "__version__", "?")
        except ImportError:
            env[mod] = "not installed"

    for tool, args in (("g++", ["--version"]), ("cmake", ["--version"]),
                       ("bazel", ["--version"])):
        try:
            out = subprocess.check_output([tool] + args, text=True,
                                          stderr=subprocess.DEVNULL)
            env[tool] = out.splitlines()[0]
        except (subprocess.CalledProcessError, FileNotFoundError):
            env[tool] = "not found"
    return env


def main():
    for k, v in collect_env().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()

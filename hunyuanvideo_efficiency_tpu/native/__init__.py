"""First-party native (C++) components, built on demand with the system
toolchain and bound via ctypes (no pybind11 dependency)."""
from .build import load_metrics_core

__all__ = ["load_metrics_core"]

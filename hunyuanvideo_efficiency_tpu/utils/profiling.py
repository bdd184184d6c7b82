"""Profiling / tracing hooks.

The reference has only wall-clock logging (reference: hyvideo/inference.py:
645-669 logs total generation time; SURVEY.md §5.1). TPU-native upgrade:
`jax.profiler` traces viewable in XProf/TensorBoard, plus lightweight phase
timers used by the sampler and benchmarks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given (CLI --profile-dir)."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir, create_perfetto_link=False):
        yield


class PhaseTimer:
    """Accumulates named phase wall-times (text encode / denoise / decode)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = (self.phases.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def summary(self) -> str:
        total = sum(self.phases.values())
        parts = [f"{k}={v:.2f}s" for k, v in self.phases.items()]
        return f"total={total:.2f}s ({', '.join(parts)})"


def annotate(name: str):
    """Named region in profiler traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)

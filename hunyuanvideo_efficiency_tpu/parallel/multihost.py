"""Multi-host TPU slice support.

The reference scales by spawning one NCCL process per GPU under torchrun
(reference: hyvideo/inference.py:156-181, scripts/run_sample_video_multigpu.sh).
On TPU pods the analogous step is `jax.distributed.initialize()` — one
process per HOST, all chips of the slice visible through one global mesh.
The mesh construction in mesh.py already operates on `jax.devices()`
(global across hosts after initialization), so the sequence-parallel and
data-parallel paths work unchanged; this module adds the process-level
bootstrap plus host-local data utilities.

Axis placement guidance (ICI vs DCN): keep `ulysses`/`ring` INSIDE a host's
ICI domain (all_to_all and ppermute per denoise layer are latency-bound);
put `dp` outermost so any DCN hop only carries the per-step gradient psum
(training) or nothing at all (inference — videos are independent).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize cross-host JAX. No-op (returns False) when single-process.

    On Cloud TPU pods all arguments auto-detect from the metadata server;
    elsewhere pass them or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.
    """
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")))
    return True


def is_primary() -> bool:
    """True on the process that should write outputs (the analog of the
    reference's rank-0-only mp4 saving, sample_video.py:49)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """Which slice of a globally-sharded batch this host should feed."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)

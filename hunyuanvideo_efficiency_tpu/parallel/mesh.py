"""Device-mesh construction for multi-chip inference/training.

TPU-native replacement for the reference's NCCL / xfuser process-group setup
(reference: hyvideo/inference.py:156-181): instead of per-process
`init_process_group("nccl")` + `initialize_model_parallel(...)`, we build ONE
`jax.sharding.Mesh` over all devices and express every parallelism degree as
a mesh axis. Collectives ride ICI automatically.

Axes (any may be size 1):
  dp      — data parallel (batch / videos)
  ulysses — sequence-parallel all-to-all (head scatter / seq gather)
  ring    — sequence-parallel K/V rotation (collective permute)

The reference constraint `ulysses_degree * ring_degree == world_size`
(inference.py:166-175) maps to `dp=1` here; we additionally allow an outer dp
axis, which the reference lacks (SURVEY.md §2.9).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
ULYSSES_AXIS = "ulysses"
RING_AXIS = "ring"
# Token-axis sharding order is RING-major: flat token blocks cycle the
# ulysses axis fastest, so after the Ulysses head-scatter all_to_all
# (which seq-concats the u blocks sharing a ring index) every ring rank
# holds one CONTIGUOUS global token range. Ring x STA halo exchange
# (sp_attention._ring_sta_halo) needs that contiguity — each rank's slab
# is then a whole run of t-planes whose window neighbors live on the
# adjacent ranks. Every other path is token-order-agnostic as long as all
# specs use SP_AXES consistently (they do).
SP_AXES = (RING_AXIS, ULYSSES_AXIS)


@dataclass(frozen=True)
class ParallelConfig:
    """Parallelism degrees (reference flags --ulysses-degree/--ring-degree,
    hyvideo/config.py:364-381)."""
    dp_degree: int = 1
    ulysses_degree: int = 1
    ring_degree: int = 1

    @property
    def sp_degree(self) -> int:
        return self.ulysses_degree * self.ring_degree

    @property
    def world_size(self) -> int:
        return self.dp_degree * self.sp_degree


def make_mesh(config: ParallelConfig,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if config.world_size > len(devices):
        raise ValueError(
            f"Need {config.world_size} devices "
            f"(dp {config.dp_degree} x ulysses {config.ulysses_degree} x "
            f"ring {config.ring_degree}), have {len(devices)}")
    devs = np.asarray(devices[: config.world_size]).reshape(
        config.dp_degree, config.ulysses_degree, config.ring_degree)
    return Mesh(devs, (DP_AXIS, ULYSSES_AXIS, RING_AXIS))


def latent_sharding(mesh: Mesh, seq_axis: int = 3) -> NamedSharding:
    """Sharding for a [B, C, T, H, W] latent: batch over dp, one spatial axis
    over the combined sequence-parallel axes (the reference chunks H of the
    patch grid, inference.py:57-64)."""
    spec = [None] * 5
    spec[0] = DP_AXIS
    spec[seq_axis] = SP_AXES
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tokens_sharding(mesh: Mesh) -> NamedSharding:
    """[B, S, ...] activation sharding: batch over dp, tokens over sp."""
    return NamedSharding(mesh, P(DP_AXIS, SP_AXES))

"""Multi-chip parallelism: mesh construction, Ulysses x ring sequence-
parallel attention, and sharded DiT forward/denoise (SURVEY.md §2.9)."""
from .mesh import (DP_AXIS, RING_AXIS, SP_AXES, ULYSSES_AXIS, ParallelConfig,
                   latent_sharding, make_mesh, replicated, tokens_sharding)
from .sp_attention import usp_joint_attention
from .sp_dit import (cfg_reorder_for_dp, cfg_unreorder_for_dp,
                     check_sp_compat, make_sp_denoise_fn, make_sp_dit_forward,
                     make_sp_step_fn, shard_dit_params, shard_params)

__all__ = [
    "DP_AXIS", "RING_AXIS", "SP_AXES", "ULYSSES_AXIS", "ParallelConfig",
    "latent_sharding", "make_mesh", "replicated", "tokens_sharding",
    "usp_joint_attention", "make_sp_denoise_fn", "make_sp_dit_forward",
    "make_sp_step_fn", "shard_params", "shard_dit_params", "check_sp_compat",
    "cfg_reorder_for_dp", "cfg_unreorder_for_dp",
]
from .multihost import initialize_multihost, is_primary, local_batch_slice

__all__ += ["initialize_multihost", "is_primary", "local_batch_slice"]

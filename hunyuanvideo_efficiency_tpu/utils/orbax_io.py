"""Orbax checkpoint persistence for converted parameter trees.

Complements the flat-.npz path in utils/checkpoint.py with the TPU-ecosystem
standard: async, sharded, restore-with-sharding. Used for large trees (the
13B DiT, the 8B text tower) where npz would be a single-host bottleneck.
(Reference analog: torch.load pickles, hyvideo/inference.py:279-354 — orbax
is the JAX-native replacement tier.)
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

Params = Dict[str, Any]


def save_params_orbax(path: str, params: Params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params_orbax(path: str, target: Optional[Params] = None,
                      sharding=None) -> Params:
    """Restore a tree; `target` (abstract tree) and/or `sharding` control
    restore placement (replicate across a mesh for inference)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype,
                    sharding=sharding if sharding is not None
                    else getattr(x, "sharding", None)),
                target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)

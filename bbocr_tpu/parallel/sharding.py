"""Sharding rules: batch over ``dp``, large parameter matrices over ``tp``.

GSPMD does the heavy lifting: we annotate, XLA partitions and inserts the
collectives (psum for dp gradient reduction, all-gather/reduce-scatter
around tp matmuls). Rules are path+shape based so they survive model edits:

- any kernel whose last dim is divisible by tp and >= ``min_tp_dim`` is
  sharded on its last axis (LSTM gate projections (C,4H), conv output
  channels, the CTC head vocab dim);
- everything else (biases, BN scales, small convs) is replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: Any, mesh: Mesh, min_tp_dim: int = 512) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    tp = mesh.shape["tp"]

    def rule(path, leaf):
        if tp > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            last = leaf.shape[-1]
            if last % tp == 0 and last >= min_tp_dim:
                spec = [None] * (leaf.ndim - 1) + ["tp"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh, min_tp_dim: int = 512) -> Any:
    """Device-put params according to :func:`param_shardings`."""
    shardings = param_shardings(params, mesh, min_tp_dim)
    return jax.device_put(params, shardings)

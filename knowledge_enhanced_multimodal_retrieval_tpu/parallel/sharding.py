"""Sharding helpers: batch sharding, padding, param placement.

Replaces the reference's ``DistributedSampler`` + per-rank device copies
(``trainer.py:423-439,160-165``): instead of each process holding a rank-local
batch, hosts build global arrays with a batch-sharded ``NamedSharding`` and
XLA moves shards over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate a parameter pytree across the mesh.

    Pure data parallelism (the reference's strategy, SURVEY §2.9): every
    device holds full parameters; gradients are reduced by XLA from the
    batch-sharded loss. A future tensor-parallel layout only needs to change
    this function.
    """
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, pad_value=0) -> tuple:
    """Pad ``x`` along ``axis`` to a multiple of ``multiple``.

    Returns ``(padded, original_len)``. Needed because a sharded batch dim
    must divide the mesh's data-axis size (the reference instead dropped or
    duplicated samples via DistributedSampler padding).
    """
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return np.pad(x, widths, constant_values=pad_value), n


def host_local_batch_to_global(
    batch: Any,
    mesh: Mesh,
    axis: str = "data",
) -> Any:
    """Place a host-local numpy batch pytree onto the mesh, sharded on dim 0.

    Single-host: a plain ``device_put`` with a batch sharding. Multi-host:
    uses ``jax.make_array_from_process_local_data`` so each host contributes
    its local shard of the global batch.
    """

    def place(x):
        arr = np.asarray(x)
        sharding = batch_sharding(mesh, arr.ndim, axis)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(place, batch)


def unreplicate(x: Any) -> Any:
    """Fetch a (replicated or small) array pytree to host numpy."""
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), x)

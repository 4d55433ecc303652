"""Device mesh + distributed runtime bootstrap.

TPU-native replacement for the reference's NCCL process-group setup
(``src/clip/train/trainer.py:44-55`` — ``dist.init_process_group("nccl")``
over ``localhost:12355`` with one process per GPU, SURVEY §2.9). On TPU there
is no process-per-device fan-out: one process per host, all devices addressed
through a :class:`jax.sharding.Mesh`, and XLA inserts collectives over ICI
from sharding annotations.

The mesh has two axes:

- ``data``  — batch-sharded data parallelism (the reference's only strategy);
- ``model`` — reserved tensor-parallel axis (size 1 by default) so larger
  towers can shard without restructuring callers.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.config import MeshConfig


def runtime_init(coordinator_address: Optional[str] = None) -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Replaces the reference's TCP rendezvous (``trainer.py:46-48``). Safe to
    call unconditionally: a single-process run is a no-op.
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    num_processes = int(os.environ.get("KEMR_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def make_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` — or ``(dcn, data, model)`` — mesh.

    ``data_parallel == -1`` consumes all devices not claimed by the other
    axes. Device order follows ``jax.devices()`` which is ICI-contiguous on
    a TPU slice, so the data axis rides ICI. ``dcn_parallel > 1`` adds a
    LEADING ``dcn`` axis for hybrid data parallelism across slices: with
    slice-major device order (the multi-slice ``jax.devices()`` contract),
    the outer axis crosses DCN and the inner axes stay on each slice's ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    mp = max(1, cfg.model_parallel)
    dcn = max(1, getattr(cfg, "dcn_parallel", 1))
    dp = cfg.data_parallel if cfg.data_parallel > 0 else len(devs) // (mp * dcn)
    if dcn * dp * mp != len(devs):
        raise ValueError(
            f"mesh {dcn}x{dp}x{mp} (dcn x data x model) does not tile {len(devs)} devices"
        )
    if dcn > 1:
        arr = np.array(devs).reshape(dcn, dp, mp)
        return Mesh(arr, axis_names=(cfg.dcn_axis, cfg.data_axis, cfg.model_axis))
    arr = np.array(devs).reshape(dp, mp)
    return Mesh(arr, axis_names=(cfg.data_axis, cfg.model_axis))


@dataclasses.dataclass
class MeshRuntime:
    """Bundle of mesh + canonical shardings used throughout the framework."""

    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"
    fsdp: bool = False  # shard train state over the data axis (parallel/fsdp.py)
    # multi-slice hybrid DP: the leading DCN mesh axis name, or None for a
    # single-slice (data, model) mesh. Batches shard over (dcn, data)
    # jointly; fsdp/tp shard INSIDE a slice only.
    dcn_axis: Optional[str] = None

    @staticmethod
    def create(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None) -> "MeshRuntime":
        mesh = make_mesh(cfg, devices)
        dcn = cfg.dcn_axis if getattr(cfg, "dcn_parallel", 1) > 1 else None
        return MeshRuntime(
            mesh=mesh, data_axis=cfg.data_axis, model_axis=cfg.model_axis,
            fsdp=cfg.fsdp, dcn_axis=dcn,
        )

    @property
    def data_axes(self) -> tuple:
        """Every axis the batch shards over: ('dcn', 'data') or ('data',)."""
        return (self.dcn_axis, self.data_axis) if self.dcn_axis else (self.data_axis,)

    @property
    def num_data(self) -> int:
        """Total batch-sharding ways (across DCN and ICI data axes)."""
        n = self.mesh.shape[self.data_axis]
        if self.dcn_axis:
            n *= self.mesh.shape[self.dcn_axis]
        return n

    def data_sharding(self, ndim: int = 1) -> NamedSharding:
        """Batch-sharded over the data axes; trailing dims replicated."""
        spec = P(self.data_axes, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

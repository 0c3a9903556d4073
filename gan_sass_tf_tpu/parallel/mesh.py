"""Device mesh construction + canonical shardings (SURVEY.md §2.3, §5.8).

The contract asks for pjit data-parallel training over ICI
(BASELINE.json:5,11): a ('dcn', 'data') mesh where the batch axis is sharded
over both axes (dcn outermost so gradient all-reduces ride ICI within a
slice first) and parameters/optimizer state are replicated.  XLA inserts the
gradient all-reduce automatically from these sharding constraints — there is
no hand-written communication backend (no NCCL/MPI equivalent exists or is
needed on TPU, SURVEY.md §2.4).

Multi-host bootstrap: call parallel.initialize_distributed() before building
the mesh (env-driven wrapper over jax.distributed.initialize; single-host
slices are a no-op).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_cfg=None, devices: Optional[Sequence] = None) -> Mesh:
    """Build the ('dcn', 'data') mesh.  data_axis_size == -1 → all devices."""
    devices = list(devices if devices is not None else jax.devices())
    dcn = mesh_cfg.dcn_axis_size if mesh_cfg else 1
    data = mesh_cfg.data_axis_size if mesh_cfg else -1
    if data in (-1, 0, None):
        data = len(devices) // dcn
    need = dcn * data
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices (dcn={dcn} × data={data}), "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(dcn, data)
    names = (
        (mesh_cfg.dcn_axis_name, mesh_cfg.data_axis_name)
        if mesh_cfg
        else ("dcn", "data")
    )
    return Mesh(arr, names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Host array -> device array sharded on the batch dim (the single
    host→device crossing per step, SURVEY.md §3.1b)."""
    return jax.device_put(batch, batch_sharding(mesh))

"""Device mesh + sharding rules.

The reference is single-GPU (SURVEY.md section 2 checklist); the TPU-native
capability equivalent is data-parallel training over an ICI mesh — batch
sharded over a 'data' axis, parameters replicated, gradient all-reduce
inserted by XLA — plus an optional 'spatial' axis that spatially partitions
the conv transforms over image height for full-scene encoding (GSPMD inserts
the halo exchanges).

Everything uses `jax.sharding.Mesh` + `jax.jit` shardings; no hand-written
collectives are needed for the flagship model (~10M params, conv-only).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def initialize_distributed() -> bool:
    """Initialize jax.distributed from the TPU pod environment (multi-host
    training; collectives ride ICI within a slice, DCN across slices). Safe
    no-op on single-host. Returns True if a multi-process runtime came up."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or \
            os.environ.get("TPU_WORKER_HOSTNAMES"):
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def make_mesh(n_data: int = -1, n_spatial: int = 1,
              devices=None) -> Mesh:
    """Build a (data, spatial) mesh. n_data == -1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // n_spatial
    n = n_data * n_spatial
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def mesh_from_config(parallel_cfg) -> Mesh:
    return make_mesh(parallel_cfg.data, parallel_cfg.spatial)


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC batch: shard N over 'data' (and optionally H over 'spatial')."""
    spec = P(DATA_AXIS, SPATIAL_AXIS if spatial else None, None, None)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, spatial: bool = False):
    """Place a batch on the mesh. Single-process: ``x`` is the global batch
    (device_put distributes it). Multi-process (multi-host pod): ``x`` is this
    PROCESS'S SLICE of the global batch — rows
    [rank * B_local, (rank+1) * B_local) in process order — and the global
    array is assembled from the per-process locals over DCN-free addressable
    shards via jax.make_array_from_process_local_data. Requires the standard
    make_mesh layout (jax.devices() orders by process, so the 'data' axis
    spans processes contiguously) and a per-process Loader slice
    (data.datasets.Loader(process_index=..., process_count=...))."""
    sharding = batch_sharding(mesh, spatial)
    if jax.process_count() > 1:
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)
    return jax.device_put(x, sharding)

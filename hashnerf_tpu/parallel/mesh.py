"""Device mesh + sharding helpers for multi-chip ray-parallel training.

The reference has NO distributed backend (SURVEY.md §2: zero parallelism —
single GPU). This module is the TPU-native scale-out design mandated by
BASELINE.json's north star: a 1-D ("data",) mesh over the ray axis — rays and
per-ray targets sharded across chips, the hash table + MLP params replicated,
gradients all-reduced by XLA-inserted psums over ICI.

For log2T=21-style giant tables a 2-D ("data", "table") mesh shards the hash
table's row axis; lookups then all-gather touched rows. Round 1 ships the
ray-sharded path; the table-sharded path is declared here for the API.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host bring-up hook: call ONCE per process before any jax use on
    a multi-host (DCN-connected) slice. No-ops for single-process runs.

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars (or the TPU metadata autodetection inside
    jax.distributed.initialize when all are None on Cloud TPU).
    """
    import os

    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def make_dcn_mesh(
    n_hosts: int,
    model_per_host: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """DCN-aware 2-D ("data", "model") mesh for multi-host training.

    The slow DCN axis carries only the data-parallel gradient all-reduce
    (one (L,2^T,F)-sized psum per step, latency-tolerant); the fast ICI axis
    inside each host carries the table-sharded all-gathers (per-step
    activation traffic). jax.experimental.mesh_utils assigns devices so that
    the inner mesh axes stay within a host.
    """
    from jax.experimental import mesh_utils

    if devices is None:
        devices = jax.devices()
    per_host = len(devices) // n_hosts
    assert per_host % model_per_host == 0
    if n_hosts == 1:
        # single host: no DCN axis; plain 2-D mesh over ICI
        dev_array = np.array(devices).reshape(
            per_host // model_per_host, model_per_host
        )
    else:
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host // model_per_host, model_per_host),
            dcn_mesh_shape=(n_hosts, 1),
            devices=devices,
            process_is_granule=True,
        )
    return Mesh(dev_array, axis_names=("data", "model"))


def make_mesh(n_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the ray axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def shard_rays(mesh: Mesh) -> NamedSharding:
    """Leading (ray) axis split across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict with rays on the leading axis onto the mesh."""
    sharding = shard_rays(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}

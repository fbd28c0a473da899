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

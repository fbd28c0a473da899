"""Table-sharded (level-parallel) hash encoding for giant hash tables.

BASELINE.json configs[4] targets log2T=21 (a 2^21 x 16 x 2 fp32 table =
268 MB, heavy to replicate + all-reduce). TPU-native answer: a 2-D mesh
("data", "model"): rays sharded over "data", hash-grid LEVELS sharded over
"model". Each device encodes its local levels for its data shard, then
features are all-gathered along "model" (tiny: N x L_local*F activations
ride ICI, not 268 MB of gradients) and level-gradient updates stay local to
the owning device — true model parallelism for the embedding table.

shard_map-based; works on any mesh whose "model" size divides n_levels.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hashnerf_tpu.ops.hash_encoding import (
    HashGridConfig,
    encode_with_resolutions,
    level_resolutions,
)


def make_table_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devs = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def shard_table(mesh: Mesh, table: jnp.ndarray) -> jnp.ndarray:
    """Place a (L, 2^T, F) table with levels split over 'model'."""
    return jax.device_put(table, NamedSharding(mesh, P("model", None, None)))


def make_sharded_encoder(mesh: Mesh, cfg: HashGridConfig):
    """Returns encode(table, x, bbox_min, bbox_max) -> (feats, keep) with
    table level-sharded over 'model' and x ray-sharded over 'data'."""
    n_model = mesh.shape["model"]
    L = cfg.n_levels
    assert L % n_model == 0, f"n_levels {L} must divide by model axis {n_model}"
    Ll = L // n_model
    all_res = jnp.asarray(
        np.array(
            level_resolutions(cfg.base_resolution, cfg.finest_resolution, L),
            dtype=np.float32,
        )
    )

    def local_encode(table_local, x_local, bbox_min, bbox_max):
        m = jax.lax.axis_index("model")
        res_local = jax.lax.dynamic_slice(all_res, (m * Ll,), (Ll,))
        feats, keep = encode_with_resolutions(
            table_local, x_local, bbox_min, bbox_max, res_local,
            cfg.log2_hashmap_size,
        )
        # (n_model, N_local, Ll*F) -> concat levels in order -> (N_local, L*F)
        gathered = jax.lax.all_gather(feats, "model", axis=0)
        feats_full = jnp.moveaxis(gathered, 0, 1).reshape(x_local.shape[0], -1)
        return feats_full, keep

    encode = shard_map(
        local_encode,
        mesh=mesh,
        in_specs=(P("model", None, None), P("data", None), P(), P()),
        out_specs=(P("data", None), P("data")),
        check_rep=False,
    )
    return encode

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
from jax import shard_map

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
        check_vma=False,
    )
    return encode


# --------------------------------------------------------------------------- #
# Full train step over the ("data", "model") mesh (BASELINE configs[4]:
# log2T=21 tables too heavy to replicate+all-reduce).
# --------------------------------------------------------------------------- #

def make_table_sharded_trainer(mesh: Mesh, args, key, bbox, near: float, far: float):
    """Build (state, opt_state, train_step) with the hash table LEVEL-SHARDED
    over 'model' and rays sharded over 'data'.

    The whole optimization step (encode -> MLP -> composite -> losses ->
    backward -> RAdam) is one jitted program: the shard_map encoder's
    all_gather moves only the (N, L_local*F) activations across 'model'
    (its AD transpose reduce-scatters the activation grads back), while the
    table and its RAdam moments never leave the owning device. TV is not
    applied in this mode (it would gather the full table; the reference
    disables TV after iter 1000 anyway — run_nerf.py:637-638).
    """
    import optax

    from hashnerf_tpu.models.factory import create_model
    from hashnerf_tpu.render.renderer import render_rays
    from hashnerf_tpu.train import driver as _driver

    model_cfg = _driver.model_config_from_args(args)
    render_cfg = _driver.render_config_from_args(args)
    hcfg = model_cfg.hash_grid

    sharded_encode = make_sharded_encoder(mesh, hcfg)
    pt_encoder = lambda state, x, bb: sharded_encode(
        state.hash_table, x, bb[0], bb[1]
    )
    state, query_fn = create_model(key, model_cfg, pt_encoder=pt_encoder)

    # placement: table (+ its optimizer moments) level-sharded, rest replicated
    table_sh = NamedSharding(mesh, P("model", None, None))
    rep = NamedSharding(mesh, P())

    def place(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, table_sh if getattr(x, "shape", None) == state.hash_table.shape else rep
            ),
            tree,
        )

    state = place(state)
    optimizer = _driver.make_optimizer(args, state)
    opt_state = place(optimizer.init(state))

    loss_fn = _driver.make_loss_fn(
        args, render_cfg, query_fn, jnp.asarray(bbox), hcfg, with_tv=False
    )
    data_sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def train_step(state, opt_state, batch, key):
        batch = {
            k: jax.lax.with_sharding_constraint(v, data_sh)
            for k, v in batch.items()
        }
        (loss, (psnr, img_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state, batch, key, jnp.float32(0.0))
        updates, opt_state = optimizer.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        return state, opt_state, {"loss": loss, "psnr": psnr, "img_loss": img_loss}

    return state, opt_state, train_step


def save_table_sharded(path: str, global_step: int, state, opt_state) -> None:
    """Checkpoint the table-sharded trainer (SURVEY §5.4): the per-leaf
    PartitionSpecs (table + its RAdam moments on 'model') are recorded so a
    restore lands level-sharded again — see train/checkpoint.py."""
    from hashnerf_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(path, global_step, state, opt_state)


def restore_table_sharded(path: str, mesh: Mesh, state_template,
                          opt_state_template):
    """Restore onto the live ('data','model') mesh with sharding
    re-placement. Returns (global_step, state, opt_state)."""
    from hashnerf_tpu.train.checkpoint import load_checkpoint

    return load_checkpoint(path, state_template, opt_state_template, mesh=mesh)

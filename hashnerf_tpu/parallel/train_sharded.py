"""Multi-chip train step: rays sharded over the mesh, params replicated.

The full step (ray march -> losses -> backward scatter-add -> RAdam) is one
pjit program. Sharding propagation from the batch's NamedSharding makes XLA
partition all per-ray compute across chips and insert psum all-reduces for
the (replicated) hash-table and MLP gradients over ICI — the TPU-native
equivalent of gradient all-reduce, overlapped with backward by the XLA
scheduler (latency-hiding). No hand-written collectives needed at this layer;
the table-sharded mode (parallel/table_sharded.py) likewise relies on
XLA-inserted collectives over its ("data", "model") mesh.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hashnerf_tpu.parallel.mesh import shard_rays, replicate


def make_sharded_train_step(
    mesh: Mesh,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
):
    """Returns a jitted train_step(state, opt_state, batch, key, tv_weight)
    with rays sharded on the 'data' axis and everything else replicated."""
    ray_sharding = shard_rays(mesh)
    rep = replicate(mesh)

    def step(state, opt_state, batch, key, tv_weight):
        (loss, (psnr, img_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state, batch, key, tv_weight
        )
        updates, opt_state = optimizer.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        return state, opt_state, {"loss": loss, "psnr": psnr, "img_loss": img_loss}

    def batch_shardings(batch: Dict):
        return {k: ray_sharding for k in batch}

    def compile_for(state, opt_state, batch):
        """Bind shardings for a concrete batch structure."""
        in_shardings = (
            jax.tree_util.tree_map(lambda _: rep, state),
            jax.tree_util.tree_map(lambda _: rep, opt_state),
            batch_shardings(batch),
            rep,
            rep,
        )
        return jax.jit(step, in_shardings=in_shardings)

    return compile_for


def shard_train_batch(mesh: Mesh, batch: Dict) -> Dict:
    sharding = shard_rays(mesh)
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}

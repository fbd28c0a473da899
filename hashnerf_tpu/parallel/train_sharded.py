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

import functools
from typing import Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hashnerf_tpu.parallel.mesh import shard_rays, replicate


def make_sharded_train_step(
    mesh: Mesh,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    with_occ: bool = False,
):
    """Returns a jitted train_step(state, opt_state, batch, key, tv_weight)
    with rays sharded on the 'data' axis and everything else replicated.

    with_occ=True adds a trailing occ_grid argument (replicated): the
    per-ray culling flagship's score gather / top-K / compacted composite
    are all ray-axis local, so the occupancy path shards with no extra
    collective beyond the gradient reduction."""
    ray_sharding = shard_rays(mesh)
    rep = replicate(mesh)

    def step(state, opt_state, batch, key, tv_weight, occ_grid=None):
        (loss, (psnr, img_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state, batch, key, tv_weight,
            **({"occ_grid": occ_grid} if with_occ else {}),
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
        ) + ((rep,) if with_occ else ())
        return jax.jit(step, in_shardings=in_shardings)

    return compile_for


def shard_train_batch(mesh: Mesh, batch: Dict) -> Dict:
    sharding = shard_rays(mesh)
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}


# --------------------------------------------------------------------------- #
# DCN-ready data parallelism: bf16 reduce-scatter + sharded optimizer state
# (ZeRO-1) instead of a full fp32 gradient all-reduce.
#
# The replicated-param GSPMD step above all-reduces ~134 MB of fp32 gradients
# per step at chair shapes (SCALING_r03) — the single number that breaks the
# >=85% 2-host scaling gate over DCN. This variant cuts per-step wire bytes
# ~4x: gradients cross the network ONCE as bf16 reduce-scatter shards (P/2
# bytes total), the RAdam update runs on each device's 1/N fp32 master shard
# (optimizer moments never replicated — ZeRO-1), and the updated params are
# re-broadcast as a bf16 all-gather (P/2 bytes). fp32 masters keep full
# update precision; only the forward sees bf16 params (the flagship already
# computes in bf16).
# --------------------------------------------------------------------------- #


def _flatten_chunk_specs(tree, n_dev: int):
    """Per-leaf (flat_size, padded_size) for 1/N chunking."""
    sizes = []
    for x in jax.tree_util.tree_leaves(tree):
        n = int(np.prod(x.shape)) if x.shape else 1
        pad = -(-n // n_dev) * n_dev
        sizes.append((n, pad))
    return sizes


def chunk_params(tree, n_dev: int):
    """Each leaf -> (n_dev, padded/n_dev) fp32, ready to scatter over 'data'."""
    def one(x):
        n = int(np.prod(x.shape)) if x.shape else 1
        pad = -(-n // n_dev) * n_dev
        flat = jnp.pad(x.reshape(-1), (0, pad - n))
        return flat.reshape(n_dev, pad // n_dev)

    return jax.tree_util.tree_map(one, tree)


def unchunk_params(chunked, template):
    """Inverse of chunk_params given the original template shapes/dtypes."""
    def one(c, t):
        n = int(np.prod(t.shape)) if t.shape else 1
        return c.reshape(-1)[:n].reshape(t.shape).astype(t.dtype)

    return jax.tree_util.tree_map(one, chunked, template)


def make_dp_zero_train_step(
    mesh: Mesh,
    loss_fn: Callable,
    optimizer,
    grad_dtype=jnp.bfloat16,
    broadcast_dtype=jnp.bfloat16,
):
    """ZeRO-1 data-parallel step over mesh axis 'data' (shard_map; explicit
    collectives so the wire format is under our control, not GSPMD's).

    Usage:
        master = chunk_params(state, n_dev)            # (n_dev, P_i/n_dev)
        master = device_put(master, P('data', None))   # each dev: its shard
        opt_state = optimizer.init(<local shard tree>) # sharded moments
        step(master, opt_state, batch, key, tv_w) -> (master, opt_state, m)

    Per-step collectives (P = total param bytes fp32):
      reduce-scatter grads  bf16: P/2 wire bytes total;
      all-gather params     bf16: P/2 wire bytes total
    vs the replicated-param GSPMD psum: 2P fp32 wire bytes. The all-gather
    happens at the TOP of the step and the reduce-scatter at the END of
    backward, so the XLA latency-hiding scheduler can overlap both with
    compute (verified from the compiled schedule in bench_scaling).
    """
    from jax import shard_map

    n_dev = mesh.shape["data"]

    def local_step(master, opt_state, batch, key, tv_weight, state_template):
        # local leaf views inside shard_map: (1, chunk)
        # 1) materialize full params from the masters: cast to the broadcast
        # dtype FIRST so the all-gather moves half the bytes.
        def gather_one(c, t):
            g = jax.lax.all_gather(c.astype(broadcast_dtype), "data")
            n = int(np.prod(t.shape)) if t.shape else 1
            return g.reshape(-1)[:n].reshape(t.shape).astype(t.dtype)

        params = jax.tree_util.tree_map(gather_one, master, state_template)

        # 2) local forward/backward on this device's ray shard
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        (loss, (psnr, img_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, key, tv_weight)

        # 3) grads cross the wire once, as bf16 reduce-scatter shards
        def rs_one(g, c):
            chunk = c.shape[-1]
            n = int(np.prod(g.shape)) if g.shape else 1
            flat = jnp.pad(
                (g / n_dev).astype(grad_dtype).reshape(-1),
                (0, chunk * n_dev - n),
            )
            shard = jax.lax.psum_scatter(
                flat.reshape(n_dev, chunk), "data", scatter_dimension=0,
                tiled=False,
            )
            return shard.astype(jnp.float32).reshape(1, chunk)

        grad_shard = jax.tree_util.tree_map(rs_one, grads, master)

        # 4) ZeRO-1: optimizer update on the local fp32 master shard only
        updates, opt_state = optimizer.update(grad_shard, opt_state, master)
        master = optax.apply_updates(master, updates)

        loss = jax.lax.pmean(loss, "data")
        psnr = jax.lax.pmean(psnr, "data")
        img_loss = jax.lax.pmean(img_loss, "data")
        return master, opt_state, {
            "loss": loss, "psnr": psnr, "img_loss": img_loss
        }

    def build(state_template, opt_state_template):
        # abstract template only (shapes/dtypes) — never close over real
        # param arrays, they'd be baked into the program as constants
        state_template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state_template
        )
        chunked = P("data", None)
        rep = P()

        def opt_spec(x):
            return chunked if getattr(x, "ndim", 0) == 2 else rep

        fn = shard_map(
            functools.partial(local_step, state_template=state_template),
            mesh=mesh,
            in_specs=(
                jax.tree_util.tree_map(lambda _: chunked, state_template),
                jax.tree_util.tree_map(opt_spec, opt_state_template),
                P("data"),  # batch dict: rays on 'data'
                rep,
                rep,
            ),
            out_specs=(
                jax.tree_util.tree_map(lambda _: chunked, state_template),
                jax.tree_util.tree_map(opt_spec, opt_state_template),
                rep,
            ),
            check_vma=False,
        )
        return jax.jit(fn)

    return build


def init_dp_zero(mesh: Mesh, state, optimizer):
    """Chunk + place the fp32 masters and the (sharded) optimizer state.

    Returns (master, opt_state): every rank-2 leaf lives P('data', None) —
    each device holds exactly its 1/N fp32 shard of params and moments."""
    n_dev = mesh.shape["data"]
    master = chunk_params(state, n_dev)
    opt_state = optimizer.init(master)
    chunked = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())

    def place(x):
        return jax.device_put(
            x, chunked if getattr(x, "ndim", 0) == 2 else rep
        )

    return (
        jax.tree_util.tree_map(place, master),
        jax.tree_util.tree_map(place, opt_state),
    )

"""Level-parallel (table-sharded) encoding vs the single-device oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashnerf_tpu.ops.hash_encoding import HashGridConfig, hash_encode, init_hash_table
from hashnerf_tpu.parallel.table_sharded import (
    make_table_mesh,
    make_sharded_encoder,
    shard_table,
)


@pytest.mark.parametrize("n_data,n_model", [(2, 4), (4, 2), (1, 8)])
def test_sharded_encode_matches_oracle(n_data, n_model, rng):
    cfg = HashGridConfig(
        n_levels=8, log2_hashmap_size=12, base_resolution=4, finest_resolution=64
    )
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32))

    mesh = make_table_mesh(n_data, n_model)
    encode = make_sharded_encoder(mesh, cfg)
    table_sharded = shard_table(mesh, table)

    feats, keep = encode(table_sharded, x, bmin, bmax)
    want_feats, want_keep = hash_encode(table, x, bmin, bmax, cfg)

    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(want_feats), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(want_keep))


def test_sharded_encode_grads_flow(rng):
    cfg = HashGridConfig(
        n_levels=8, log2_hashmap_size=10, base_resolution=4, finest_resolution=32
    )
    table = init_hash_table(jax.random.PRNGKey(1), cfg)
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))

    mesh = make_table_mesh(2, 4)
    encode = make_sharded_encoder(mesh, cfg)

    def loss_sharded(t):
        f, _ = encode(t, x, bmin, bmax)
        return jnp.sum(f**2)

    def loss_oracle(t):
        f, _ = hash_encode(t, x, bmin, bmax, cfg)
        return jnp.sum(f**2)

    g_sharded = jax.grad(loss_sharded)(shard_table(mesh, table))
    g_oracle = jax.grad(loss_oracle)(table)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_oracle), rtol=1e-4, atol=1e-8
    )

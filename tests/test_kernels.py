"""Pallas kernels vs jnp oracles (run in interpret mode on CPU)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashnerf_tpu.ops.hash_encoding import HashGridConfig, hash_encode, init_hash_table


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on the CPU backend."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_sorted_segment_accumulate_matches_scatter(rng):
    # call the TPU kernel directly (interpret mode) — the public wrapper
    # falls back to XLA scatter on non-TPU backends
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    T = 2048  # 2 windows
    M = 5000
    idx = rng.integers(0, T, M).astype(np.int32)
    vals = rng.normal(size=(M, 2)).astype(np.float32)

    got = _sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T)
    want = jnp.zeros((T, 2)).at[jnp.asarray(idx)].add(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_sorted_segment_accumulate_empty_windows(rng):
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    T = 4096  # 4 windows, hit only window 2
    idx = np.full(100, 2500, np.int32)
    vals = np.ones((100, 2), np.float32)
    got = np.asarray(_sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T))
    assert got[2500, 0] == pytest.approx(100.0)
    assert np.abs(got).sum() == pytest.approx(200.0)


def test_hash_encode_fast_forward_matches_oracle(rng):
    from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast

    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4, finest_resolution=32)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32))

    f1, k1 = hash_encode_fast(table, x, bmin, bmax, cfg)
    f2, k2 = hash_encode(table, x, bmin, bmax, cfg)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_hash_encode_fast_backward_matches_autodiff(rng):
    from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast

    cfg = HashGridConfig(n_levels=2, log2_hashmap_size=10, base_resolution=4, finest_resolution=16)
    table = init_hash_table(jax.random.PRNGKey(1), cfg)
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(0, 1, (50, 3)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(50, cfg.out_dim)).astype(np.float32))

    def loss_fast(t):
        f, _ = hash_encode_fast(t, x, bmin, bmax, cfg)
        return jnp.sum(f * probe)

    def loss_oracle(t):
        f, _ = hash_encode(t, x, bmin, bmax, cfg)
        return jnp.sum(f * probe)

    g_fast = jax.grad(loss_fast)(table)
    g_oracle = jax.grad(loss_oracle)(table)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_oracle), rtol=1e-4, atol=1e-7
    )

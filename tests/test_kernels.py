"""Fast-gradient kernels (multi-operand sort + Pallas aligned-window
segment accumulate, hash-encode custom VJP) vs jnp/numpy oracles.

The public `sorted_segment_accumulate` wrapper falls back to XLA scatter-add
off-TPU, so these tests call the TPU formulation
(`_sorted_segment_accumulate_tpu`) directly — the Pallas kernel runs in
interpret mode on the CPU backend.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashnerf_tpu.ops.hash_encoding import HashGridConfig, hash_encode, init_hash_table


def test_sorted_segment_accumulate_matches_scatter(rng):
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    T = 2048
    M = 5000
    idx = rng.integers(0, T, M).astype(np.int32)
    vals = rng.normal(size=(M, 2)).astype(np.float32)

    got = _sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T)
    want = jnp.zeros((T, 2)).at[jnp.asarray(idx)].add(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_sorted_segment_accumulate_single_hot_row(rng):
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    T = 4096
    idx = np.full(100, 2500, np.int32)
    vals = np.ones((100, 2), np.float32)
    got = np.asarray(_sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T))
    assert got[2500, 0] == pytest.approx(100.0)
    assert np.abs(got).sum() == pytest.approx(200.0)


def test_sorted_segment_accumulate_sparse(rng):
    """Sparse index distributions (mostly-empty windows) must stay exact —
    the aligned-window kernel handles any density."""
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    T = 1 << 16
    M = 3000  # density 0.046 — blocks of 1024 sorted elements span >> R rows
    idx = rng.integers(0, T, M).astype(np.int32)
    vals = rng.normal(size=(M, 2)).astype(np.float32)
    got = _sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T)
    want = jnp.zeros((T, 2)).at[jnp.asarray(idx)].add(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_sorted_segment_accumulate_large_m_correlated_signs(rng):
    """ADVICE r1: large-M, all-same-sign accumulation must not lose small
    rows to fp32 prefix cancellation (the round-1 formulation did). The
    one-hot-matmul path accumulates each row from exact 0/1-weighted dot
    products; compare against a float64 oracle."""
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    M, T = 200_000, 1024
    # all-positive values ≈ 1.0: a running fp32 prefix would reach 2e5 and
    # its rounding would swamp small rows (the round-1 failure mode); the
    # windowed one-hot accumulation keeps error local to each row.
    idx = rng.integers(0, T, M).astype(np.int32)
    vals = rng.uniform(0.5, 1.5, size=(M, 1)).astype(np.float32)

    got = np.asarray(
        _sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T)
    )
    want = np.zeros((T, 1), np.float64)
    np.add.at(want, idx, vals.astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-5)


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


def test_sorted_segment_accumulate_wide_f(rng):
    """F>4 routes through the 2-op sort + permute path; stays exact."""
    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    T, M = 2048, 4000
    idx = rng.integers(0, T, M).astype(np.int32)
    vals = rng.normal(size=(M, 8)).astype(np.float32)
    got = _sorted_segment_accumulate_tpu(jnp.asarray(idx), jnp.asarray(vals), num_rows=T)
    want = jnp.zeros((T, 8)).at[jnp.asarray(idx)].add(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_permute_rows_backward_is_inverse_gather():
    """permute_rows: fwd = x[perm]; VJP must equal plain autodiff of the
    gather (a permutation's transpose is the inverse permutation gather)."""
    import jax
    import jax.numpy as jnp
    from hashnerf_tpu.kernels.gather_vjp import permute_rows

    rng = np.random.default_rng(3)
    N, C = 257, 4
    x = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    inv = jnp.argsort(perm)
    cot = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    out = permute_rows(x, perm, inv)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[np.asarray(perm)])

    g_fast = jax.grad(lambda x: jnp.vdot(permute_rows(x, perm, inv), cot))(x)
    g_ref = jax.grad(lambda x: jnp.vdot(jnp.take(x, perm, axis=0), cot))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), rtol=1e-6)

"""Scatter-add as sort + prefix-sum difference — zero scatter ops, O(M + T).

WHY: the backward of the hash-grid gather is a scatter-add of M ≈ 1-25M
(row, F-vector) updates into a T ≈ 4M-row table. XLA's TPU scatter serializes
row updates (~60-80 ns each → seconds per step). A previous version of this
file used a Pallas windowed one-hot kernel; it beat XLA scatter ~10x but its
work was O(T × CHUNK) — ~80 ms/call in the chair config, which dominated the
whole train step (measured: 2 calls ≈ 160 ms of a 182 ms step).

This formulation is pure data movement + dense arithmetic, all XLA-native:

  1. sort (idx, iota) by idx                — bitonic, O(M log^2 M) regular;
  2. permute vals by the sort permutation    — one M-row gather;
  3. csum = exclusive-prefix-sum over sorted vals (O(M·F) VPU);
  4. ends[r] = searchsorted(sidx, r, 'right') — count of entries with idx<=r;
  5. out[r] = csum[ends[r]] - csum[ends[r-1]] — one T-row gather + a shift.

Total work is O(M log^2 M + T·F): tens of MB of sequential HBM traffic, a
few ms where the window kernel took ~80. No scatter primitive anywhere.

NUMERICS: rows are sums of prefix differences, so each row's absolute error
is bounded by the fp32 rounding of the running prefix at that point
(~eps·|csum|). Gradient entries into the hash table have random signs, so the
prefix stays near sqrt(M)·|v| and the relative row error is ~1e-5 — far below
SGD noise. The XLA scatter path (CPU fallback below) remains the exact oracle
and the unit tests compare against it (tests/test_kernels.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sorted_segment_accumulate(
    idx: jnp.ndarray,  # (M,) int32 row ids, ARBITRARY order
    vals: jnp.ndarray,  # (M, F) float32
    num_rows: int,
) -> jnp.ndarray:
    """Dense equivalent of zeros((num_rows, F)).at[idx].add(vals).

    Uses the sort + prefix-sum-difference formulation on TPU; on other
    backends (CPU tests) XLA's scatter-add is already adequate.
    """
    if jax.default_backend() != "tpu":
        return jnp.zeros((num_rows, vals.shape[-1]), vals.dtype).at[idx].add(vals)
    return _sorted_segment_accumulate_tpu(idx, vals, num_rows)


@functools.partial(jax.jit, static_argnames=("num_rows",))
def _sorted_segment_accumulate_tpu(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    num_rows: int,
) -> jnp.ndarray:
    M, F = vals.shape

    # 1-2. Sort indices (carrying the permutation, 2 operands — cheaper than
    # sorting all F value columns) and permute the values with one gather.
    sidx, perm = jax.lax.sort(
        (idx.astype(jnp.int32), jnp.arange(M, dtype=jnp.int32)), num_keys=1
    )
    svals = jnp.take(vals, perm, axis=0)

    # 3. Inclusive prefix sum, with a leading zero row so csum[k] = sum of the
    # first k sorted entries.
    csum = jnp.concatenate(
        [jnp.zeros((1, F), vals.dtype), jnp.cumsum(svals, axis=0)], axis=0
    )  # (M+1, F)

    # 4. ends[r] = number of entries with idx <= r.
    ends = jnp.searchsorted(
        sidx, jnp.arange(num_rows, dtype=jnp.int32), side="right"
    )

    # 5. Row r's sum = csum[ends[r]] - csum[ends[r-1]] (ends[-1] := 0 → the
    # shifted gather's first row must subtract csum[0] = 0, which the leading
    # zero row provides via prepending a 0 index).
    e = jnp.take(csum, ends, axis=0)  # (T, F)
    prev = jnp.concatenate([jnp.zeros((1, F), vals.dtype), e[:-1]], axis=0)
    return e - prev

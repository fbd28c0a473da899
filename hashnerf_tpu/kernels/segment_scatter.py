"""Scatter-add as sort + scanned one-hot MXU accumulation — no scatter op.

WHY: the backward of the hash-grid gather is a scatter-add of M ≈ 1-25M
(row, F-vector) updates into a T ≈ 4M-row table. Measured on the v5e
(tools/tpu_microbench.py, chair scale M=12.6M, T=4.2M):

    XLA scatter-add                      1056 ms   (serialized row updates)
    round-1 sort+prefix-sum-difference   1078 ms   — of which:
        sort (idx, iota)                   52 ms
        permute vals (random gather)      200 ms
        cumsum                             59 ms
        searchsorted over T rows          747 ms   ← XLA lowers this as a
                                                     per-query binary-search
                                                     loop; the real killer

This formulation keeps the (cheap, regular) sort and replaces everything
else with dense MXU work:

  1. multi-operand sort (idx, val_0..val_{F-1})  — carries the values through
     the sort network, eliminating the 200 ms random permute-gather;
  2. scan over blocks of P sorted elements: each block's rows live in the
     narrow window [first, first+R) of the accumulator (sorted order ⇒
     locality), so the block's contribution is ONE-HOT MATMUL
     onehot(idx-first) (R,P) @ vals (P,F) added into a dynamic slice of the
     accumulator — exact 0/1 weights in f32, equivalent to scatter-add up to
     summation order.

Cost: sort O(M log^2 M) + M·R VPU compares + M·R·F MXU MACs + 2·(R·F) slice
traffic per block — ~50-190 ms at chair scale, 5-20x the round-1 path.

EXACTNESS GUARD: if any block of P sorted elements spans more than R rows
(possible only when the occupied-row density falls below P/R — never for the
shipped configs, where density ≥ 0.7 — or for adversarial index
distributions), a vectorized span check routes the WHOLE call to XLA's exact
scatter via lax.cond. No silent truncation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

def _pow2_ceil(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


def _choose_pr(m: int, num_rows: int):
    """Static block geometry from the statically-known mean density M/T.

    Expected span of a P-element sorted block is P/d rows; R = ~3x that
    (Chernoff makes overflow astronomically unlikely at these sizes, and the
    exact fallback guards the rest). VPU compare cost is M*R; VMEM for the
    one-hot tile is R*P*4B — both bounded by the clamps."""
    d = max(m / num_rows, 1e-6)
    p = min(1024, max(128, _pow2_ceil(2048 * d) // 2))
    r = min(8192, max(512, _pow2_ceil(3 * p / d)))
    return p, r


def sorted_segment_accumulate(
    idx: jnp.ndarray,  # (M,) int32 row ids, ARBITRARY order
    vals: jnp.ndarray,  # (M, F) float32
    num_rows: int,
) -> jnp.ndarray:
    """Dense equivalent of zeros((num_rows, F)).at[idx].add(vals).

    PRECONDITION: every element of ``idx`` must be in [0, num_rows). All
    callers pass hash/table indices that are in-range by construction; XLA's
    scatter on the fallback/oracle path silently drops out-of-range indices.

    Uses the sort + scanned one-hot-matmul formulation on TPU; on other
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
    P, R = _choose_pr(M, num_rows)

    # 1. Multi-operand sort: values ride through the sort network.
    ops = jax.lax.sort(
        (idx.astype(jnp.int32),) + tuple(vals[:, f] for f in range(F)),
        num_keys=1,
    )
    sidx, svals = ops[0], jnp.stack(ops[1:], axis=-1)  # (M,), (M, F)

    # Pad M to whole blocks with copies of the LAST index (keeps sortedness
    # and block spans tight) and zero values (contribute nothing).
    nb = -(-M // P)
    pad = nb * P - M
    if pad:
        sidx = jnp.concatenate([sidx, jnp.broadcast_to(sidx[-1:], (pad,))])
        svals = jnp.concatenate([svals, jnp.zeros((pad, F), svals.dtype)])
    sidx_b = sidx.reshape(nb, P)
    svals_b = svals.reshape(nb, P, F)

    # 2. Exactness guard: every block must fit its R-row window.
    firsts = sidx_b[:, 0]
    spans = sidx_b[:, -1] - firsts
    fits = jnp.all(spans < R)

    def onehot_path(_):
        col = jax.lax.broadcasted_iota(jnp.int32, (R, P), 0)  # window-row ids

        def body(acc, xs):
            bidx, bvals = xs  # (P,), (P, F)
            first = bidx[0]
            local = bidx - first  # (P,) in [0, R) when fits
            oh = (local[None, :] == col).astype(jnp.float32)  # (R, P) exact
            delta = jax.lax.dot_general(
                oh, bvals,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, F) — 0/1 × f32 values: exact up to summation order
            cur = jax.lax.dynamic_slice(acc, (first, 0), (R, F))
            acc = jax.lax.dynamic_update_slice(acc, cur + delta, (first, 0))
            return acc, None

        # R-row window may hang off the table end: accumulate into a padded
        # buffer and slice the real rows off afterwards.
        acc0 = jnp.zeros((num_rows + R, F), vals.dtype)
        acc, _ = jax.lax.scan(body, acc0, (sidx_b, svals_b))
        return acc[:num_rows]

    def scatter_path(_):
        return jnp.zeros((num_rows, F), vals.dtype).at[sidx].add(svals)

    return jax.lax.cond(fits, onehot_path, scatter_path, None)

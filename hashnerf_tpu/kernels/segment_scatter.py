"""Scatter-add as multi-operand sort + Pallas segment-sum — no scatter op.

WHY: the backward of the hash-grid gather is a scatter-add of M ≈ 1-25M
(row, F-vector) updates into a T ≈ 4M-row table. Measured on the v5e
(tools/tpu_lab.py micro, chair scale M=12.6M, T=4.2M):

    XLA scatter-add                          1056 ms  (serialized row updates)
    round-1 sort + prefix-sum-difference     1078 ms  (747 ms of it: XLA
                                                       searchsorted = per-query
                                                       binary-search loops)
    sort + XLA scan of one-hot matmuls        148 ms  (first round-2 cut; the
                                                       one-hot round-trips HBM
                                                       and lax.scan costs
                                                       ~30 us/block)
    sort + Pallas aligned-window kernel       this file

Pipeline:

  1. ONE multi-operand sort carries the F value columns with the row ids —
     jax.lax.sort is the TPU's "gather engine": perfectly regular, ~4 ns/elt
     (the 200 ms random permute-gather it replaces ran at ~60M rows/s);
  2. kernels/pallas_segment_accum.py reduces the sorted runs: grid over
     aligned R-row output windows, scalar-prefetched range boundaries, per
     chunk one-hot (R,P) built in VMEM and fed straight to the MXU —
     elements are read exactly once, the one-hot never touches HBM, and any
     index distribution (dense, sparse, fully-skewed) is handled exactly.

Exactness: 0/1 one-hot weights in f32, f32 accumulation — equal to
scatter-add up to summation order (unit-tested against a float64 oracle with
2e5 same-sign values; the round-1 formulation lost small rows to fp32 prefix
cancellation at large M, see ADVICE.md r1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hashnerf_tpu.kernels.pallas_segment_accum import segment_accumulate_sorted


def sorted_segment_accumulate(
    idx: jnp.ndarray,  # (M,) int32 row ids, ARBITRARY order
    vals: jnp.ndarray,  # (M, F) float32
    num_rows: int,
) -> jnp.ndarray:
    """Dense equivalent of zeros((num_rows, F)).at[idx].add(vals).

    PRECONDITION: every element of ``idx`` must be in [0, num_rows). All
    callers pass hash/table indices that are in-range by construction; XLA's
    scatter on the fallback/oracle path silently drops out-of-range indices.

    Uses the sort + Pallas formulation on TPU; on other backends (CPU tests)
    XLA's scatter-add is already adequate.
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
    if F <= 4:
        # Multi-operand sort: values ride through the sort network with the
        # keys (cheaper than a separate permute-gather for few columns).
        ops = jax.lax.sort(
            (idx.astype(jnp.int32),) + tuple(vals[:, f] for f in range(F)),
            num_keys=1,
        )
        sidx, svals_fm = ops[0], jnp.stack(ops[1:], axis=0)  # (M,), (F, M)
    else:
        # Wide F: sort cost grows per carried operand (~2 ns/elt each), so a
        # 2-operand sort + one row-gather permute (~7 ns/row regardless of
        # width, tpu_lab micro) wins beyond F ≈ 4-6.
        sidx, perm = jax.lax.sort(
            (idx.astype(jnp.int32), jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        svals_fm = jnp.take(vals, perm, axis=0).T
        # F rides the 8-sublane-tiled axis of the (F, M) value array inside
        # the Pallas kernel; pad to a sublane multiple (e.g. the packed fine
        # layout's 27F=108) so block shapes stay tile-exact.
        if F % 8:
            svals_fm = jnp.pad(svals_fm, ((0, 8 - F % 8), (0, 0)))
    out = segment_accumulate_sorted(
        sidx, svals_fm, num_rows, interpret=jax.default_backend() != "tpu"
    )
    return out[:, :F] if out.shape[1] != F else out

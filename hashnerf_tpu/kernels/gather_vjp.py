"""Row gather with a fast-scatter backward (custom VJP).

`take_rows(table, idx)` == `table[idx]` forward; the backward routes the
row-gradient accumulation through kernels.segment_scatter instead of XLA's
slow scatter-add. Used by the TV regularizer (loss gathers ~2M hash rows per
level set) and anywhere else table rows are gathered under grad.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hashnerf_tpu.kernels.segment_scatter import sorted_segment_accumulate


@jax.custom_vjp
def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table: (T, F); idx: int32 (...,) -> (..., F)."""
    return jnp.take(table, idx, axis=0)


def _fwd(table, idx):
    return jnp.take(table, idx, axis=0), (table.shape, idx)


def _bwd(res, g):
    (T, F), idx = res
    d_table = sorted_segment_accumulate(
        idx.reshape(-1), g.reshape(-1, F), num_rows=T
    )
    return d_table, None


take_rows.defvjp(_fwd, _bwd)


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, perm: jnp.ndarray, inv_perm: jnp.ndarray):
    """x: (N, C) -> x[perm]; perm MUST be a permutation with inverse inv_perm.

    Unlike take_rows, the backward needs NO accumulation: the transpose of a
    permutation gather is the inverse permutation gather (d_x = g[inv_perm]).
    Saves the sort + Pallas segment pass for the culling un-permute
    (render/occupancy.py), where both directions are known a priori.
    """
    return jnp.take(x, perm, axis=0)


def _prows_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), inv_perm


def _prows_bwd(inv_perm, g):
    return jnp.take(g, inv_perm, axis=0), None, None


permute_rows.defvjp(_prows_fwd, _prows_bwd)

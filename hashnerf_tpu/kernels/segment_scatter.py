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
  3. blocked prefix structure over sorted vals: intra-block exclusive cumsums
     (blocks of ``_BLOCK``), per-block totals, and a block-offset prefix;
  4. ends[r] = searchsorted(sidx, r, 'right') — count of entries with idx<=r;
  5. each row's sum assembled from intra-block cumsum differences + whole
     block totals — a handful of T-row gathers, no scatter anywhere.

Total work is O(M log^2 M + T·F): tens of MB of sequential HBM traffic, a
few ms where the window kernel took ~80. No scatter primitive anywhere.

NUMERICS (the reason for the blocked assembly): a single running fp32 prefix
over M same-sign entries grows to ~M·|v|, and differencing it loses
eps·M·|v| absolutely — catastrophic for small rows (ADVICE.md round 1). Here
a row's sum over sorted positions [s, e) is assembled as

  same block:        intra[e] - intra[s]                (offsets never enter)
  adjacent blocks:   (total[b_s] - intra[s]) + intra[e] (pure intra terms)
  spanning blocks:   + (offs[b_e] - offs[b_s+1])        (middle block totals)

so the error is bounded by eps·_BLOCK·max|v| for the intra terms, plus — only
for rows whose segments span ≥ 2 block boundaries, i.e. rows with ≥ _BLOCK
entries — a relative O(eps·M/_BLOCK) on the middle part, which is itself a
lower bound on such a row's magnitude. Small rows are exact to intra-block
precision no matter how large M grows. Verified against a float64 oracle at
M=2e6 with all-positive values (tests/test_kernels.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Prefix-sum block size: intra-block error is O(eps·_BLOCK·max|v|); rows
# spanning a whole block amortize the block-offset error over ≥_BLOCK entries.
_BLOCK = 4096


def sorted_segment_accumulate(
    idx: jnp.ndarray,  # (M,) int32 row ids, ARBITRARY order
    vals: jnp.ndarray,  # (M, F) float32
    num_rows: int,
) -> jnp.ndarray:
    """Dense equivalent of zeros((num_rows, F)).at[idx].add(vals).

    PRECONDITION: every element of ``idx`` must be in [0, num_rows). The TPU
    path assumes it (a negative idx would fold into row 0's sum); XLA's
    scatter on the fallback path silently drops out-of-range indices. All
    callers pass hash/table indices that are in-range by construction.

    Uses the sort + blocked-prefix-difference formulation on TPU; on other
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
    B = _BLOCK

    # 1-2. Sort indices (carrying the permutation, 2 operands — cheaper than
    # sorting all F value columns) and permute the values with one gather.
    sidx, perm = jax.lax.sort(
        (idx.astype(jnp.int32), jnp.arange(M, dtype=jnp.int32)), num_keys=1
    )
    svals = jnp.take(vals, perm, axis=0)

    # 3. Blocked prefix structure (pad M to a whole number of blocks).
    nb = -(-M // B)
    pad = nb * B - M
    v = jnp.pad(svals, ((0, pad), (0, 0))) if pad else svals
    v = v.reshape(nb, B, F)
    incl = jnp.cumsum(v, axis=1)  # inclusive intra-block cumsum
    totals = incl[:, -1, :]  # (nb, F) block totals
    # intra[k] = sum over [block_start(k), k) — exclusive within block
    intra = jnp.concatenate([jnp.zeros((nb, 1, F), v.dtype), incl[:, :-1, :]], 1)
    intra = intra.reshape(nb * B, F)
    # offs[b] = sum of totals of blocks < b, (nb+1, F)
    offs = jnp.concatenate(
        [jnp.zeros((1, F), v.dtype), jnp.cumsum(totals, axis=0)], axis=0
    )

    # 4. Segment boundaries per output row: positions [starts[r], ends[r]).
    ends = jnp.searchsorted(
        sidx, jnp.arange(num_rows, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)

    # 5. Assemble row sums. starts[r] = ends[r-1], so every starts-indexed
    # gather is a shift of the corresponding ends-indexed gather — one big
    # gather instead of two. intra is indexed at positions in [0, nb*B]; a
    # position equal to nb*B (possible for ends == M with pad == 0) reads the
    # "start of a virtual next block": intra value 0, block id nb — append a
    # sentinel row so the gather stays in range.
    intra_s = jnp.concatenate([intra, jnp.zeros((1, F), v.dtype)], axis=0)
    i_e = jnp.take(intra_s, ends, axis=0)  # (T, F) intra[e]
    i_s = jnp.concatenate([jnp.zeros((1, F), v.dtype), i_e[:-1]], axis=0)
    b_e = ends // B
    b_s = jnp.concatenate([jnp.zeros((1,), jnp.int32), b_e[:-1]])
    same = (b_e == b_s)[:, None]
    adj = (b_e == b_s + 1)[:, None]
    tot_bs = jnp.take(totals, jnp.minimum(b_s, nb - 1), axis=0)
    # middle whole-block totals for spanning rows: offs[b_e] - offs[b_s + 1]
    mid = jnp.take(offs, jnp.minimum(b_e, nb), axis=0) - jnp.take(
        offs, jnp.minimum(b_s + 1, nb), axis=0
    )
    out = jnp.where(
        same,
        i_e - i_s,
        (tot_bs - i_s) + i_e + jnp.where(adj, 0.0, mid),
    )
    return out

"""Ray-march z-value samplers: stratified and hierarchical (inverse-CDF).

Capability parity: /root/reference/run_nerf_helpers.py:514-536 (stratified
sampling inside render_rays) and :264-307 (sample_pdf). RNG is explicit JAX
keys instead of global torch RNG; `det=True` reproduces the deterministic
linspace path the reference uses at test time (perturb == 0).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    N_samples: int,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Deterministic z-values linearly in depth (or inverse depth).

    near/far: (N_rays,) or (N_rays, 1). Returns (N_rays, N_samples).
    """
    near = near.reshape(-1, 1)
    far = far.reshape(-1, 1)
    t_vals = jnp.linspace(0.0, 1.0, N_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    return z_vals


def perturb_z_vals(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter of z-values within their mid-point intervals
    (reference run_nerf_helpers.py:522-536)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t_rand = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t_rand


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    N_samples: int,
    det: bool = False,
    u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-transform sampling from the piecewise-constant weight PDF.

    bins: (N_rays, M) z-mid bin edges; weights: (N_rays, M-1).
    Returns (N_rays, N_samples) new z samples.
    `u` overrides the uniform draws (golden-test seam, mirroring the
    reference's `pytest=` hook at run_nerf_helpers.py:278-287).
    """
    weights = weights + 1e-5  # prevent nans
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (N_rays, M)

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, N_samples)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
        else:
            u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,))

    # searchsorted(side='right') == count of cdf entries <= u. With only
    # M ≈ 64-192 bins a dense compare-reduce is ~10x faster on the VPU than
    # XLA's per-query binary-search searchsorted (measured 12 ms -> ~1 ms at
    # 1024x128 on the v5e; tools/tpu_lab.py probes).
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    if jax.default_backend() == "tpu":
        # The bin values are fetched with one-hot masked reductions instead
        # of take_along_axis: per-element gathers cost ~16 ns/row on TPU
        # (~2M rows = ~30 ms at 4096x128) while the (R, S, M) select+sum
        # fuses into VPU work XLA never materializes. Exact — the one-hot
        # selects the identical element.
        m_iota = jnp.arange(cdf.shape[-1])
        oh_below = m_iota == below[..., None]  # (R, S, M)
        oh_above = m_iota == above[..., None]
        cdf_b = cdf[..., None, :]
        bins_b = bins[..., None, :]
        cdf_below = jnp.sum(jnp.where(oh_below, cdf_b, 0.0), -1)
        cdf_above = jnp.sum(jnp.where(oh_above, cdf_b, 0.0), -1)
        bins_below = jnp.sum(jnp.where(oh_below, bins_b, 0.0), -1)
        bins_above = jnp.sum(jnp.where(oh_above, bins_b, 0.0), -1)
    else:
        # On CPU/GPU (tests, virtual-mesh runs) XLA does not fuse the
        # (R, S, M) selects away — plain gathers are cheaper and lighter on
        # memory there (same backend switch as
        # kernels.segment_scatter.sorted_segment_accumulate).
        cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
        bins_below = jnp.take_along_axis(bins, below, axis=-1)
        bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sorted_uniform(key: jax.Array, shape) -> jnp.ndarray:
    """Draw u ~ sorted iid Uniform(0,1) along the LAST axis, without a sort.

    Uses the exponential-spacings construction: if E_1..E_{n+1} ~ Exp(1),
    then (cumsum(E)_i / sum(E))_{i=1..n} is distributed exactly as the order
    statistics of n iid uniforms. Feeding sorted u through the monotone
    inverse-CDF of `sample_pdf` yields z-samples whose MULTISET has the
    identical law as the reference's iid draws (run_nerf_helpers.py:264-307)
    while arriving already sorted — which turns the downstream coarse+fine
    z-merge (run_nerf_helpers.py:551 `torch.sort(torch.cat(...))`) into a
    rank-based merge of two sorted lists (`merge_sorted`), removing the full
    generic sort from the hot path.
    """
    e = jax.random.exponential(key, shape[:-1] + (shape[-1] + 1,))
    c = jnp.cumsum(e, axis=-1)
    return c[..., :-1] / c[..., -1:]


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row SORTED arrays a: (..., n), b: (..., m) -> (..., n+m).

    Rank-based: each element's merged position is its own index plus a dense
    compare-count against the other list (the same VPU compare-reduce trick
    as `sample_pdf`'s searchsorted), then a one-hot masked sum places it —
    no generic sort network. Ties broken a-first (stable), matching
    jnp.sort(concatenate([a, b])) exactly for distinct values.
    """
    n, m = a.shape[-1], b.shape[-1]
    # position of a[i]: i + #{j : b[j] < a[i]}; position of b[j]:
    # j + #{i : a[i] <= b[j]} — consistent tie-break => valid permutation.
    pos_a = jnp.arange(n) + jnp.sum(
        (b[..., None, :] < a[..., :, None]).astype(jnp.int32), axis=-1
    )
    pos_b = jnp.arange(m) + jnp.sum(
        (a[..., None, :] <= b[..., :, None]).astype(jnp.int32), axis=-1
    )
    k = jnp.arange(n + m)
    out = jnp.sum(jnp.where(pos_a[..., :, None] == k, a[..., :, None], 0.0), -2)
    out = out + jnp.sum(
        jnp.where(pos_b[..., :, None] == k, b[..., :, None], 0.0), -2
    )
    return out

"""Occupancy-grid sample culling (Instant-NGP-style, opt-in).

The PyTorch reference queries the network at every one of the 192 z-samples
per ray; upstream Instant-NGP's actual speed comes from skipping empty space
via a cached occupancy grid. This module adds that capability TPU-first:

  * a dense (R^3,) sigma-EMA grid over the scene bbox (R=128 -> 8 MB fp32,
    lives in HBM, gathered per-point — ~1 ms for a full train batch);
  * periodic updates: decay everywhere + max-update at jittered sample cells
    (density-only queries of the live model);
  * static-shape culling: points are PARTITIONED (occupied first) with one
    argsort, only the first K (static budget) are encoded/MLP'd, and raw
    outputs are un-permuted with a second take — no dynamic shapes, no
    scatter.

Culled points contribute sigma=0 (== empty space), so compositing semantics
match the reference integrator exactly wherever the grid agrees with the
field. Enable with --use_occupancy (off by default for strict parity).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    resolution: int = 128
    ema_decay: float = 0.95
    threshold: float = 1e-2
    update_every: int = 16
    n_update_samples: int = 1 << 16
    keep_fraction: float = 0.5
    warmup_steps: int = 256  # no culling until the grid has seen the field

    @property
    def n_cells(self) -> int:
        return self.resolution**3


def init_occupancy_grid(cfg: OccupancyConfig) -> jnp.ndarray:
    # Zeros: culling only activates after warmup_steps, by which point the
    # update loop has populated the grid from the live density field.
    return jnp.zeros((cfg.n_cells,), jnp.float32)


def _cell_index(pts: jnp.ndarray, bbox: jnp.ndarray, R: int) -> jnp.ndarray:
    rel = (pts - bbox[0]) / (bbox[1] - bbox[0])
    ijk = jnp.clip((rel * R).astype(jnp.int32), 0, R - 1)
    return (ijk[..., 0] * R + ijk[..., 1]) * R + ijk[..., 2]


def occupancy_lookup(
    grid: jnp.ndarray, pts: jnp.ndarray, bbox: jnp.ndarray, cfg: OccupancyConfig
) -> jnp.ndarray:
    """bool (N,): point's cell passes the density threshold.

    Adaptive threshold min(cfg.threshold, mean(grid)): early in training the
    density scale is far below any fixed cutoff — a fixed threshold would
    cull everything and stall optimization. The mean tracks the field's own
    scale; the fixed value caps it once density has concentrated.
    """
    idx = _cell_index(pts, bbox, cfg.resolution)
    thr = jnp.minimum(cfg.threshold, jnp.mean(grid))
    return jnp.take(grid, idx) > thr


def occupancy_scores(
    grid: jnp.ndarray, pts: jnp.ndarray, bbox: jnp.ndarray, cfg: OccupancyConfig
) -> jnp.ndarray:
    """float (N,): each point's cell density EMA; out-of-bbox points -> -1.

    Used for BUDGETED culling: keeping the top-keep_k points by score (rather
    than thresholding) guarantees the static budget is spent on the densest
    cells — a hard threshold either overflows the budget (dropping truly
    occupied points while keeping empty ones) or starves it.
    """
    idx = _cell_index(pts, bbox, cfg.resolution)
    in_bbox = jnp.all((pts >= bbox[0]) & (pts <= bbox[1]), axis=-1)
    return jnp.where(in_bbox, jnp.take(grid, idx), -1.0)


@partial(jax.jit, static_argnames=("cfg", "sigma_fn"))
def update_occupancy_grid(
    grid: jnp.ndarray,
    key: jax.Array,
    bbox: jnp.ndarray,
    cfg: OccupancyConfig,
    sigma_fn,
) -> jnp.ndarray:
    """EMA decay + max-update at uniformly sampled jittered cells.

    sigma_fn(pts (N,3)) -> sigma (N,) from the live model (density head only).
    """
    R = cfg.resolution
    k_cell, k_jit = jax.random.split(key)
    cells = jax.random.randint(k_cell, (cfg.n_update_samples,), 0, cfg.n_cells)
    ijk = jnp.stack(
        [cells // (R * R), (cells // R) % R, cells % R], axis=-1
    ).astype(jnp.float32)
    u = jax.random.uniform(k_jit, (cfg.n_update_samples, 3))
    rel = (ijk + u) / R
    pts = bbox[0] + rel * (bbox[1] - bbox[0])
    sigma = jax.nn.relu(sigma_fn(pts))

    grid = grid * cfg.ema_decay
    return grid.at[cells].max(sigma)


def cull_points(
    occ: jnp.ndarray,  # (N,) bool mask (True = keep) or float scores
    keep_k: int,
):
    """Static-shape partition: indices of the keep_k best points first.

    Bool input: occupied points first (stable). Float input: descending by
    score, so the static budget always goes to the densest cells.
    Returns (kept_idx (K,), order (N,), inv_perm (N,)): order sorts points
    best-first, inv_perm maps permuted positions back to original order
    (take-based unsort, no scatter); order is inv_perm's inverse, handed to
    the un-permute so its backward is a plain gather (permute_rows).
    """
    if occ.dtype == jnp.bool_:
        order = jnp.argsort(~occ, stable=True)  # (N,)
    else:
        order = jnp.argsort(-occ, stable=True)
    kept_idx = order[:keep_k]
    inv_perm = jnp.argsort(order, stable=True)  # positions of each original pt
    return kept_idx, order, inv_perm


def query_with_culling(
    query_fn,
    state,
    pts: jnp.ndarray,  # (Rr, S, 3)
    viewdirs: Optional[jnp.ndarray],  # (Rr, 3) or None
    bbox: jnp.ndarray,
    grid: jnp.ndarray,
    cfg: OccupancyConfig,
    keep_k: int,
    fine: bool = False,
) -> jnp.ndarray:
    """Like query_fn but only encodes/MLPs the first keep_k occupied points;
    culled points get raw = 0 (sigma 0 == empty space)."""
    Rr, S = pts.shape[0], pts.shape[1]
    flat = pts.reshape(-1, 3)
    # Budgeted top-k by density score. Out-of-bbox points score -1 (their
    # sigma is zeroed by the query anyway, so culling them is EXACTLY
    # semantics-preserving — and for unbounded near/far ranges a large share
    # of stratified samples lies outside the bbox).
    scores = occupancy_scores(grid, flat, bbox, cfg)
    kept_idx, order, inv_perm = cull_points(scores, keep_k)

    pts_kept = jnp.take(flat, kept_idx, axis=0)[None]  # (1, K, 3)
    dirs_kept = None
    if viewdirs is not None:
        dirs_flat = jnp.broadcast_to(viewdirs[:, None, :], (Rr, S, 3)).reshape(-1, 3)
        # query_fn broadcasts viewdirs per "ray"; pass per-point dirs as S=1 rays
        pts_kept = jnp.take(flat, kept_idx, axis=0)[:, None, :]  # (K, 1, 3)
        dirs_kept = jnp.take(dirs_flat, kept_idx, axis=0)  # (K, 3)

    raw_kept = query_fn(state, pts_kept, dirs_kept, bbox, fine=fine)
    raw_kept = raw_kept.reshape(keep_k, -1)  # (K, C)
    C = raw_kept.shape[-1]

    # permuted layout: first K rows = kept raws, the rest zeros; un-permute
    # with a take (no scatter). inv_perm is a PERMUTATION whose inverse
    # (order) we already hold, so the backward is a plain inverse-permutation
    # gather (kernels.gather_vjp.permute_rows) — no sort, no accumulation.
    n = flat.shape[0]
    raw_perm = jnp.concatenate(
        [raw_kept, jnp.zeros((n - keep_k, C), raw_kept.dtype)], axis=0
    )
    # row j of raw_perm corresponds to original point order[j]; original point
    # i lives at permuted position inv_perm[i].
    from hashnerf_tpu.kernels.gather_vjp import permute_rows

    raw = permute_rows(raw_perm, inv_perm, order)
    # safety: a kept-but-unoccupied pad point (when occupied < K) is fine (its
    # true sigma), but an occupied point beyond the K budget must read as
    # empty: that is already the zeros tail.
    return raw.reshape(Rr, S, C)

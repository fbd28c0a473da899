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
    # How the static keep budget is selected (cull_points):
    #   "sort2"  — argsort scores + argsort the permutation (round-3 path);
    #   "sort1"  — one argsort, inverse via a unique-index scatter;
    #   "cumsum" — sort-FREE: histogram threshold + stable cumsum partition
    #              (approximate top-k: the marginal histogram bin is filled
    #              in index order rather than score order).
    partition: str = "sort1"
    # Importance-sampled grid updates: half the update samples target the
    # strongest occupied macro-blocks (+-1-cell jitter covers neighbors)
    # instead of uniform cells — sharpens the grid near the surface so
    # tighter keep budgets hold quality (VERDICT r3 #9).
    adaptive_update: bool = False
    # Per-RAY culling (round 4): each ray keeps its top ceil(S*keep_fraction)
    # samples by score, compacted in z order and composited with their
    # ORIGINAL per-sample dists — transmittance over kept samples then
    # matches the zero-fill composite to ~1e-8 (culled alpha=0 terms drop
    # out of the cumprod up to its 1e-10 epsilon; see ops/volume.py
    # raw2outputs for the epsilon + raw_noise_std caveats). Removes the global cull sort AND the un-permute gather from
    # the hot path (PROFILE_r04.md: 2.0 + 2.1 ms of the 21 ms step) and
    # shards cleanly over the ray axis (no cross-ray collective). The only
    # semantic delta vs the global budget is allocation: every ray gets the
    # same K instead of dense rays borrowing budget from empty ones.
    per_ray: bool = False
    # How each ray's top-K is selected: "sort" (exact, batched argsort),
    # "topk" (exact, lax.top_k), "approx" (lax.approx_max_k — TPU's
    # hardware-assisted approximate top-k; recall ~0.95, misses only swap
    # which samples spend the budget, never break compositing semantics).
    per_ray_select: str = "sort"
    # Coarse-pass keep budget override (None = keep_fraction). The coarse
    # pass drives the fine PDF, and its encode cost is ~1/3 of the fine
    # pass's (64 vs 192 samples), so a LOOSER coarse budget buys PDF quality
    # cheaply while the tight fine budget keeps the speed (observed: a flat
    # 0.125 anneal dropped the flagship curve ~4 dB at the switch).
    keep_fraction_coarse: Optional[float] = None
    # Eval-only keep budget (None = exact full evaluation at eval, the
    # reference semantics). Training rays/s is 2.2x the exact-eval rays/s
    # (RENDER_r04), so i_video/i_testset hooks and render-only mode were
    # the slowest part of the system; a LOOSE eval budget (0.5-0.75) on the
    # sharp trained grid recovers most of the culling speedup while staying
    # PSNR-neutral (gated by the measured delta-vs-exact in RENDER_r05).
    keep_fraction_eval: Optional[float] = None
    # Eval-only COARSE budget override (None = keep_fraction_eval for both
    # passes). The same asymmetry as training: the coarse pass drives the
    # fine PDF, so at eval a LOOSE coarse + tight fine beats a flat budget
    # (flat 0.375 measured -0.81 dB — eval-side coarse starvation — while
    # the asymmetric split holds the delta near zero, RENDER_r05).
    keep_fraction_eval_coarse: Optional[float] = None
    # Transmittance-weighted FINE culling at eval (RenderConfig.eval_mode
    # flips transmittance_cull on when this is set): the density score
    # cannot see ray order, so a tight budget wastes keeps on dense cells
    # BEHIND the first surface (measured: fine keep 0.375 costs -0.8 dB at
    # eval regardless of the coarse budget). Weighting each fine sample's
    # score by the coarse pass's transmittance at its depth (carried through
    # the z merge as a third sort operand + a cumulative min — T is
    # non-increasing along the ray) reallocates the budget to VISIBLE
    # samples, the static-shape equivalent of early ray termination.
    eval_transmittance: bool = False
    transmittance_cull: bool = False  # set by eval_mode, not by users
    # Score every k-th sample on a 3^3-dilated grid instead of every sample
    # (occupancy_scores_strided): k=2 halves the score-gather volume.
    # MEASURED AS A LOSS on v5e (87.1k vs 92.5k rays/s at the r5 flagship
    # flags): the reduce_window dilation + repeat/realign overhead exceeds
    # the fetch savings — the score gather rides the same latency-hiding
    # window as the encode gather, so halving its COUNT buys nothing while
    # adding VPU work. Kept opt-in as a committed negative result.
    score_stride: int = 1
    # GLOBAL culling granularity in consecutive samples (must divide both
    # N_samples and N_samples+N_importance). block=8 keeps the global
    # budget's cross-ray reallocation (measured worth ~2.3 dB over per-ray
    # at equal budget: r4p_keep25 26.6 vs abl_L4F8 28.89 @1536) while
    # cutting the cull sort 8x and widening the un-permute rows 8x (row
    # fetches are count-bound, docs/TPU_DESIGN.md). Block score = max of
    # member scores; kept blocks composite as zero-fill (same 1e-10-epsilon
    # caveat as above).
    block: int = 1

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


def dilate_grid(grid: jnp.ndarray, R: int) -> jnp.ndarray:
    """3^3 max-pool (stride 1, SAME) of the flat (R^3,) grid.

    Used by strided scoring: probing every k-th sample on the DILATED grid
    is a conservative, hole-free approximation of per-sample scoring as
    long as consecutive probes are <= 2 cells apart (each probe's +-1-cell
    halo then tiles the ray segment). Pure reshaped reduce_window — ~0.1 ms
    at R=128, recomputed inside the step (no second grid in the state)."""
    g = grid.reshape(R, R, R)
    g = jax.lax.reduce_window(
        g, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    return g.reshape(-1)


def occupancy_scores_strided(
    grid_dilated: jnp.ndarray,
    pts: jnp.ndarray,  # (R, S, 3) ray-ordered sample points
    bbox: jnp.ndarray,
    cfg: OccupancyConfig,
) -> jnp.ndarray:
    """(R, S) scores from 1 dilated-grid fetch per score_stride samples.

    The score gather is ~30% of the train step's row fetches (192/ray vs
    192 encode fetches at the flagship budgets); probing every k-th sample
    on the 3^3-dilated grid halves it at k=2 while keeping coverage exact
    (consecutive samples are ~0.8 cells apart at chair shapes, so probes
    sit ~1.7 cells apart, inside the 2-cell halo bound). Out-of-bbox
    samples still score -1 per-sample (pure arithmetic, no fetch); probes
    are clamped into the bbox so their cell index is always valid."""
    Rr, S = pts.shape[0], pts.shape[1]
    st = cfg.score_stride
    idx = jnp.arange(0, S, st)
    probes = jnp.clip(pts[:, idx], bbox[0], bbox[1])  # (Rr, P, 3)
    cell = _cell_index(probes.reshape(-1, 3), bbox, cfg.resolution)
    s_p = jnp.take(grid_dilated, cell).reshape(Rr, idx.shape[0])
    s_full = jnp.repeat(s_p, st, axis=1)[:, :S]
    in_bbox = jnp.all((pts >= bbox[0]) & (pts <= bbox[1]), axis=-1)
    return jnp.where(in_bbox, s_full, -1.0)


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
    """EMA decay + max-update at sampled jittered cells (uniform, or
    surface-importance-sampled when cfg.adaptive_update — sample_update_cells).

    sigma_fn(pts (N,3)) -> sigma (N,) from the live model (density head only).
    """
    R = cfg.resolution
    k_cell, k_jit = jax.random.split(key)
    cells = sample_update_cells(grid, k_cell, cfg)
    ijk = jnp.stack(
        [cells // (R * R), (cells // R) % R, cells % R], axis=-1
    ).astype(jnp.float32)
    u = jax.random.uniform(k_jit, (cfg.n_update_samples, 3))
    rel = (ijk + u) / R
    pts = bbox[0] + rel * (bbox[1] - bbox[0])
    sigma = jax.nn.relu(sigma_fn(pts))

    grid = grid * cfg.ema_decay
    return grid.at[cells].max(sigma)


def sample_update_cells(
    grid: jnp.ndarray, key: jax.Array, cfg: OccupancyConfig
) -> jnp.ndarray:
    """Cell indices for the periodic grid update.

    Uniform when cfg.adaptive_update is off. Otherwise half uniform
    (exploration: density can emerge anywhere) and half importance-sampled
    near the CURRENT surface: the 128^3 grid is max-pooled to 32^3
    macro-blocks, the strongest 1024 blocks are found with one small top_k
    (32k elements, runs only every update_every steps), and samples pick a
    random strong block + a uniform cell within its 4^3 extent dilated by
    one cell in each direction (covering the 26-neighborhood — a stale
    "empty" neighbor of an occupied block is re-measured quickly instead of
    waiting for a uniform draw to land on 1-in-2M cells).
    """
    R = cfg.resolution
    n = cfg.n_update_samples
    if not cfg.adaptive_update or R % 32:
        return jax.random.randint(key, (n,), 0, cfg.n_cells)

    k_u, k_blk, k_off = jax.random.split(key, 3)
    n_half = n // 2
    uniform_cells = jax.random.randint(k_u, (n - n_half,), 0, cfg.n_cells)

    # 32^3 macro-block maxima (pure reshaped reduction — no gather/scatter).
    B, S = 32, R // 32
    g = grid.reshape(B, S, B, S, B, S)
    blocks = g.max(axis=(1, 3, 5)).reshape(-1)  # (32768,)
    n_top = 1024
    top_val, top_idx = jax.lax.top_k(blocks, n_top)  # (1024,)

    # density-proportional pick among the top blocks (a sparse scene may
    # occupy far fewer than n_top blocks — uniform-over-top would waste the
    # importance half on empty ties). Gumbel matrix is only (n_half, 1024).
    logits = jnp.log(jnp.maximum(top_val, 0.0) + 1e-8)
    sel = jax.random.categorical(k_blk, logits, shape=(n_half,))
    blk = jnp.take(top_idx, sel)  # (n_half,) flat 32^3 indices
    bi = jnp.stack([blk // (B * B), (blk // B) % B, blk % B], axis=-1)  # (n,3)
    # uniform cell within the block dilated by 1 cell on every side
    off = jax.random.randint(k_off, (n_half, 3), -1, S + 1)
    ijk = jnp.clip(bi * S + off, 0, R - 1)
    imp_cells = (ijk[:, 0] * R + ijk[:, 1]) * R + ijk[:, 2]
    return jnp.concatenate([uniform_cells, imp_cells])


def cull_per_ray(scores: jnp.ndarray, K: int, select: str = "sort") -> jnp.ndarray:
    """Per-ray top-K sample selection, returned in ascending z order.

    scores: (R, S) float (higher = denser; out-of-bbox = -1).
    Returns idx (R, K) int32 — for each ray, the indices of its K highest-
    scoring samples, sorted ascending so downstream gathers of z/dists keep
    the march order. Ties break toward the lower index.

    select: "sort" = one batched (R, S) argsort (exact, stable); "topk" =
    lax.top_k (exact); "approx" = lax.approx_max_k (TPU approximate top-k,
    recall ~0.95 — a missed high-score sample only reallocates budget, the
    composite stays a valid zero-fill restriction). All finish with one
    (R, K) ascending index sort to restore march order.
    """
    if select == "topk":
        _, kept = jax.lax.top_k(scores, K)
    elif select == "approx":
        _, kept = jax.lax.approx_max_k(scores, K)
    else:
        kept = jnp.argsort(-scores, axis=-1, stable=True)[..., :K]
    return jnp.sort(kept, axis=-1).astype(jnp.int32)


def _invert_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """inv[order[j]] = j via a unique-index scatter (no second sort).

    XLA's argsort costs O(N log^2 N) compare/swap network passes; inverting a
    known permutation is one linear scatter of distinct indices.
    """
    n = order.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    )


def cull_points(
    occ: jnp.ndarray,  # (N,) bool mask (True = keep) or float scores
    keep_k: int,
    mode: str = "sort1",
):
    """Static-shape partition: indices of the keep_k best points first.

    Bool input: occupied points first (stable). Float input: descending by
    score, so the static budget always goes to the densest cells.
    Returns (kept_idx (K,), order (N,), inv_perm (N,)): order sorts points
    best-first, inv_perm maps permuted positions back to original order
    (take-based unsort, no scatter in the model path); order is inv_perm's
    inverse, handed to the un-permute so its backward is a plain gather
    (permute_rows).

    mode: "sort2" = two argsorts (round-3 parity path); "sort1" = one
    argsort + scatter-inverse; "cumsum" = sort-free threshold partition
    (`cull_points_cumsum`).
    """
    if mode == "cumsum":
        return cull_points_cumsum(occ, keep_k)
    if occ.dtype == jnp.bool_:
        order = jnp.argsort(~occ, stable=True)  # (N,)
    else:
        order = jnp.argsort(-occ, stable=True)
    kept_idx = order[:keep_k]
    if mode == "sort2":
        inv_perm = jnp.argsort(order, stable=True)  # positions of each pt
    else:
        inv_perm = _invert_permutation(order)
    return kept_idx, order, inv_perm


def cull_points_cumsum(scores: jnp.ndarray, keep_k: int, n_edges: int = 512):
    """Sort-free budgeted partition: histogram threshold + stable cumsum.

    Picks the lowest of `n_edges` score thresholds whose >=thr population
    fits the budget, then stable-partitions with two prefix sums (O(N) VPU
    work, no sort network). Points >= thr all land in the first keep_k slots;
    the marginal budget (keep_k - #above) is filled in index order — an
    APPROXIMATION of exact top-k whose error is bounded by one histogram
    bin. Returns the same (kept_idx, order, inv_perm) triple as cull_points.
    """
    n = scores.shape[0]
    lo = jnp.min(scores)
    hi = jnp.max(scores)
    edges = lo + (hi - lo) * jnp.linspace(0.0, 1.0, n_edges)
    # count_ge[e] = #{i : scores[i] >= edges[e]} — descending in e.
    count_ge = jnp.sum(
        (scores[None, :] >= edges[:, None]).astype(jnp.int32), axis=-1
    )
    fits = count_ge <= keep_k
    thr = jnp.where(jnp.any(fits), edges[jnp.argmax(fits)], edges[-1])

    mask = scores >= thr
    cm = jnp.cumsum(mask.astype(jnp.int32))
    c_total = cm[-1]
    ii = jnp.arange(n, dtype=jnp.int32)
    # stable partition: masked point i -> slot cm[i]-1; unmasked -> after all
    # masked, in index order.
    dest = jnp.where(mask, cm - 1, c_total + (ii - cm))
    order = _invert_permutation(dest)
    return order[:keep_k], order, dest


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
    scores: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Like query_fn but only encodes/MLPs the first keep_k occupied points;
    culled points get raw = 0 (sigma 0 == empty space).

    cfg.block > 1 selects at BLOCK granularity: consecutive runs of `block`
    samples (always within one ray — S % block == 0) are scored by their max
    and kept/culled together. Same zero-fill semantics; the cull sort runs
    over n/block elements and the un-permute moves (block*C)-wide rows.
    `scores` (flat (Rr*S,)) skips the per-point grid gather when the caller
    already has them (score reuse through the z merge)."""
    Rr, S = pts.shape[0], pts.shape[1]
    flat = pts.reshape(-1, 3)
    n = flat.shape[0]
    # Budgeted top-k by density score. Out-of-bbox points score -1 (their
    # sigma is zeroed by the query anyway, so culling them is EXACTLY
    # semantics-preserving — and for unbounded near/far ranges a large share
    # of stratified samples lies outside the bbox).
    if scores is None:
        scores = occupancy_scores(grid, flat, bbox, cfg)
    else:
        scores = scores.reshape(-1)

    B = cfg.block
    if B > 1 and S % B == 0 and keep_k % B == 0:
        nb = n // B
        kb = keep_k // B
        bscores = jnp.max(scores.reshape(nb, B), axis=-1)
        kept_idx, order, inv_perm = cull_points(bscores, kb, mode=cfg.partition)

        pts_kept = jnp.take(flat.reshape(nb, B, 3), kept_idx, axis=0)  # (K,B,3)
        dirs_kept = None
        if viewdirs is not None:
            # blocks never straddle rays: dirs constant within a block
            ray_of_block = kept_idx // (S // B)
            dirs_kept = jnp.take(viewdirs, ray_of_block, axis=0)  # (K, 3)
        raw_kept = query_fn(state, pts_kept, dirs_kept, bbox, fine=fine)
        C = raw_kept.shape[-1]
        raw_perm = jnp.concatenate(
            [raw_kept.reshape(kb, B * C),
             jnp.zeros((nb - kb, B * C), raw_kept.dtype)], axis=0,
        )
        from hashnerf_tpu.kernels.gather_vjp import permute_rows

        return permute_rows(raw_perm, inv_perm, order).reshape(Rr, S, C)

    kept_idx, order, inv_perm = cull_points(scores, keep_k, mode=cfg.partition)

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

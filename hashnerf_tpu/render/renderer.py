"""Functional volume renderer: stratified + hierarchical ray-march.

Capability parity: /root/reference/run_nerf_helpers.py — render_rays (:464),
render (:310), render_path (:395). Design: `render_rays` is a pure jit-able
function over static (RenderConfig, query_fn); `render` prepares/reshapes rays
and runs fixed-size chunks (one compiled program reused across chunks);
`render_path` iterates poses and computes PSNR against ground truth.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from hashnerf_tpu.ops.rays import get_rays, get_ndc_rays
from hashnerf_tpu.ops.sampling import stratified_z_vals, perturb_z_vals, sample_pdf
from hashnerf_tpu.ops.volume import raw2outputs


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    N_samples: int = 64
    N_importance: int = 0
    perturb: bool = True
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    lindisp: bool = False
    ndc: bool = False
    use_viewdirs: bool = True
    retraw: bool = False
    # Occupancy-grid sample culling (None = reference-exact full evaluation).
    occupancy: Optional["OccupancyConfig"] = None
    # Tighten per-ray [near, far] to the bbox intersection before sampling
    # (ops/rays.py ray_aabb_near_far; off = reference-exact z ranges).
    aabb_clip: bool = False
    # Sort-free hierarchical sampling: draw the importance samples already
    # sorted (exponential-spacings order statistics — identical multiset
    # law) and rank-merge them with the sorted stratified z's instead of the
    # reference's full sort of the concatenation (run_nerf_helpers.py:551).
    # Off = reference-exact RNG stream. NO-OP when occupancy culling is on:
    # the occ path uses its own multi-operand z-keyed lax.sort to carry the
    # reused scores through the merge (render_config_from_args warns).
    fast_merge: bool = False

    def eval_mode(self) -> "RenderConfig":
        """perturb off, noise off (reference run_nerf_helpers.py:196-198).

        When occupancy.keep_fraction_eval is set, eval uses THAT (looser)
        budget for both passes instead of the training budgets — the
        PSNR-neutral eval accelerator (keep_fraction_coarse=None makes the
        coarse pass follow the same eval budget)."""
        cfg = dataclasses.replace(self, perturb=False, raw_noise_std=0.0)
        occ = self.occupancy
        if occ is not None and occ.keep_fraction_eval is not None:
            cfg = dataclasses.replace(
                cfg,
                occupancy=dataclasses.replace(
                    occ,
                    keep_fraction=occ.keep_fraction_eval,
                    keep_fraction_coarse=occ.keep_fraction_eval_coarse,
                    transmittance_cull=occ.eval_transmittance,
                ),
            )
        return cfg


def render_rays(
    state,
    query_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    near: jnp.ndarray,
    far: jnp.ndarray,
    bbox: jnp.ndarray,
    key: Optional[jax.Array],
    cfg: RenderConfig,
    occ_grid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Core per-batch ray march (reference run_nerf_helpers.py:464-574).

    rays_o/rays_d: (R, 3); near/far: (R,) or scalar; bbox: (2, 3).
    Returns dict of maps; coarse-pass outputs keyed rgb0/depth0/acc0/... when
    hierarchical sampling is on. When cfg.occupancy and occ_grid are set,
    empty-space samples are culled before the network query.
    """
    R = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, rays_o.dtype), (R,))
    far = jnp.broadcast_to(jnp.asarray(far, rays_o.dtype), (R,))
    if cfg.aabb_clip:
        from hashnerf_tpu.ops.rays import ray_aabb_near_far

        near, far = ray_aabb_near_far(rays_o, rays_d, bbox, near, far)

    per_ray = (
        cfg.occupancy is not None
        and occ_grid is not None
        and cfg.occupancy.per_ray
    )
    use_occ = cfg.occupancy is not None and occ_grid is not None

    def _keep_fraction(fine: bool) -> float:
        kf = cfg.occupancy.keep_fraction
        if not fine and cfg.occupancy.keep_fraction_coarse is not None:
            kf = cfg.occupancy.keep_fraction_coarse
        return kf

    if use_occ and not per_ray:
        from hashnerf_tpu.render.occupancy import query_with_culling

        def run_query(st, p, vd, bb, fine, scores=None):
            n = p.shape[0] * p.shape[1]
            keep_k = min(n, -(-int(n * _keep_fraction(fine)) // 128) * 128)
            return query_with_culling(
                query_fn, st, p, vd, bb, occ_grid, cfg.occupancy, keep_k,
                fine=fine, scores=scores,
            )
    else:
        def run_query(st, p, vd, bb, fine, scores=None):
            return query_fn(st, p, vd, bb, fine=fine)

    occ_grid_dilated = None
    if use_occ and cfg.occupancy.score_stride > 1:
        from hashnerf_tpu.render.occupancy import dilate_grid

        occ_grid_dilated = dilate_grid(occ_grid, cfg.occupancy.resolution)

    def score_z(z):
        """Occupancy score of every sample point at depths z (R, S)."""
        from hashnerf_tpu.render.occupancy import (
            occupancy_scores,
            occupancy_scores_strided,
        )

        p = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        if occ_grid_dilated is not None:
            return occupancy_scores_strided(
                occ_grid_dilated, p, bbox, cfg.occupancy
            )
        return occupancy_scores(
            occ_grid, p.reshape(-1, 3), bbox, cfg.occupancy
        ).reshape(z.shape)

    def march(z_vals, noise_key, fine, scores=None):
        """One ray-march pass: query + composite.

        Returns (VolumeOutputs, weights_on_full_grid). The per-ray culling
        path queries only each ray's top-K samples (compacted, z-ordered)
        and composites them with their ORIGINAL per-sample intervals, which
        is exactly the zero-fill composite restricted to a per-ray budget —
        no global sort, no un-permute gather (PROFILE_r04.md slack items).
        `scores` lets the fine pass reuse scores already gathered for the
        coarse z's (carried through the z merge) instead of re-fetching all
        S samples' grid cells — both the global (block) and per-ray modes.
        """
        if not per_ray:
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            raw = run_query(state, pts, viewdirs, bbox, fine=fine, scores=scores)
            out = raw2outputs(
                raw, z_vals, rays_d, cfg.raw_noise_std, cfg.white_bkgd,
                noise_key=noise_key,
            )
            return out, out.weights, raw

        from hashnerf_tpu.render.occupancy import cull_per_ray

        S = z_vals.shape[-1]
        K = min(S, max(1, -(-int(S * _keep_fraction(fine)) // 8) * 8))
        if scores is None:
            scores = score_z(z_vals)
        # (R, K) ascending z order
        idx = cull_per_ray(scores, K, select=cfg.occupancy.per_ray_select)
        z_k = jnp.take_along_axis(z_vals, idx, axis=-1)
        dists_full = jnp.concatenate(
            [z_vals[..., 1:] - z_vals[..., :-1],
             jnp.full_like(z_vals[..., :1], 1e10)], -1,
        )
        dists_k = jnp.take_along_axis(dists_full, idx, axis=-1)
        pts_k = rays_o[:, None, :] + rays_d[:, None, :] * z_k[..., None]
        raw = run_query(state, pts_k, viewdirs, bbox, fine=fine)
        out = raw2outputs(
            raw, z_k, rays_d, cfg.raw_noise_std, cfg.white_bkgd,
            noise_key=noise_key, dists=dists_k,
        )
        # Scatter kept weights back onto the full z grid for the fine-pass
        # PDF (culled samples have weight 0 there, same as zero-fill).
        rows = jnp.arange(z_vals.shape[0])[:, None]
        w_full = jnp.zeros(z_vals.shape, out.weights.dtype)
        w_full = w_full.at[rows, idx].set(out.weights, unique_indices=True)
        return out, w_full, raw

    if key is None:
        key = jax.random.PRNGKey(0)
    k_strat, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)

    z_vals = stratified_z_vals(near, far, cfg.N_samples, cfg.lindisp)
    if cfg.perturb:
        z_vals = perturb_z_vals(k_strat, z_vals)

    scores_c = score_z(z_vals) if use_occ else None
    out, w_full, raw = march(z_vals, k_noise0, fine=False, scores=scores_c)

    ret = {}
    if cfg.N_importance > 0:
        ret.update(
            rgb0=out.rgb_map, depth0=out.depth_map, acc0=out.acc_map,
            sparsity_loss0=out.sparsity_loss,
        )
        z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        if use_occ:
            # Score only the NEW importance samples and carry both score
            # sets through a multi-operand sort keyed on z — reuses the
            # N_samples grid fetches the coarse pass already paid (25% of
            # the fine pass's score-gather volume at 64+128). Applies to
            # both culling modes (global/block and per-ray).
            z_samples = sample_pdf(
                k_pdf, z_vals_mid, w_full[..., 1:-1], cfg.N_importance,
                det=(not cfg.perturb),
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            s_new = score_z(z_samples)
            z_cat = jnp.concatenate([z_vals, z_samples], -1)
            s_cat = jnp.concatenate([scores_c, s_new], -1)
            if cfg.occupancy.transmittance_cull:
                # Early-ray-termination as a score THRESHOLD (eval only):
                # T_i = 1 - sum_{j<i} w_j at each coarse sample (the exact
                # zero-fill transmittance), +inf at new samples; after the
                # z-keyed sort a cumulative min forward-fills each sample
                # with the T of the latest coarse sample at or before it
                # (T is non-increasing along the ray). Samples with
                # T < 1e-3 contribute <0.1% to the composite — demote them
                # below every live score so the keep budget reallocates to
                # VISIBLE samples. NOTE a hard threshold, not proportional
                # weighting: score*T was measured -2.3 dB at keep 0.375 —
                # it steals budget from the partially-transmitting interior
                # samples that absorb residual T, and with white_bkgd the
                # un-absorbed remainder leaks background into surface rays.
                cw = jnp.cumsum(w_full, axis=-1)
                t_coarse = 1.0 - jnp.concatenate(
                    [jnp.zeros_like(cw[..., :1]), cw[..., :-1]], -1
                )
                payload = jnp.concatenate(
                    [t_coarse, jnp.full_like(z_samples, jnp.inf)], -1
                )
                z_vals, scores_f, t_pay = jax.lax.sort(
                    (z_cat, s_cat, payload), dimension=-1, num_keys=1
                )
                t_fill = jax.lax.cummin(t_pay, axis=t_pay.ndim - 1)
                scores_f = jnp.where(
                    (t_fill < 1e-3) & (scores_f > 0), 0.0, scores_f
                )
            else:
                z_vals, scores_f = jax.lax.sort(
                    (z_cat, s_cat), dimension=-1, num_keys=1,
                )
            out, _, raw = march(z_vals, k_noise1, fine=True, scores=scores_f)
            ret["z_std"] = jnp.std(z_samples, axis=-1)
        elif cfg.fast_merge:
            # Pre-sorted uniforms -> monotone inverse-CDF -> sorted
            # z_samples; z_vals is sorted by construction (stratified jitter
            # stays within disjoint intervals), so the union needs only a
            # rank-based merge — no generic sort in the hot path.
            from hashnerf_tpu.ops.sampling import merge_sorted, sorted_uniform

            u = None
            if cfg.perturb:
                R_mid = z_vals_mid.shape[0]
                u = sorted_uniform(k_pdf, (R_mid, cfg.N_importance))
            z_samples = sample_pdf(
                k_pdf,
                z_vals_mid,
                w_full[..., 1:-1],
                cfg.N_importance,
                det=(not cfg.perturb),
                u=u,
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            z_vals = merge_sorted(z_vals, z_samples)
        else:
            z_samples = sample_pdf(
                k_pdf,
                z_vals_mid,
                w_full[..., 1:-1],
                cfg.N_importance,
                det=(not cfg.perturb),
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), axis=-1)
        if not use_occ:
            out, _, raw = march(z_vals, k_noise1, fine=True)
            ret["z_std"] = jnp.std(z_samples, axis=-1)

    ret.update(
        rgb_map=out.rgb_map, depth_map=out.depth_map, acc_map=out.acc_map,
        disp_map=out.disp_map, sparsity_loss=out.sparsity_loss,
    )
    if raw.shape[-1] >= 7:
        # NeRFGradient path: composite the 3-ch gradient head with the same
        # ray weights (the reference's intent for st3d gradient supervision;
        # its own wiring is broken — SURVEY.md §8, run_nerf.py:432).
        ret["grad_map"] = jnp.sum(out.weights[..., None] * raw[..., 4:7], axis=-2)
    if cfg.retraw:
        ret["raw"] = raw
    return ret


def _prepare_rays(
    H: int,
    W: int,
    K,
    cfg: RenderConfig,
    rays: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    c2w=None,
    c2w_staticcam=None,
):
    """Ray prep: full-image vs batch, viewdir normalization, NDC warp
    (reference render(), run_nerf_helpers.py:337-366)."""
    if c2w is not None:
        rays_o, rays_d = get_rays(H, W, K, c2w)
    else:
        rays_o, rays_d = rays

    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d
        if c2w_staticcam is not None:
            rays_o, rays_d = get_rays(H, W, K, c2w_staticcam)
        viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)

    sh = rays_d.shape
    if cfg.ndc:
        rays_o, rays_d = get_ndc_rays(H, W, float(K[0][0]), 1.0, rays_o, rays_d)

    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    return rays_o, rays_d, viewdirs, sh


@functools.partial(
    jax.jit, static_argnames=("query_fn", "cfg", "n_chunks", "has_vdirs")
)
def _render_chunks_scanned(
    state, query_fn, rays_o_c, rays_d_c, viewdirs_c, near, far, bbox, keys,
    cfg: RenderConfig, occ_grid, n_chunks: int, has_vdirs: bool,
):
    """lax.map over padded chunks: ONE XLA program per image regardless of
    chunk count (the reference dispatches per chunk,
    run_nerf_helpers.py:373-381; at ~20 ms/dispatch through this
    environment's tunnel a 800x800 render would pay it ~20x)."""

    def one(args):
        ro, rd, vd, k = args
        return render_rays(
            state, query_fn, ro, rd, vd if has_vdirs else None,
            near, far, bbox, k, cfg, occ_grid=occ_grid,
        )

    vd = viewdirs_c if has_vdirs else jnp.zeros_like(rays_d_c)
    return jax.lax.map(one, (rays_o_c, rays_d_c, vd, keys))


def render(
    state,
    query_fn: Callable,
    H: int,
    W: int,
    K,
    bbox,
    cfg: RenderConfig,
    chunk: int = 1024 * 32,
    rays: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    c2w=None,
    near: float = 0.0,
    far: float = 1.0,
    c2w_staticcam=None,
    key: Optional[jax.Array] = None,
    occ_grid: Optional[jnp.ndarray] = None,
):
    """Chunked rendering of a ray batch or a full image.

    All chunks run inside one scanned XLA program (vs the reference's host
    loop). Pass occ_grid to apply occupancy culling at eval time too.
    Returns (rgb_map, depth_map, acc_map, extras) with leading dims matching
    the input ray layout (reference run_nerf_helpers.py:310-392).
    """
    rays_o, rays_d, viewdirs, sh = _prepare_rays(
        H, W, K, cfg, rays=rays, c2w=c2w, c2w_staticcam=c2w_staticcam
    )
    bbox = jnp.asarray(bbox)
    N = rays_o.shape[0]

    # Pad to a whole number of chunks so every chunk reuses one compiled program.
    chunk = min(chunk, N) or N
    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N

    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0) if pad else x

    rays_o_p, rays_d_p = pad0(rays_o), pad0(rays_d)
    viewdirs_p = pad0(viewdirs) if viewdirs is not None else None

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_chunks)

    to_c = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
    if cfg.occupancy is None:
        occ_grid = None
    ret_c = _render_chunks_scanned(
        state, query_fn, to_c(rays_o_p), to_c(rays_d_p),
        to_c(viewdirs_p) if viewdirs_p is not None else None,
        jnp.asarray(near, jnp.float32), jnp.asarray(far, jnp.float32),
        bbox, keys, cfg, occ_grid,
        n_chunks=n_chunks, has_vdirs=viewdirs_p is not None,
    )

    out = {k: v.reshape((-1,) + v.shape[2:])[:N] for k, v in ret_c.items()}
    for k in out:
        out[k] = out[k].reshape(sh[:-1] + out[k].shape[1:])

    from hashnerf_tpu.utils.debug import debug_enabled, check_finite

    if debug_enabled():
        check_finite(out, where="render:")

    extract = ["rgb_map", "depth_map", "acc_map"]
    extras = {k: v for k, v in out.items() if k not in extract}
    return out["rgb_map"], out["depth_map"], out["acc_map"], extras


def render_path(
    state,
    query_fn: Callable,
    render_poses,
    hwf,
    K,
    bbox,
    cfg: RenderConfig,
    chunk: int = 1024 * 32,
    near: float = 0.0,
    far: float = 1.0,
    gt_imgs=None,
    savedir: Optional[str] = None,
    render_factor: int = 0,
    occ_grid: Optional[jnp.ndarray] = None,
):
    """Render a pose path; returns (rgbs, depths, psnrs) as numpy arrays.

    Depth normalized to [0,1] by (near, far) like the reference
    (run_nerf_helpers.py:395-459). Saving side-effects live in
    hashnerf_tpu.utils.io to keep this function pure-ish.
    """
    H, W, focal = hwf
    if render_factor != 0:
        H = H // render_factor
        W = W // render_factor
        focal = focal / render_factor
        K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])

    rgbs, depths, psnrs = [], [], []
    t = time.time()
    for i, c2w in enumerate(render_poses):
        c2w = jnp.asarray(c2w)[:3, :4]
        rgb, depth, acc, _ = render(
            state, query_fn, H, W, K, bbox, cfg.eval_mode(),
            chunk=chunk, c2w=c2w, near=near, far=far, occ_grid=occ_grid,
        )
        rgb = np.asarray(rgb)
        depth = (np.asarray(depth) - near) / (far - near)
        rgbs.append(rgb)
        depths.append(depth)
        if gt_imgs is not None and render_factor == 0:
            gt = np.asarray(gt_imgs[i])
            p = -10.0 * np.log10(np.mean(np.square(rgb - gt)))
            psnrs.append(float(p))
        if i == 0:
            dt = time.time() - t
        t = time.time()

    rgbs = np.stack(rgbs, 0)
    depths = np.stack(depths, 0)

    if savedir is not None:
        from hashnerf_tpu.utils.io import save_render_figures, save_psnr_pickle

        save_render_figures(savedir, rgbs, depths)
        if psnrs:
            save_psnr_pickle(savedir, psnrs)

    return rgbs, depths, psnrs

"""Hash-grid encode with a custom VJP: fast TPU backward for the table grads.

Forward: identical math to ops.hash_encoding.hash_encode (the jnp oracle).
Backward: the table cotangent is a 25M-row scatter-add in the chair config —
XLA's scatter costs ~2 s/step. We reformulate it as sort + prefix-sum
difference (kernels.segment_scatter) — pure sequential data movement, no
scatter primitive anywhere.

Residuals: only (x, bbox) are saved; corner indices and weights are
recomputed in the backward (a few ms of VPU work) instead of saving 25M
int32 (~100 MB of HBM) — the classic remat trade.

No cotangent flows to x/bbox (sample positions are data in NeRF training;
the reference never differentiates w.r.t. them either).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hashnerf_tpu.ops.hash_encoding import (
    HashGridConfig,
    _corner_weights,
)
from hashnerf_tpu.ops.hashing import spatial_hash, BOX_OFFSETS
from hashnerf_tpu.kernels.segment_scatter import sorted_segment_accumulate


def _corner_geometry(x, bbox_min, bbox_max, cfg: HashGridConfig):
    """(level-local idx (L,N,8), corner_weights (L,N,8), keep_mask (N,))."""
    L = cfg.n_levels
    T = cfg.table_size
    resolutions = jnp.asarray(np.array(cfg.resolutions, dtype=np.float32))

    bbox_min = bbox_min.astype(x.dtype)
    bbox_max = bbox_max.astype(x.dtype)
    keep_mask = jnp.all((x >= bbox_min) & (x <= bbox_max), axis=-1)
    xc = jnp.clip(x, bbox_min, bbox_max)

    grid = (bbox_max - bbox_min)[None, :] / resolutions[:, None]
    grid = grid[:, None, :]
    rel = (xc[None, :, :] - bbox_min) / grid
    bl = jnp.floor(rel).astype(jnp.int32)
    minv = bl.astype(xc.dtype) * grid + bbox_min
    w = (xc[None, :, :] - minv) / grid

    corners = bl[:, :, None, :] + jnp.asarray(BOX_OFFSETS)[None, None, :, :]
    idx = spatial_hash(corners, cfg.log2_hashmap_size)  # (L, N, 8) level-local
    cw = _corner_weights(w)  # (L, N, 8)
    return idx, cw, keep_mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hash_encode_fast(table, x, bbox_min, bbox_max, cfg: HashGridConfig):
    """Drop-in for ops.hash_encoding.hash_encode with a fast backward."""
    return _fwd_impl(table, x, bbox_min, bbox_max, cfg)


def _fwd_impl(table, x, bbox_min, bbox_max, cfg):
    L, F = cfg.n_levels, cfg.n_features_per_level
    T = cfg.table_size
    idx, cw, keep_mask = _corner_geometry(x, bbox_min, bbox_max, cfg)
    # Per-level gathers: measured 1.37x faster than one flat (L*2^T)-row
    # gather on TPU (smaller operand tables issue faster). L is static.
    feats = []
    for l in range(L):
        emb_l = jnp.take(table[l], idx[l].reshape(-1), axis=0).reshape(-1, 8, F)
        feats.append(jnp.einsum("nc,ncf->nf", cw[l], emb_l, precision="highest"))
    feats = jnp.concatenate(feats, axis=-1)
    return feats, keep_mask


def _fwd_rule(table, x, bbox_min, bbox_max, cfg):
    out = _fwd_impl(table, x, bbox_min, bbox_max, cfg)
    return out, (table.shape, x, bbox_min, bbox_max)


def _bwd_rule(cfg, residuals, cotangents):
    table_shape, x, bbox_min, bbox_max = residuals
    g_feats, _ = cotangents  # (N, L*F); keep_mask is boolean -> no tangent
    L, F = cfg.n_levels, cfg.n_features_per_level
    T = cfg.table_size

    idx, cw, _ = _corner_geometry(x, bbox_min, bbox_max, cfg)
    flat_idx = idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
    # d feats[l,n,f] / d emb[l,n,c,f] = cw[l,n,c]
    g = g_feats.reshape(-1, L, F).transpose(1, 0, 2)  # (L, N, F)
    g_corner = cw[..., None] * g[:, :, None, :]  # (L, N, 8, F)

    d_table = sorted_segment_accumulate(
        flat_idx.reshape(-1), g_corner.reshape(-1, F), num_rows=L * T
    ).reshape(L, T, F)

    zeros_x = jnp.zeros_like(x)
    return d_table, zeros_x, jnp.zeros_like(bbox_min), jnp.zeros_like(bbox_max)


hash_encode_fast.defvjp(_fwd_rule, _bwd_rule)

"""Corner-packed multiresolution grid encoding — the TPU fetch-count rework.

Capability: same encoder family as ops/hash_encoding.py (the TPU-native
rework of /root/reference/embedding/hash_encoding.py:13-163), re-laid-out so
each (sample, level) costs ONE table-row fetch instead of eight.

WHY (docs/TPU_DESIGN.md "corner packing"): TPU gathers are row-fetch-rate
bound (~7-18 ns/row regardless of row width 16-512 B), so the hash encoder's
cost is the fetch COUNT: 8 corners x L levels per sample = 64 rows. Both the
measured forward wall (~300 ms/step at the benched config) and the backward
sort size scale with it. Two packed layouts cut it 8x:

  1. DENSE (direct-indexed) coarse levels — every level whose full vertex
     grid fits the hash-table budget ((res+1)^3 <= 2^T) stores a dense
     (res+1)^3 x F vertex grid (no hashing, hence no collisions — upstream
     tiny-cuda-nn does exactly this for small levels). Each step a packed
     (res^3, 8F) table of per-voxel corner blocks is REBUILT from the
     canonical grid by 8 static shifted slices (dense copies, ~0.1 ms); its
     AD transpose is 8 shifted adds, so optimizer/checkpoint semantics see
     only the canonical grid. One fetch returns all 8 corners of the
     sample's voxel; vertex sharing between voxels is exact (continuity
     preserved) because the rebuild reads shared canonical vertices.

  2. BLOCK-HASHED fine levels — the parameter itself is a
     (2^log2_blocks, 27*F) table: row = Teschner hash of the EVEN-ANCHORED
     macro-block coordinate (bl>>1), payload = the 3x3x3 vertex slab
     covering that block's 2x2x2 voxels (vertices 2b .. 2b+2 per axis).
     Every voxel bl lies in exactly one block (parity picks which of the
     slab's 8 voxels), so one fetch covers all 8 corners. Corner features
     are combined with an on-the-fly (N, 27) weight matrix (trilinear corner
     weights routed to parity-dependent slots) — pure VPU, no second gather.

     Deviation vs the reference encoder (tpu-fast-only; parity mode keeps
     per-corner hashing): vertices on even planes are replicated across the
     adjacent blocks' slabs, so the encoded field may be discontinuous at
     macro-block boundaries (every 2 voxels). At fine levels the reference's
     own field is already dominated by hash collisions (512^3 vertices into
     2^19 rows ~ 256:1); quality is validated empirically by
     bench_quality.py curves against the parity path.

Backward: both layouts gather through kernels.gather_vjp.take_rows, so the
table cotangent is the multi-operand sort + Pallas aligned-window MXU
accumulation (kernels/segment_scatter.py) — and carries 8x fewer elements
than the per-corner layout (one (8F)- or (27F)-wide row per sample-level
instead of eight F-wide rows).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from hashnerf_tpu.ops.hashing import spatial_hash, BOX_OFFSETS
from hashnerf_tpu.ops.hash_encoding import level_resolutions, _corner_weights


@dataclasses.dataclass(frozen=True)
class PackedGridConfig:
    """Same hyperparameter surface as HashGridConfig + the block-row budget."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 512
    # Fine-level block rows per level. Default (log2T - 3) keeps the per-level
    # ROW count at 2^T/8 (each row carries a 27-vertex slab, so vertex-param
    # count is ~3.4x the reference level — collisions land at block
    # granularity instead).
    log2_blocks: int = 16

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def resolutions(self) -> Tuple[int, ...]:
        return level_resolutions(
            self.base_resolution, self.finest_resolution, self.n_levels
        )

    @property
    def dense_level_count(self) -> int:
        """Leading levels stored as dense vertex grids: (res+1)^3 <= 2^T."""
        T = 1 << self.log2_hashmap_size
        n = 0
        for r in self.resolutions:
            if (r + 1) ** 3 <= T:
                n += 1
            else:
                break
        return n

    @property
    def dense_resolutions(self) -> Tuple[int, ...]:
        return self.resolutions[: self.dense_level_count]

    @property
    def fine_resolutions(self) -> Tuple[int, ...]:
        return self.resolutions[self.dense_level_count :]

    @property
    def n_block_rows(self) -> int:
        return 1 << self.log2_blocks

    # --- canonical parameter sizes -------------------------------------- #
    @property
    def dense_vertex_counts(self) -> Tuple[int, ...]:
        return tuple((r + 1) ** 3 for r in self.dense_resolutions)

    @property
    def dense_offsets(self) -> Tuple[int, ...]:
        offs, o = [], 0
        for c in self.dense_vertex_counts:
            offs.append(o)
            o += c
        return tuple(offs + [o])

    @property
    def packed_voxel_counts(self) -> Tuple[int, ...]:
        return tuple(r**3 for r in self.dense_resolutions)

    @property
    def packed_offsets(self) -> Tuple[int, ...]:
        offs, o = [], 0
        for c in self.packed_voxel_counts:
            offs.append(o)
            o += c
        return tuple(offs + [o])


def init_packed_tables(key: jax.Array, cfg: PackedGridConfig) -> dict:
    """U(-1e-4, 1e-4) init on both canonical tables (reference
    hash_encoding.py:52-56 init range)."""
    F = cfg.n_features_per_level
    k_dense, k_fine = jax.random.split(key)
    tables = {}
    n_dense_rows = cfg.dense_offsets[-1]
    if n_dense_rows:
        tables["dense"] = jax.random.uniform(
            k_dense, (n_dense_rows, F), minval=-1e-4, maxval=1e-4,
            dtype=jnp.float32,
        )
    n_fine = len(cfg.fine_resolutions)
    if n_fine:
        tables["fine"] = jax.random.uniform(
            k_fine, (n_fine * cfg.n_block_rows, 27 * F),
            minval=-1e-4, maxval=1e-4, dtype=jnp.float32,
        )
    return tables


def build_packed_dense(dense: jnp.ndarray, cfg: PackedGridConfig) -> jnp.ndarray:
    """Rebuild the (sum res^3, 8F) per-voxel corner-block table from the
    canonical dense vertex grids. 8 static shifted slices per level — dense
    copies XLA pipelines; the AD transpose is 8 shifted adds (no scatter)."""
    F = cfg.n_features_per_level
    parts = []
    for li, res in enumerate(cfg.dense_resolutions):
        o0, o1 = cfg.dense_offsets[li], cfg.dense_offsets[li + 1]
        g = dense[o0:o1].reshape(res + 1, res + 1, res + 1, F)
        corners = [
            g[i : i + res, j : j + res, k : k + res]
            for (i, j, k) in BOX_OFFSETS  # (8 corners, BOX_OFFSETS order)
        ]
        packed = jnp.concatenate(corners, axis=-1)  # (res, res, res, 8F)
        parts.append(packed.reshape(res**3, 8 * F))
    return jnp.concatenate(parts, axis=0)


def packed_encode(
    tables: dict,  # {"dense": (V, F)?, "fine": (Lf*2^B, 27F)?}
    x: jnp.ndarray,  # (N, 3)
    bbox_min: jnp.ndarray,
    bbox_max: jnp.ndarray,
    cfg: PackedGridConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode points; returns (features (N, L*F), keep_mask (N,)).

    Feature concat order is level order (dense levels then fine levels —
    same geometric progression as the reference's 16-level cat).
    """
    F = cfg.n_features_per_level
    bbox_min = bbox_min.astype(x.dtype)
    bbox_max = bbox_max.astype(x.dtype)
    keep_mask = jnp.all((x >= bbox_min) & (x <= bbox_max), axis=-1)
    xc = jnp.clip(x, bbox_min, bbox_max)
    N = x.shape[0]

    from hashnerf_tpu.kernels.gather_vjp import take_rows

    def voxel_and_weights(res: int):
        """Clipped voxel id b (N,3) int32 + trilinear corner weights (N,8).

        b is clipped to [0, res-1] FIRST and weights derived from it
        (w = rel - b), so points on the bbox top face (rel == res after
        clipping out-of-bbox points) interpolate at w=1 inside the last
        voxel instead of w=0 in a phantom one.
        """
        grid = (bbox_max - bbox_min) / np.float32(res)
        rel = (xc - bbox_min) / grid
        b = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, res - 1)
        w = rel - b.astype(rel.dtype)
        return b, _corner_weights(w)

    feats = []

    # ---- dense (direct-indexed) coarse levels: 1 packed fetch each ----- #
    if cfg.dense_level_count:
        packed = build_packed_dense(tables["dense"], cfg)
        rows_per_level, cws = [], []
        for li, res in enumerate(cfg.dense_resolutions):
            b, cw = voxel_and_weights(res)
            v = (b[:, 0] * res + b[:, 1]) * res + b[:, 2]
            rows_per_level.append(v + cfg.packed_offsets[li])
            cws.append(cw)
        idx = jnp.concatenate(rows_per_level)  # (Ld*N,)
        rows = take_rows(packed, idx).reshape(cfg.dense_level_count, N, 8, F)
        # corner c's features sit at row[..., c*F:(c+1)*F] (BOX_OFFSETS order)
        f = jnp.einsum("lnc,lncf->lnf", jnp.stack(cws), rows, precision="highest")
        feats.append(f.transpose(1, 0, 2).reshape(N, -1))

    # ---- block-hashed fine levels: 1 slab fetch each ------------------- #
    # ONE concatenated take_rows for all fine levels: the backward is then a
    # single sort + Pallas segment pass over Lf*N elements instead of Lf
    # separate sorts.
    n_fine = len(cfg.fine_resolutions)
    if n_fine:
        row_ids, geoms = [], []
        for li, res in enumerate(cfg.fine_resolutions):
            b, cw = voxel_and_weights(res)
            anchor = b >> 1  # macro-block coordinate
            p = b & 1  # parity: which of the block's 8 voxels
            row_ids.append(
                spatial_hash(anchor, cfg.log2_blocks) + li * cfg.n_block_rows
            )
            geoms.append((cw, p))
        slabs = take_rows(tables["fine"], jnp.concatenate(row_ids)).reshape(
            n_fine, N, 27, F
        )
        offs = jnp.asarray(
            BOX_OFFSETS[:, 0] * 9 + BOX_OFFSETS[:, 1] * 3 + BOX_OFFSETS[:, 2]
        )[None, :]  # (1,8)
        sl = jax.lax.broadcasted_iota(jnp.int32, (N, 27), 1)
        for li, (cw, p) in enumerate(geoms):
            # Route the 8 trilinear corner weights to their parity-dependent
            # slots: slot(c) = (px+i)*9 + (py+j)*3 + (pz+k) for corner (i,j,k).
            base = (p[:, 0] * 9 + p[:, 1] * 3 + p[:, 2])[:, None]  # (N,1)
            slots = base + offs  # (N, 8) in [0, 27)
            w27 = jnp.zeros((N, 27), cw.dtype)
            # 8 one-hot accumulations (VPU compares) — no second gather
            for c in range(8):
                w27 = w27 + jnp.where(sl == slots[:, c : c + 1], cw[:, c : c + 1], 0.0)
            feats.append(
                jnp.einsum("ns,nsf->nf", w27, slabs[li], precision="highest")
            )

    return jnp.concatenate(feats, axis=-1), keep_mask

"""Regularizers: hash-grid total variation and sigma sparsity.

Capability parity: /root/reference/loss.py — total_variation_loss (:11-43,
random-cuboid TV over each hash level) and sigma_sparsity_loss (:45-47,
Cauchy; defined-but-unused upstream, provided for completeness). The entropy
sparsity loss actually used in training lives in ops/volume.py (raw2outputs),
matching the reference's wiring (run_nerf_helpers.py:622-626).

TPU notes: per-level cube sizes are static (resolutions are static), so the
random cuboid is a fixed-shape gather — jit-friendly; only min_vertex is
random (explicit key).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from hashnerf_tpu.ops.hashing import spatial_hash


def _tv_level_geometry(min_resolution: int, max_resolution: int, level: int, n_levels: int):
    b = math.exp((math.log(max_resolution) - math.log(min_resolution)) / (n_levels - 1))
    resolution = int(math.floor(min_resolution * b**level))
    min_cube_size = min_resolution - 1
    max_cube_size = 50  # reference loss.py:18
    cube_size = int(math.floor(min(max(resolution / 10.0, min_cube_size), max_cube_size)))
    return resolution, cube_size


@partial(jax.jit, static_argnames=("min_resolution", "max_resolution", "level", "log2_hashmap_size", "n_levels"))
def total_variation_loss(
    key: jax.Array,
    embeddings: jnp.ndarray,  # (2^T, F) — one hash level
    min_resolution: int,
    max_resolution: int,
    level: int,
    log2_hashmap_size: int,
    n_levels: int = 16,
) -> jnp.ndarray:
    """Squared forward-difference TV over a random cuboid of one level's grid."""
    resolution, cube_size = _tv_level_geometry(min_resolution, max_resolution, level, n_levels)

    min_vertex = jax.random.randint(key, (3,), 0, resolution - cube_size)
    r = jnp.arange(cube_size + 1, dtype=jnp.int32)
    idx = min_vertex[None, :] + r[:, None]  # (C+1, 3)
    gx, gy, gz = jnp.meshgrid(idx[:, 0], idx[:, 1], idx[:, 2], indexing="ij")
    cube_indices = jnp.stack([gx, gy, gz], axis=-1)  # (C+1, C+1, C+1, 3)

    hashed = spatial_hash(cube_indices, log2_hashmap_size)
    cube = embeddings[hashed]  # (C+1, C+1, C+1, F)

    tv_x = jnp.sum((cube[1:, :, :, :] - cube[:-1, :, :, :]) ** 2)
    tv_y = jnp.sum((cube[:, 1:, :, :] - cube[:, :-1, :, :]) ** 2)
    tv_z = jnp.sum((cube[:, :, 1:, :] - cube[:, :, :-1, :]) ** 2)
    return (tv_x + tv_y + tv_z) / cube_size


def total_variation_loss_all_levels(
    key: jax.Array,
    table: jnp.ndarray,  # (L, 2^T, F)
    min_resolution: int,
    max_resolution: int,
    log2_hashmap_size: int,
) -> jnp.ndarray:
    """Sum of per-level TV losses (reference run_nerf.py:632-635).

    All levels' cube lookups are CONCATENATED into one gather on the flat
    (L*2^T, F) table so the backward is a single fast sort+accumulate pass
    (kernels.gather_vjp.take_rows) instead of L separate scatters.
    """
    from hashnerf_tpu.kernels.gather_vjp import take_rows

    n_levels, T, F = table.shape
    keys = jax.random.split(key, n_levels)

    flat_parts = []
    shapes = []
    for l in range(n_levels):
        resolution, cube_size = _tv_level_geometry(
            min_resolution, max_resolution, l, n_levels
        )
        min_vertex = jax.random.randint(keys[l], (3,), 0, resolution - cube_size)
        r = jnp.arange(cube_size + 1, dtype=jnp.int32)
        idx = min_vertex[None, :] + r[:, None]
        gx, gy, gz = jnp.meshgrid(idx[:, 0], idx[:, 1], idx[:, 2], indexing="ij")
        cube_indices = jnp.stack([gx, gy, gz], axis=-1)
        hashed = spatial_hash(cube_indices, log2_hashmap_size) + l * T
        flat_parts.append(hashed.reshape(-1))
        shapes.append((cube_size + 1, cube_size))

    all_idx = jnp.concatenate(flat_parts)
    all_rows = take_rows(table.reshape(n_levels * T, F), all_idx)

    total = jnp.zeros([], jnp.float32)
    off = 0
    for (c1, cube_size) in shapes:
        n = c1 * c1 * c1
        cube = all_rows[off : off + n].reshape(c1, c1, c1, F)
        off += n
        tv_x = jnp.sum((cube[1:, :, :, :] - cube[:-1, :, :, :]) ** 2)
        tv_y = jnp.sum((cube[:, 1:, :, :] - cube[:, :-1, :, :]) ** 2)
        tv_z = jnp.sum((cube[:, :, 1:, :] - cube[:, :, :-1, :]) ** 2)
        total = total + (tv_x + tv_y + tv_z) / cube_size
    return total


def total_variation_loss_packed(
    key: jax.Array,
    tables: dict,  # {"dense": (V,F)?, "fine": (Lf*2^B, 27F)?}
    pcfg,  # ops.packed_grid.PackedGridConfig
) -> jnp.ndarray:
    """TV regularizer for the corner-packed layout (ops/packed_grid.py).

    Same role as the reference's random-cuboid TV (loss.py:11-43), adapted to
    the packed parameterization:
      * dense direct-indexed levels: the cuboid lookup is EXACT (no hash
        collisions aliasing the neighbour diffs — strictly better signal than
        the reference's hashed cube);
      * block-hashed fine levels: within-slab forward diffs over a random
        batch of block rows (neighbour vertices across block boundaries live
        in different rows; the within-slab diffs cover 26/27 of vertex pairs
        in expectation and keep the lookup to one contiguous gather).
    Magnitudes are normalized like the reference (sum of squared diffs /
    cube_size) so the same --tv-loss-weight applies.
    """
    from hashnerf_tpu.kernels.gather_vjp import take_rows

    F = pcfg.n_features_per_level
    n_levels = pcfg.n_levels
    keys = jax.random.split(key, n_levels)
    total = jnp.zeros([], jnp.float32)

    for li, res in enumerate(pcfg.dense_resolutions):
        _, cube_size = _tv_level_geometry(
            pcfg.base_resolution, pcfg.finest_resolution, li, n_levels
        )
        cube_size = min(cube_size, res)  # dense grid edge guard
        min_vertex = jax.random.randint(
            keys[li], (3,), 0, max(res - cube_size, 1)
        )
        r = jnp.arange(cube_size + 1, dtype=jnp.int32)
        idx = min_vertex[None, :] + r[:, None]
        gx, gy, gz = jnp.meshgrid(idx[:, 0], idx[:, 1], idx[:, 2], indexing="ij")
        v = (gx * (res + 1) + gy) * (res + 1) + gz + pcfg.dense_offsets[li]
        cube = take_rows(tables["dense"], v.reshape(-1)).reshape(
            cube_size + 1, cube_size + 1, cube_size + 1, F
        )
        tv_x = jnp.sum((cube[1:] - cube[:-1]) ** 2)
        tv_y = jnp.sum((cube[:, 1:] - cube[:, :-1]) ** 2)
        tv_z = jnp.sum((cube[:, :, 1:] - cube[:, :, :-1]) ** 2)
        total = total + (tv_x + tv_y + tv_z) / cube_size

    n_fine = len(pcfg.fine_resolutions)
    if n_fine:
        n_dense = len(pcfg.dense_resolutions)
        rows_per_level = tables["fine"].shape[0] // n_fine
        # Per-level row batches with per-level normalization derived from
        # _tv_level_geometry, so --tv-loss-weight carries the same meaning
        # across dense and fine levels as the reference's per-level cuboid
        # TV (each level's expected contribution matches a cube_size-sized
        # cube: k*18 sampled diffs/axis scaled up to ~cube_size^3 and then
        # divided by cube_size like loss.py:43). All levels share ONE gather.
        k_rows = max(4096 // n_fine, 512)
        ridx_parts, weights = [], []
        for fi in range(n_fine):
            li = n_dense + fi
            _, cube_size = _tv_level_geometry(
                pcfg.base_resolution, pcfg.finest_resolution, li, n_levels
            )
            ridx_parts.append(
                fi * rows_per_level
                + jax.random.randint(keys[li], (k_rows,), 0, rows_per_level)
            )
            weights.append((float(cube_size) ** 3 / (k_rows * 18.0)) / cube_size)
        slabs = take_rows(tables["fine"], jnp.concatenate(ridx_parts)).reshape(
            n_fine, k_rows, 3, 3, 3, F
        )
        per_level = (
            jnp.sum((slabs[:, :, 1:] - slabs[:, :, :-1]) ** 2, axis=(1, 2, 3, 4, 5))
            + jnp.sum((slabs[:, :, :, 1:] - slabs[:, :, :, :-1]) ** 2, axis=(1, 2, 3, 4, 5))
            + jnp.sum((slabs[..., 1:, :] - slabs[..., :-1, :]) ** 2, axis=(1, 2, 3, 4, 5))
        )
        total = total + jnp.dot(per_level, jnp.asarray(weights, jnp.float32))
    return total


def sigma_sparsity_loss(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Cauchy sparsity on sigma (reference loss.py:45-47)."""
    return jnp.sum(jnp.log(1.0 + 2.0 * sigmas**2), axis=-1)

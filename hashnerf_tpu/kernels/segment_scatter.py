"""Scatter-add as sort + windowed one-hot MXU accumulation (Pallas).

WHY: XLA's TPU scatter-add costs ~60-80 ns/update (measured ~2.0 s for the
25M hash-gradient updates of one chair-config train step) — it serializes
row updates. This kernel reformulates dense-table accumulation as:

  1. (XLA) sort updates by row index (`jax.lax.sort`, bitonic — fast,
     regular data movement);
  2. (XLA) `searchsorted` the window boundaries — per-window entry offsets;
  3. (Pallas) per table-window: DMA the window's sorted entry chunks from
     HBM, build an exact {0,1} one-hot (chunk x SPAN) in VMEM, and
     accumulate acc[SPAN, F] += onehot^T @ vals on the MXU.

No scatter primitive appears anywhere: all data movement is sequential DMA
+ dense matmul, which is what the TPU is fast at. The one-hot is fp32 and
the dot uses HIGHEST precision, so accumulation is exact fp32 (order within
a window differs from XLA's scatter; sums match to fp32 rounding).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window of table rows accumulated per grid step, and sorted-entry chunk size.
SPAN = 1024
CHUNK = 2048


def _window_kernel(offs_ref, idx_hbm, vals_hbm, out_ref, idx_vmem, vals_vmem,
                   sem_i, sem_v, *, F: int):
    w = pl.program_id(0)
    start = offs_ref[w]
    end = offs_ref[w + 1]

    out_ref[...] = jnp.zeros_like(out_ref)

    # Iterate CHUNK-ALIGNED chunks covering [start, end): DMA starts must be
    # provably tile-aligned on TPU. Boundary chunks are shared with adjacent
    # windows, but the row-range mask below keeps contributions disjoint.
    c0 = start // CHUNK
    c1 = (end + CHUNK - 1) // CHUNK
    nchunks = jnp.maximum(0, c1 - c0)

    def dma_pair(ci, slot):
        off = pl.multiple_of((c0 + ci) * CHUNK, CHUNK)
        soff = pl.multiple_of(slot * CHUNK, CHUNK)
        # vals are stored TRANSPOSED (F, M) so the chunk slice runs along the
        # lane dimension (128-aligned); a (CHUNK, F) slice would violate TPU
        # lane tiling (F=2 < 128). Double-buffer slots live side-by-side in
        # flat scratch (slot-dim slicing violates sublane tiling).
        return (
            pltpu.make_async_copy(
                idx_hbm.at[pl.ds(off, CHUNK)],
                idx_vmem.at[pl.ds(soff, CHUNK)],
                sem_i.at[slot],
            ),
            pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(off, CHUNK)],
                vals_vmem.at[:, pl.ds(soff, CHUNK)],
                sem_v.at[slot],
            ),
        )

    @pl.when(nchunks > 0)
    def _():
        a, b = dma_pair(0, 0)
        a.start()
        b.start()

    def body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            a, b = dma_pair(ci + 1, (ci + 1) % 2)
            a.start()
            b.start()

        a, b = dma_pair(ci, slot)
        a.wait()
        b.wait()

        soff = pl.multiple_of(slot * CHUNK, CHUNK)
        local = idx_vmem[pl.ds(soff, CHUNK)] - w * SPAN  # (CHUNK,)
        in_window = (local >= 0) & (local < SPAN)
        local = jnp.where(in_window, local, SPAN)

        # Exact {0,1} one-hot mask (CHUNK, SPAN); sentinel row contributes 0.
        # Accumulate on the VPU (masked multiply + sublane reduction): an MXU
        # dot here pads the F=2 output to 128 lanes and wastes 64x the MACs.
        span_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, SPAN), 1)
        onehot = (span_ids == local[:, None]).astype(jnp.float32)

        vals = vals_vmem[:, pl.ds(soff, CHUNK)]  # (F, CHUNK)
        cols = []
        for f in range(F):
            contrib = onehot * vals[f][:, None]  # (CHUNK, SPAN)
            cols.append(jnp.sum(contrib, axis=0))  # (SPAN,)
        out_ref[...] += jnp.stack(cols, axis=-1)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def sorted_segment_accumulate(
    idx: jnp.ndarray,  # (M,) int32 row ids, ARBITRARY order
    vals: jnp.ndarray,  # (M, F) float32
    num_rows: int,
) -> jnp.ndarray:
    """Dense equivalent of zeros((num_rows, F)).at[idx].add(vals).

    Uses the Pallas window kernel on TPU; on other backends (CPU tests)
    XLA's scatter-add is already adequate and Pallas TPU kernels cannot
    lower, so fall back.
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
    assert num_rows % SPAN == 0, f"num_rows must be a multiple of {SPAN}"
    M, F = vals.shape
    W = num_rows // SPAN

    sidx, *svals = jax.lax.sort(
        (idx.astype(jnp.int32),) + tuple(vals[:, f] for f in range(F)), num_keys=1
    )
    svals = jnp.stack(svals, axis=0)  # (F, M) — lane-major for aligned DMA

    # Pad with out-of-range sentinel so chunk DMAs never run off the end.
    pad = (-M) % CHUNK + CHUNK
    sidx = jnp.concatenate([sidx, jnp.full((pad,), num_rows, jnp.int32)])
    svals = jnp.concatenate([svals, jnp.zeros((F, pad), svals.dtype)], axis=1)

    # Per-window entry offsets; final entry excludes the sentinel tail.
    bounds = jnp.arange(W + 1, dtype=jnp.int32) * SPAN
    offs = jnp.searchsorted(sidx, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # sorted idx stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # sorted vals stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (SPAN, F), lambda w, *_: (w, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * CHUNK,), jnp.int32),
            pltpu.VMEM((F, 2 * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        functools.partial(_window_kernel, F=F),
        out_shape=jax.ShapeDtypeStruct((num_rows, F), jnp.float32),
        grid_spec=grid_spec,
    )(offs, sidx, svals)

"""Pallas TPU kernel: segment-sum of sorted (row, F-vector) updates.

The hash-grid backward reduces to: given SORTED row ids sidx (M,) and values
svals (M, F), produce out (T, F) with out[r] = sum of svals where sidx == r.
This is the scatter-add that dominates the train step (docs/TPU_DESIGN.md:
XLA scatter 1056 ms, XLA sort+scan-of-onehot-matmuls 147 ms at chair scale).

Kernel design (the part XLA can't express without materializing the one-hot
through HBM and paying ~30 us of scan bookkeeping per block):

  * grid = one step per ALIGNED window of R table rows — each grid step owns
    output rows [w*R, (w+1)*R), so output blocks are disjoint and the
    revisit-free output pipeline is safe;
  * the window's elements are the contiguous sorted-array range
    [bounds[w], bounds[w+1]) (bounds = searchsorted(sidx, w*R), computed
    once outside and passed as SCALAR PREFETCH so the kernel can DMA
    dynamically-offset element chunks from HBM);
  * per chunk of P elements: DMA (idx, vals) to VMEM, build the one-hot
    (R, P) in VMEM, and accumulate out_ref += onehot @ vals on the MXU.
    The one-hot never touches HBM; elements are read exactly once.

Traffic: M*(4+16) B + T*16 B  (~320 MB at chair scale ≈ sub-ms), compute:
M*R VPU compares + M*R*F MXU MACs. The sort that produces sidx/svals stays
in XLA (lax.sort is the TPU's gather engine — fast and regular).

Exactness: one-hot weights are exact 0/1 in f32; accumulation is f32 — equal
to scatter-add up to summation order (unit-tested against it, including in
interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Elements per DMA chunk and table rows per window (output block).
_CHUNK = 1024
_R = 1024


def _kernel(bounds_ref, sidx_ref, svals_ref, out_ref, idx_buf, vals_buf, sem):
    w = pl.program_id(0)
    start = bounds_ref[w]
    end = bounds_ref[w + 1]
    out_ref[...] = jnp.zeros_like(out_ref)

    R = out_ref.shape[0]
    P = idx_buf.shape[1]
    # DMA offsets on the lane/sublane dims must be provably tile-aligned:
    # iterate over P-aligned chunks covering [start, end) and mask the edges
    # (the extra elements belong to neighbouring windows' rows — masked out).
    abase = pl.multiple_of((start // P) * P, P)
    n_chunks = pl.cdiv(end - abase, P)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, P), 0)  # window-local row
    col_pos = jax.lax.broadcasted_iota(jnp.int32, (R, P), 1)  # chunk position

    def body(c, _):
        base = pl.multiple_of(abase + c * P, P)
        # both element arrays are laid out with the element axis LAST so the
        # dynamic slice offset lands on the 128-tiled lane dimension
        cp_idx = pltpu.make_async_copy(
            sidx_ref.at[:, pl.ds(base, P)], idx_buf, sem.at[0]
        )
        cp_vals = pltpu.make_async_copy(
            svals_ref.at[:, pl.ds(base, P)], vals_buf, sem.at[1]
        )
        cp_idx.start()
        cp_vals.start()
        cp_idx.wait()
        cp_vals.wait()

        local = idx_buf[0, :] - w * R  # (P,) in [0, R) for in-range elements
        gpos = col_pos + base
        valid = (gpos >= start) & (gpos < end)
        oh = jnp.where(
            (local[None, :] == row_ids) & valid, 1.0, 0.0
        ).astype(jnp.float32)  # (R, P) exact 0/1
        # (R, P) x (F, P) contracted on P -> (R, F)
        out_ref[...] += jax.lax.dot_general(
            oh, vals_buf[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _

    jax.lax.fori_loop(0, n_chunks, body, None)


@functools.partial(jax.jit, static_argnames=("num_rows", "interpret"))
def segment_accumulate_sorted(
    sidx: jnp.ndarray,  # (M,) int32, SORTED ascending, all in [0, num_rows)
    svals_fm: jnp.ndarray,  # (F, M) float32, same element order (lane-major)
    num_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[r] = sum over elements j with sidx[j] == r of svals_fm[:, j].
    Requires sorted sidx; values are passed element-axis-last so in-kernel
    DMA slices land on the 128-tiled lane dimension."""
    F, M = svals_fm.shape
    R, P = _R, _CHUNK

    nw = -(-num_rows // R)
    rows_padded = nw * R

    # Window ranges in the sorted array. Chunk DMAs may read up to P-1
    # elements past a range end — pad the element arrays so those reads stay
    # in bounds (masked out of the accumulation).
    bounds = jnp.searchsorted(
        sidx, jnp.arange(nw + 1, dtype=jnp.int32) * R, side="left"
    ).astype(jnp.int32)
    sidx_p = jnp.concatenate([sidx, jnp.zeros((P,), sidx.dtype)])[None, :]
    svals_p = jnp.concatenate(
        [svals_fm, jnp.zeros((F, P), svals_fm.dtype)], axis=1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # sidx (1, M+P) in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # svals (M+P, F) in HBM
        ],
        out_specs=pl.BlockSpec((R, F), lambda w, bounds: (w, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.int32),
            pltpu.VMEM((F, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_padded, F), jnp.float32),
        interpret=interpret,
    )(bounds, sidx_p, svals_p)
    return out[:num_rows]

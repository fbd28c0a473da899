"""Teschner spatial hashing in TPU-friendly uint32 arithmetic.

Capability parity: /root/reference/embedding/hash_encoding.py:112-128 (`hash`).
The reference computes ``xor_i(coord_i * prime_i) & ((1<<T)-1)`` in torch int64
(primes exceed int32). Because the final mask keeps < 32 low bits and both
multiplication-mod-2^32 and XOR are bitwise-local, uint32 arithmetic produces
identical indices — and maps directly onto the TPU VPU with no 64-bit emulation.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Same primes as Teschner et al. 2003 (reference hash_encoding.py:7).
HASH_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)

# Corner offsets of a voxel, bit order (i, j, k) = (n>>2, (n>>1)&1, n&1)
# (reference hash_encoding.py:10-11, hardcoded on 'cuda' there; plain numpy here).
BOX_OFFSETS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


def spatial_hash(coords: jnp.ndarray, log2_hashmap_size: int) -> jnp.ndarray:
    """Hash integer grid coordinates to table indices.

    coords: (..., d) integer array, d <= 7.
    Returns int32 indices in [0, 2**log2_hashmap_size).
    """
    d = coords.shape[-1]
    if d > len(HASH_PRIMES):
        raise ValueError(f"spatial_hash supports up to {len(HASH_PRIMES)} dims, got {d}")
    c = coords.astype(jnp.uint32)
    acc = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    for i in range(d):
        acc = acc ^ (c[..., i] * jnp.uint32(HASH_PRIMES[i] & 0xFFFFFFFF))
    mask = jnp.uint32((1 << log2_hashmap_size) - 1)
    return (acc & mask).astype(jnp.int32)

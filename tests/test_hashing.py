"""Golden tests for the uint32 spatial hash vs an independent int64 impl."""
import numpy as np
import jax.numpy as jnp

from hashnerf_tpu.ops.hashing import spatial_hash, HASH_PRIMES, BOX_OFFSETS


def golden_hash_int64(coords: np.ndarray, log2_hashmap_size: int) -> np.ndarray:
    """Reference semantics in int64 (what torch computes): XOR of
    coord*prime, masked to T low bits."""
    acc = np.zeros(coords.shape[:-1], dtype=np.int64)
    for i in range(coords.shape[-1]):
        acc ^= coords[..., i].astype(np.int64) * HASH_PRIMES[i]
    return (acc & ((1 << log2_hashmap_size) - 1)).astype(np.int64)


def test_matches_int64_semantics(rng):
    coords = rng.integers(0, 4096, size=(1000, 8, 3)).astype(np.int32)
    for T in (15, 19, 21):
        got = np.asarray(spatial_hash(jnp.asarray(coords), T))
        want = golden_hash_int64(coords, T)
        np.testing.assert_array_equal(got, want)


def test_range():
    coords = np.arange(3 * 64, dtype=np.int32).reshape(-1, 3)
    h = np.asarray(spatial_hash(jnp.asarray(coords), 10))
    assert h.min() >= 0 and h.max() < 1024


def test_zero_coord_hashes_to_zero():
    h = np.asarray(spatial_hash(jnp.zeros((1, 3), jnp.int32), 19))
    assert h[0] == 0


def test_box_offsets_order():
    # bit order (i, j, k) = (n>>2, (n>>1)&1, n&1), reference hash_encoding.py:10
    for n in range(8):
        assert list(BOX_OFFSETS[n]) == [(n >> 2) & 1, (n >> 1) & 1, n & 1]

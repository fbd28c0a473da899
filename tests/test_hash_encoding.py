"""Hash-grid encoding vs an independent per-point numpy implementation."""
import numpy as np
import jax
import jax.numpy as jnp

from hashnerf_tpu.ops.hash_encoding import (
    HashGridConfig,
    hash_encode,
    init_hash_table,
    level_resolutions,
)
from tests.test_hashing import golden_hash_int64


def golden_encode(table, x, bmin, bmax, cfg: HashGridConfig):
    """Slow per-point trilinear hash encode, written independently."""
    L, F = cfg.n_levels, cfg.n_features_per_level
    res = level_resolutions(cfg.base_resolution, cfg.finest_resolution, L)
    N = x.shape[0]
    keep = np.all((x >= bmin) & (x <= bmax), axis=-1)
    xc = np.clip(x, bmin, bmax)
    out = np.zeros((N, L * F), np.float64)
    offsets = np.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], np.int64
    )
    for l in range(L):
        grid = (bmax - bmin) / res[l]
        for n in range(N):
            rel = (xc[n] - bmin) / grid
            bl = np.floor(rel).astype(np.int64)
            w = rel - bl
            acc = np.zeros(F)
            for c in range(8):
                corner = bl + offsets[c]
                h = golden_hash_int64(corner[None], cfg.log2_hashmap_size)[0]
                cw = 1.0
                for d in range(3):
                    cw *= w[d] if offsets[c, d] else (1.0 - w[d])
                acc += cw * np.asarray(table[l, h], np.float64)
            out[n, l * F : (l + 1) * F] = acc
    return out, keep


def test_level_resolutions_default():
    res = level_resolutions(16, 512, 16)
    assert res[0] == 16
    assert res[-1] in (511, 512)  # float32 pow may land one below
    assert all(res[i] <= res[i + 1] for i in range(15))


def test_encode_matches_golden(rng):
    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=12, base_resolution=4, finest_resolution=32)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    bmin = np.array([-1.0, -1.0, -1.0], np.float32)
    bmax = np.array([1.0, 1.0, 1.0], np.float32)
    x = rng.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)

    feats, keep = hash_encode(table, jnp.asarray(x), jnp.asarray(bmin), jnp.asarray(bmax), cfg)
    gold, gkeep = golden_encode(np.asarray(table), x, bmin, bmax, cfg)

    np.testing.assert_array_equal(np.asarray(keep), gkeep)
    np.testing.assert_allclose(np.asarray(feats), gold, rtol=2e-4, atol=1e-7)


def test_encode_matches_golden_L8F4(rng):
    """The TPU fast-mode table shape (L=8, F=4) against the same oracle."""
    cfg = HashGridConfig(
        n_levels=8, n_features_per_level=4, log2_hashmap_size=11,
        base_resolution=4, finest_resolution=64,
    )
    table = init_hash_table(jax.random.PRNGKey(3), cfg)
    bmin = np.array([-1.0, -1.0, -1.0], np.float32)
    bmax = np.array([1.0, 1.0, 1.0], np.float32)
    x = rng.uniform(-1.0, 1.0, size=(16, 3)).astype(np.float32)

    feats, keep = hash_encode(table, jnp.asarray(x), jnp.asarray(bmin), jnp.asarray(bmax), cfg)
    gold, gkeep = golden_encode(np.asarray(table), x, bmin, bmax, cfg)
    assert feats.shape == (16, 32)
    np.testing.assert_array_equal(np.asarray(keep), gkeep)
    np.testing.assert_allclose(np.asarray(feats), gold, rtol=2e-4, atol=1e-7)


def test_encode_shapes_and_grad():
    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4, finest_resolution=16)
    table = init_hash_table(jax.random.PRNGKey(1), cfg)
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    x = jax.random.uniform(jax.random.PRNGKey(2), (17, 3))

    feats, keep = hash_encode(table, x, bmin, bmax, cfg)
    assert feats.shape == (17, cfg.out_dim)
    assert keep.shape == (17,)
    assert bool(jnp.all(keep))

    # scatter-add gradient into the table must be finite and nonzero
    def loss(t):
        f, _ = hash_encode(t, x, bmin, bmax, cfg)
        return jnp.sum(f**2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_boundary_points_do_not_nan():
    cfg = HashGridConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4, finest_resolution=8)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5]])
    feats, keep = hash_encode(table, x, bmin, bmax, cfg)
    assert bool(jnp.isfinite(feats).all())
    assert bool(jnp.all(keep))

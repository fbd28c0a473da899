"""Volume integrator (raw2outputs) golden tests."""
import numpy as np
import jax.numpy as jnp

from hashnerf_tpu.ops.volume import raw2outputs


def golden_raw2outputs(raw, z_vals, rays_d, white_bkgd=False):
    """Independent numpy alpha compositing with the reference's formulas."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    sigma = np.maximum(raw[..., 3], 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    acc = weights.sum(-1)
    depth = (weights * z_vals).sum(-1) / np.maximum(acc, 1e-10)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, weights, acc, depth


def test_matches_golden(rng):
    R, S = 5, 16
    raw = rng.normal(size=(R, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, (R, S)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    g_rgb, g_w, g_acc, g_depth = golden_raw2outputs(raw, z, d)
    np.testing.assert_allclose(np.asarray(out.rgb_map), g_rgb, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), g_w, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acc_map), g_acc, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth_map), g_depth, rtol=1e-4, atol=1e-5)


def test_opaque_wall():
    """A huge sigma at sample k makes the ray return that sample's color/depth."""
    R, S, k = 1, 8, 3
    raw = np.zeros((R, S, 4), np.float32)
    raw[..., :3] = -20.0  # sigmoid ~ 0 -> black
    raw[0, k, :3] = 20.0  # sigmoid ~ 1 -> white
    raw[0, k, 3] = 1e6
    z = np.linspace(0, 1, S, dtype=np.float32)[None]
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out.rgb_map)[0], [1, 1, 1], atol=1e-4)
    np.testing.assert_allclose(float(out.depth_map[0]), z[0, k], atol=1e-5)
    np.testing.assert_allclose(float(out.acc_map[0]), 1.0, atol=1e-5)


def test_empty_space_white_bkgd():
    R, S = 2, 8
    raw = np.zeros((R, S, 4), np.float32)
    raw[..., 3] = -5.0  # relu -> 0 density
    z = np.linspace(1, 2, S, dtype=np.float32)[None].repeat(R, 0)
    d = np.ones((R, 3), np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out.rgb_map), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acc_map), 0.0, atol=1e-7)
    # no NaNs even with zero weights (guarded depth)
    assert np.isfinite(np.asarray(out.depth_map)).all()
    assert np.isfinite(np.asarray(out.sparsity_loss)).all()


def test_entropy_sparsity():
    """Concentrated weights -> low entropy; uniform weights -> high entropy."""
    S = 16
    z = np.linspace(1, 2, S, dtype=np.float32)[None]
    d = np.array([[0.0, 0.0, 1.0]], np.float32)

    raw_c = np.zeros((1, S, 4), np.float32)
    raw_c[0, 5, 3] = 1e6
    ent_c = float(raw2outputs(jnp.asarray(raw_c), jnp.asarray(z), jnp.asarray(d)).sparsity_loss[0])

    raw_u = np.zeros((1, S, 4), np.float32)
    raw_u[..., 3] = 1.0
    ent_u = float(raw2outputs(jnp.asarray(raw_u), jnp.asarray(z), jnp.asarray(d)).sparsity_loss[0])
    assert ent_c < ent_u
    assert ent_c < 0.05

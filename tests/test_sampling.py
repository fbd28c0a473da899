"""Stratified sampler + inverse-CDF sample_pdf golden tests."""
import numpy as np
import jax
import jax.numpy as jnp

from hashnerf_tpu.ops.sampling import stratified_z_vals, perturb_z_vals, sample_pdf


def golden_sample_pdf(bins, weights, u):
    """Independent numpy inverse-CDF with the reference's clamping rules."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    out = np.zeros_like(u)
    for r in range(u.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_b, cdf_a = cdf[r][below], cdf[r][above]
        bins_b, bins_a = bins[r][below], bins[r][above]
        denom = cdf_a - cdf_b
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[r] - cdf_b) / denom
        out[r] = bins_b + t * (bins_a - bins_b)
    return out


def test_stratified_linear():
    z = stratified_z_vals(jnp.array([2.0]), jnp.array([6.0]), 5)
    np.testing.assert_allclose(np.asarray(z)[0], [2, 3, 4, 5, 6], atol=1e-6)


def test_stratified_lindisp():
    z = stratified_z_vals(jnp.array([1.0]), jnp.array([4.0]), 3, lindisp=True)
    # inverse-depth midpoint: 1/(0.5*(1/1) + 0.5*(1/4)) = 1.6
    np.testing.assert_allclose(np.asarray(z)[0], [1.0, 1.6, 4.0], rtol=1e-5)


def test_perturb_within_intervals():
    z = stratified_z_vals(jnp.zeros(8), jnp.ones(8), 16)
    zp = perturb_z_vals(jax.random.PRNGKey(0), z)
    z_np = np.asarray(z)
    zp_np = np.asarray(zp)
    mids = 0.5 * (z_np[..., 1:] + z_np[..., :-1])
    upper = np.concatenate([mids, z_np[..., -1:]], -1)
    lower = np.concatenate([z_np[..., :1], mids], -1)
    assert np.all(zp_np >= lower - 1e-6) and np.all(zp_np <= upper + 1e-6)


def test_sample_pdf_matches_golden(rng):
    R, M, S = 7, 12, 9
    bins = np.sort(rng.uniform(0, 5, (R, M)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (R, M - 1)).astype(np.float32)
    u = rng.uniform(0, 1, (R, S)).astype(np.float32)
    got = sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), S, u=jnp.asarray(u))
    want = golden_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_det_endpoints():
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(3, 0)
    weights = jnp.ones((3, 10))
    s = sample_pdf(None, bins, weights, 5, det=True)
    s = np.asarray(s)
    np.testing.assert_allclose(s[:, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(s[:, -1], 1.0, atol=1e-4)
    assert np.all(np.diff(s, axis=-1) > 0)


def test_sample_pdf_concentrates_mass():
    """All weight in one bin -> all samples inside that bin."""
    bins = jnp.linspace(0.0, 1.0, 11)[None]
    weights = jnp.zeros((1, 10)).at[0, 4].set(100.0)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, weights, 64))
    inside = (s >= 0.39) & (s <= 0.51)
    assert inside.mean() > 0.95


def test_sorted_uniform_is_sorted_and_uniform(rng):
    from hashnerf_tpu.ops.sampling import sorted_uniform

    u = np.asarray(sorted_uniform(jax.random.PRNGKey(3), (512, 33)))
    assert np.all(np.diff(u, axis=-1) >= 0)
    assert np.all((u > 0) & (u < 1))
    # marginal law check: pooled samples must be ~Uniform(0,1)
    flat = np.sort(u.reshape(-1))
    grid = np.linspace(0, 1, flat.size)
    assert np.max(np.abs(flat - grid)) < 0.02  # KS-style bound


def test_merge_sorted_matches_full_sort(rng):
    from hashnerf_tpu.ops.sampling import merge_sorted

    a = np.sort(rng.uniform(0, 10, (17, 9)).astype(np.float32), -1)
    b = np.sort(rng.uniform(0, 10, (17, 14)).astype(np.float32), -1)
    got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_merge_sorted_with_ties():
    from hashnerf_tpu.ops.sampling import merge_sorted

    a = jnp.asarray([[0.0, 1.0, 1.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0]])
    got = np.asarray(merge_sorted(a, b))
    np.testing.assert_allclose(got, [[0.0, 1.0, 1.0, 1.0, 1.0, 2.0, 3.0]])


def test_fast_merge_render_matches_sort_path_statistically():
    """fast_merge changes the RNG stream but not the law: rendered images
    from the two paths on an identical trained-ish field must agree closely
    (both are Monte-Carlo estimates of the same integral)."""
    import dataclasses

    from hashnerf_tpu.render.renderer import RenderConfig, render_rays

    def query_fn(state, pts, vd, bbox, fine=False):
        # a fixed analytic density blob + constant color
        d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
        sigma = 20.0 * jnp.exp(-10.0 * (d - 0.5) ** 2)
        rgb = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.8]), pts.shape)
        return jnp.concatenate([rgb, sigma], -1)

    R = 64
    key = jax.random.PRNGKey(0)
    rays_o = jnp.zeros((R, 3)).at[:, 2].set(-2.0)
    th = jnp.linspace(-0.3, 0.3, R)
    rays_d = jnp.stack([jnp.sin(th), jnp.zeros(R), jnp.cos(th)], -1)
    bbox = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    cfg = RenderConfig(N_samples=32, N_importance=64, perturb=True,
                       use_viewdirs=False)
    outs = {}
    for fm in (False, True):
        c = dataclasses.replace(cfg, fast_merge=fm)
        ret = render_rays(None, query_fn, rays_o, rays_d, None,
                          jnp.full((R,), 1.0), jnp.full((R,), 3.0),
                          bbox, key, c)
        outs[fm] = np.asarray(ret["rgb_map"])
    # same estimator, different stream: tight but not bitwise
    assert np.max(np.abs(outs[True] - outs[False])) < 0.03

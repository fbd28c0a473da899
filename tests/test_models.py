"""Model shape/semantics tests (NeRFSmall, NeRF, NeRFGradient, factory)."""
import numpy as np
import jax
import jax.numpy as jnp

from hashnerf_tpu.models.nerf import (
    NeRFSmallConfig, NeRFConfig,
    init_nerf_small, apply_nerf_small,
    init_nerf, apply_nerf,
    init_nerf_gradient, apply_nerf_gradient,
)
from hashnerf_tpu.models.factory import ModelConfig, create_model
from hashnerf_tpu.ops.hash_encoding import HashGridConfig


def test_nerf_small_shapes():
    cfg = NeRFSmallConfig(input_ch=32, input_ch_views=16)
    p = init_nerf_small(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((11, 48))
    out = apply_nerf_small(p, x, cfg)
    assert out.shape == (11, 4)
    # no-bias layers
    assert all("b" not in layer for layer in p["sigma_net"] + p["color_net"])
    # layer dims: sigma 32->64->16, color 31->64->64->3
    assert p["sigma_net"][0]["w"].shape == (32, 64)
    assert p["sigma_net"][1]["w"].shape == (64, 16)
    assert p["color_net"][0]["w"].shape == (31, 64)
    assert p["color_net"][2]["w"].shape == (64, 3)


def test_nerf_small_sigma_independent_of_views():
    """Sigma comes only from the sigma net -> changing views leaves it fixed."""
    cfg = NeRFSmallConfig(input_ch=32, input_ch_views=16)
    p = init_nerf_small(jax.random.PRNGKey(0), cfg)
    pts = jnp.ones((5, 32))
    v1 = jnp.zeros((5, 16))
    v2 = jnp.ones((5, 16))
    o1 = apply_nerf_small(p, jnp.concatenate([pts, v1], -1), cfg)
    o2 = apply_nerf_small(p, jnp.concatenate([pts, v2], -1), cfg)
    np.testing.assert_allclose(np.asarray(o1[..., 3]), np.asarray(o2[..., 3]), rtol=1e-6)
    assert not np.allclose(np.asarray(o1[..., :3]), np.asarray(o2[..., :3]))


def test_vanilla_nerf_shapes():
    cfg = NeRFConfig(D=8, W=32, input_ch=63, input_ch_views=27, use_viewdirs=True)
    p = init_nerf(jax.random.PRNGKey(0), cfg)
    out = apply_nerf(p, jnp.ones((7, 90)), cfg)
    assert out.shape == (7, 4)
    # skip layer at index skips[0]+1 takes W+input_ch
    assert len(p["pts_linears"]) == 8
    assert p["pts_linears"][5]["w"].shape[0] == 32 + 63


def test_vanilla_nerf_no_viewdirs():
    cfg = NeRFConfig(D=2, W=16, input_ch=3, input_ch_views=0, output_ch=4, use_viewdirs=False, skips=())
    p = init_nerf(jax.random.PRNGKey(0), cfg)
    out = apply_nerf(p, jnp.ones((5, 3)), cfg)
    assert out.shape == (5, 4)


def test_nerf_gradient_shapes():
    cfg = NeRFConfig(D=4, W=32, input_ch=63, input_ch_views=27, use_viewdirs=True)
    p = init_nerf_gradient(jax.random.PRNGKey(0), cfg)
    out = apply_nerf_gradient(p, jnp.ones((7, 90)), cfg)
    assert out.shape == (7, 7)  # rgb + alpha + gradient


def test_factory_hash_path():
    mcfg = ModelConfig(
        N_importance=8,
        hash_grid=HashGridConfig(n_levels=4, log2_hashmap_size=10, finest_resolution=64),
    )
    state, query_fn = create_model(jax.random.PRNGKey(0), mcfg)
    assert state.hash_table.shape == (4, 1024, 2)
    assert state.fine is not None

    bbox = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pts = jax.random.uniform(jax.random.PRNGKey(1), (6, 5, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (6, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    raw = query_fn(state, pts, dirs, bbox, fine=False)
    assert raw.shape == (6, 5, 4)
    raw_f = query_fn(state, pts, dirs, bbox, fine=True)
    assert raw_f.shape == (6, 5, 4)
    assert not np.allclose(np.asarray(raw), np.asarray(raw_f))


def test_factory_out_of_bbox_sigma_zero():
    mcfg = ModelConfig(
        hash_grid=HashGridConfig(n_levels=2, log2_hashmap_size=8, finest_resolution=32)
    )
    state, query_fn = create_model(jax.random.PRNGKey(0), mcfg)
    bbox = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pts = jnp.full((2, 3, 3), 5.0)  # all outside
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    raw = query_fn(state, pts, dirs, bbox)
    np.testing.assert_allclose(np.asarray(raw[..., 3]), 0.0, atol=0)


def test_factory_positional_path():
    mcfg = ModelConfig(i_embed=0, i_embed_views=0, use_viewdirs=True, netdepth=2, netwidth=32)
    state, query_fn = create_model(jax.random.PRNGKey(0), mcfg)
    assert state.hash_table is None
    bbox = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pts = jnp.zeros((3, 4, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    raw = query_fn(state, pts, dirs, bbox)
    assert raw.shape == (3, 4, 4)

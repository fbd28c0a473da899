"""NeRF MLPs as pure init/apply functions over parameter pytrees.

Capability parity: /root/reference/models.py — NeRF (:11), NeRFSmall (:96),
NeRFGradient (:177). Plain pytrees (dicts of weight arrays) instead of
nn.Module: transparent for pjit sharding, optax param groups, and Pallas
fusion later. Weight init matches torch.nn.Linear's default
kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

MLP compute targets the MXU: batched (points, features) matmuls with
`preferred_element_type=float32`; an optional bf16 compute path casts
activations/weights to bfloat16 while keeping fp32 params.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in: int, fan_out: int, bias: bool):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=jnp.float32)
    if not bias:
        return {"w": w}
    b = jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return {"w": w, "b": b}


def _linear(params, x, compute_dtype=None):
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # fp32 parity mode uses full-precision MXU passes; bf16 compute mode takes
    # the fast single-pass path.
    precision = None if compute_dtype is not None else jax.lax.Precision.HIGHEST
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=precision)
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# NeRFSmall — Instant-NGP-style tiny nets (reference models.py:96-174).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NeRFSmallConfig:
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    input_ch: int = 32
    input_ch_views: int = 16


def init_nerf_small(key: jax.Array, cfg: NeRFSmallConfig):
    keys = jax.random.split(key, cfg.num_layers + cfg.num_layers_color)
    sigma = []
    for l in range(cfg.num_layers):
        in_dim = cfg.input_ch if l == 0 else cfg.hidden_dim
        out_dim = 1 + cfg.geo_feat_dim if l == cfg.num_layers - 1 else cfg.hidden_dim
        sigma.append(_linear_init(keys[l], in_dim, out_dim, bias=False))
    color = []
    for l in range(cfg.num_layers_color):
        in_dim = cfg.input_ch_views + cfg.geo_feat_dim if l == 0 else cfg.hidden_dim
        out_dim = 3 if l == cfg.num_layers_color - 1 else cfg.hidden_dim_color
        color.append(_linear_init(keys[cfg.num_layers + l], in_dim, out_dim, bias=False))
    return {"sigma_net": sigma, "color_net": color}


def apply_nerf_small(params, x: jnp.ndarray, cfg: NeRFSmallConfig, compute_dtype=None):
    """x: (N, input_ch + input_ch_views) -> (N, 4) = [rgb logits (3), sigma].

    No sigmoid on color here (reference models.py:170-171) — the integrator
    applies it.
    """
    pts = x[..., : cfg.input_ch]
    views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]

    h = pts
    for l, layer in enumerate(params["sigma_net"]):
        h = _linear(layer, h, compute_dtype)
        if l != cfg.num_layers - 1:
            h = jax.nn.relu(h)
    sigma, geo_feat = h[..., :1], h[..., 1:]

    h = jnp.concatenate([views, geo_feat], axis=-1)
    for l, layer in enumerate(params["color_net"]):
        h = _linear(layer, h, compute_dtype)
        if l != cfg.num_layers_color - 1:
            h = jax.nn.relu(h)

    return jnp.concatenate([h, sigma], axis=-1)


# ---------------------------------------------------------------------------
# Vanilla NeRF — 8x256 with skip + viewdir branch (reference models.py:11-92).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    input_ch: int = 3
    input_ch_views: int = 3
    output_ch: int = 4
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = False


def init_nerf(key: jax.Array, cfg: NeRFConfig):
    n_keys = cfg.D + 6
    keys = jax.random.split(key, n_keys)
    pts_linears = [_linear_init(keys[0], cfg.input_ch, cfg.W, bias=True)]
    for i in range(cfg.D - 1):
        in_dim = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
        pts_linears.append(_linear_init(keys[1 + i], in_dim, cfg.W, bias=True))
    params = {"pts_linears": pts_linears}
    if cfg.use_viewdirs:
        params["views_linears"] = [
            _linear_init(keys[cfg.D], cfg.input_ch_views + cfg.W, cfg.W // 2, bias=True)
        ]
        params["feature_linear"] = _linear_init(keys[cfg.D + 1], cfg.W, cfg.W, bias=True)
        params["alpha_linear"] = _linear_init(keys[cfg.D + 2], cfg.W, 1, bias=True)
        params["rgb_linear"] = _linear_init(keys[cfg.D + 3], cfg.W // 2, 3, bias=True)
    else:
        params["output_linear"] = _linear_init(keys[cfg.D], cfg.W, cfg.output_ch, bias=True)
    return params


def _nerf_trunk(params, pts, cfg: NeRFConfig, compute_dtype=None):
    h = pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_linear(layer, h, compute_dtype))
        if i in cfg.skips:
            h = jnp.concatenate([pts, h], axis=-1)
    return h


def apply_nerf(params, x: jnp.ndarray, cfg: NeRFConfig, compute_dtype=None):
    pts = x[..., : cfg.input_ch]
    views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]
    h = _nerf_trunk(params, pts, cfg, compute_dtype)

    if cfg.use_viewdirs:
        alpha = _linear(params["alpha_linear"], h, compute_dtype)
        feature = _linear(params["feature_linear"], h, compute_dtype)
        h = jnp.concatenate([feature, views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_linear(layer, h, compute_dtype))
        rgb = _linear(params["rgb_linear"], h, compute_dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return _linear(params["output_linear"], h, compute_dtype)


def load_nerf_weights_from_keras(weights, cfg: NeRFConfig):
    """Build a NeRF param pytree from the original TF-NeRF Keras weight list
    (reference models.py:65-92 load_weights_from_keras). The Keras list
    alternates [W, b] per layer in the order pts_linears, feature_linear,
    views_linears[0], rgb_linear, alpha_linear; Keras stores W as (in, out),
    which matches our layout directly (torch needed transposes)."""
    if not cfg.use_viewdirs:
        raise NotImplementedError("Keras import requires use_viewdirs=True")
    import numpy as _np

    def lin(i):
        return {
            "w": jnp.asarray(_np.asarray(weights[i]), jnp.float32),
            "b": jnp.asarray(_np.asarray(weights[i + 1]).reshape(-1), jnp.float32),
        }

    params = {"pts_linears": [lin(2 * i) for i in range(cfg.D)]}
    params["feature_linear"] = lin(2 * cfg.D)
    params["views_linears"] = [lin(2 * cfg.D + 2)]
    params["rgb_linear"] = lin(2 * cfg.D + 4)
    params["alpha_linear"] = lin(2 * cfg.D + 6)
    return params


# ---------------------------------------------------------------------------
# NeRFGradient — extra 3-ch gradient head (reference models.py:177-213).
# ---------------------------------------------------------------------------

def init_nerf_gradient(key: jax.Array, cfg: NeRFConfig):
    key, gkey = jax.random.split(key)
    params = init_nerf(key, cfg)
    if cfg.use_viewdirs:
        params["gradient_linear"] = _linear_init(gkey, cfg.W // 2, 3, bias=True)
    return params


def apply_nerf_gradient(params, x: jnp.ndarray, cfg: NeRFConfig, compute_dtype=None):
    """Outputs (N, 7) = [rgb, alpha, gradient] when use_viewdirs."""
    pts = x[..., : cfg.input_ch]
    views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]
    h = _nerf_trunk(params, pts, cfg, compute_dtype)

    if cfg.use_viewdirs:
        alpha = _linear(params["alpha_linear"], h, compute_dtype)
        feature = _linear(params["feature_linear"], h, compute_dtype)
        h = jnp.concatenate([feature, views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_linear(layer, h, compute_dtype))
        rgb = _linear(params["rgb_linear"], h, compute_dtype)
        gradient = _linear(params["gradient_linear"], h, compute_dtype)
        return jnp.concatenate([rgb, alpha, gradient], axis=-1)
    return _linear(params["output_linear"], h, compute_dtype)

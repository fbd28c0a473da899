"""Ray generation: pinhole, NDC warp, camera-frame direction fields, equirect.

Capability parity: /root/reference/ray_util.py (get_rays :62, get_rays_np :82,
get_ndc_rays :96, get_directions :8, ray_from_directions :33) and the equirect
direction field of /root/reference/load/load_st3d.py:57-67.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def get_rays(H: int, W: int, K, c2w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole rays for a full image.

    K: (3,3) intrinsics, c2w: (3,4) or (4,4) camera-to-world.
    Returns rays_o, rays_d, each (H, W, 3). Directions are NOT normalized
    (matching reference get_rays, ray_util.py:62-80).
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32), indexing="xy"
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], -1
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3], precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_at(K, c2w, ys, xs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole rays at selected pixel coordinates only.

    Same convention as get_rays (reference ray_util.py:62-80) but evaluated
    at (ys, xs) int vectors instead of the full H×W grid — the scanned
    train step selects N_rand pixels first and generates only those rays,
    avoiding an H·W-sized intermediate per step.
    Returns rays_o, rays_d, each (N, 3).
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i = xs.astype(jnp.float32)
    j = ys.astype(jnp.float32)
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], -1
    )
    rays_d = jnp.einsum("nc,rc->nr", dirs, c2w[:3, :3], precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy twin of get_rays for host-side ray-pool construction
    (reference ray_util.py:82-93)."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., np.newaxis, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], np.shape(rays_d))
    return rays_o, rays_d


def get_directions(H: int, W: int, focal: float) -> np.ndarray:
    """Camera-frame direction field used for bbox computation
    (reference ray_util.py:8-31; no +0.5 pixel centering)."""
    xs = np.linspace(0, W - 1, W, dtype=np.float64)
    ys = np.linspace(0, H - 1, H, dtype=np.float64)
    i, j = np.meshgrid(xs, ys)  # (H, W) each, x-fastest like kornia create_meshgrid
    directions = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    ).astype(np.float32)
    return directions


def ray_from_directions(directions: np.ndarray, c2w: np.ndarray):
    """World-space origins + NORMALIZED directions for one camera
    (reference ray_util.py:33-57). Host-side numpy."""
    c2w = np.asarray(c2w, dtype=np.float32)
    rays_d = directions @ c2w[:3, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def get_ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Warp rays into NDC space for forward-facing scenes
    (reference ray_util.py:96-142). Works in jnp or np via jnp dispatch."""
    xp = jnp if isinstance(rays_o, jnp.ndarray) else np
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    rays_o = xp.stack([o0, o1, o2], -1)
    rays_d = xp.stack([d0, d1, d2], -1)
    return rays_o, rays_d


def equirect_directions(H: int, W: int) -> np.ndarray:
    """Per-pixel unit directions for an equirectangular panorama.

    Matches reference load/load_st3d.py:56-66: with row x and column y,
    latitude theta = (1 - 2x/H) * pi/2 (+pi/2 at the top row) and longitude
    phi = 2*pi*(0.5 - y/W); direction = [cos(t)cos(p), sin(t), -cos(t)sin(p)]
    (y-up world).
    """
    x = np.arange(H, dtype=np.float64)[:, None]  # rows
    y = np.arange(W, dtype=np.float64)[None, :]  # cols
    theta = (1.0 - 2.0 * x / H) * np.pi / 2.0  # latitude (H, 1)
    phi = 2.0 * np.pi * (0.5 - y / W)  # longitude (1, W)
    a0 = np.cos(theta) * np.cos(phi)
    a1 = np.broadcast_to(np.sin(theta), (H, W))
    a2 = -np.cos(theta) * np.sin(phi)
    return np.stack([a0, a1, a2], axis=-1).astype(np.float32)


def ray_aabb_near_far(rays_o, rays_d, bbox, near, far):
    """Tighten per-ray [near, far] to the ray's bbox intersection (slab test).

    TPU-native sampling improvement (no reference counterpart — the
    reference marches the full fixed [near, far] range, run_nerf_helpers.py
    :514-536, and wastes most stratified samples outside the scene bbox).
    Rays that miss the bbox collapse to a degenerate interval at `near`
    whose samples are out-of-bbox → sigma 0 → transparent, identical
    compositing semantics. Opt-in via --aabb_clip / RenderConfig.aabb_clip.

    rays_o/rays_d: (R, 3); bbox: (2, 3); near/far: (R,). Returns (near', far').
    """
    import jax.numpy as _jnp

    inv = _jnp.where(_jnp.abs(rays_d) > 1e-10, 1.0 / rays_d, 1e10)
    t1 = (bbox[0] - rays_o) * inv
    t2 = (bbox[1] - rays_o) * inv
    tmin = _jnp.max(_jnp.minimum(t1, t2), axis=-1)
    tmax = _jnp.min(_jnp.maximum(t1, t2), axis=-1)
    lo = _jnp.clip(tmin, near, far)
    hi = _jnp.clip(tmax, near, far)
    hit = tmax > _jnp.maximum(tmin, 0.0)
    new_near = _jnp.where(hit, lo, near)
    new_far = _jnp.where(hit, _jnp.maximum(hi, lo + 1e-4), near + 1e-3)
    return new_near, new_far

"""Procedural test scene: an analytically-rendered Lambertian sphere.

No file dependencies — gives trainable ground-truth images for smoke tests,
benchmarks, and the driver's compile checks. Cameras sit on the blender-style
spherical ring (r=4, looking at the origin), so the scene exercises the same
geometry path as nerf-synthetic (near=2, far=6, blender-style bbox).
"""
from __future__ import annotations

import numpy as np

from hashnerf_tpu.data.scene import Scene
from hashnerf_tpu.data.pose_paths import pose_spherical, spherical_render_poses
from hashnerf_tpu.ops.rays import get_rays_np


def _render_sphere(H, W, K, c2w, radius=1.0, light=(0.5, 0.5, 0.7)):
    """Ray-trace a diffuse sphere at the origin. Returns (H, W, 3) in [0,1]."""
    o, d = get_rays_np(H, W, K, c2w)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[..., None] * d
    n = p / radius
    lightdir = np.asarray(light) / np.linalg.norm(light)
    lam = np.clip(np.sum(n * lightdir, -1), 0, 1)
    # position-dependent albedo so the network must learn spatial variation
    albedo = 0.5 + 0.5 * np.stack([n[..., 0], n[..., 1], n[..., 2]], -1)
    img = np.where(hit[..., None], albedo * (0.2 + 0.8 * lam[..., None]), 1.0)
    return img.astype(np.float32)


def make_synthetic_scene(H: int = 64, W: int = 64, n_train: int = 12, n_test: int = 4) -> Scene:
    focal = 0.5 * W / np.tan(0.5 * 0.6911)  # blender-lego-like fov
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])

    n_total = n_train + n_test + 1
    angles = np.linspace(-180, 180, n_total + 1)[:-1]
    poses = np.stack([pose_spherical(a, -30.0, 4.0) for a in angles], 0)
    images = np.stack(
        [_render_sphere(H, W, K, p[:3, :4]) for p in poses], 0
    )

    idx = np.arange(n_total)
    bbox = (
        np.array([-1.6, -1.6, -1.6], np.float32),
        np.array([1.6, 1.6, 1.6], np.float32),
    )
    return Scene(
        images=images,
        poses=poses[:, :3, :4].astype(np.float32),
        render_poses=spherical_render_poses(8),
        hwf=(H, W, focal),
        K=K,
        i_train=idx[:n_train],
        i_val=idx[n_train : n_train + 1],
        i_test=idx[n_train : n_train + n_test],
        near=2.0,
        far=6.0,
        bounding_box=bbox,
    )

"""Scene bounding-box computation from camera frusta.

Capability parity: /root/reference/bbox.py:10-75 (get_bbox3d_for_blenderobj,
get_bbox3d_for_llff). Host-side numpy — runs once at data load. Instead of the
reference's python double loop over frames and 4 image corners, this evaluates
only the 4 corner rays per camera vectorized.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from hashnerf_tpu.ops.rays import get_directions, ray_from_directions, get_ndc_rays


def _corner_indices(H: int, W: int):
    return [0, W - 1, H * W - W, H * W - 1]


def get_bbox3d_for_blenderobj(
    camera_transforms: dict, H: int, W: int, near: float = 2.0, far: float = 6.0
) -> Tuple[np.ndarray, np.ndarray]:
    """bbox over all train-camera frustum corner points at near/far, +-1 pad
    (reference bbox.py:10-41)."""
    camera_angle_x = float(camera_transforms["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    directions = get_directions(H, W, focal)

    min_bound = np.array([100.0, 100.0, 100.0])
    max_bound = np.array([-100.0, -100.0, -100.0])
    corners = _corner_indices(H, W)
    for frame in camera_transforms["frames"]:
        c2w = np.array(frame["transform_matrix"], dtype=np.float32)
        rays_o, rays_d = ray_from_directions(directions, c2w)
        o, d = rays_o[corners], rays_d[corners]
        pts = np.concatenate([o + near * d, o + far * d], axis=0)
        min_bound = np.minimum(min_bound, pts.min(axis=0))
        max_bound = np.maximum(max_bound, pts.max(axis=0))

    return (
        (min_bound - 1.0).astype(np.float32),
        (max_bound + 1.0).astype(np.float32),
    )


def get_bbox3d_for_llff(
    poses: np.ndarray, hwf, near: float = 0.0, far: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """bbox of NDC-warped frustum corners with (0.1, 0.1, 1e-4) pad
    (reference bbox.py:44-75)."""
    H, W, focal = hwf
    H, W = int(H), int(W)
    directions = get_directions(H, W, focal)

    min_bound = np.array([100.0, 100.0, 100.0])
    max_bound = np.array([-100.0, -100.0, -100.0])
    corners = _corner_indices(H, W)
    for pose in np.asarray(poses, dtype=np.float32):
        rays_o, rays_d = ray_from_directions(directions, pose)
        rays_o, rays_d = get_ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        o, d = rays_o[corners], rays_d[corners]
        pts = np.concatenate([o + near * d, o + far * d], axis=0)
        min_bound = np.minimum(min_bound, pts.min(axis=0))
        max_bound = np.maximum(max_bound, pts.max(axis=0))

    pad = np.array([0.1, 0.1, 0.0001])
    return (
        (min_bound - pad).astype(np.float32),
        (max_bound + pad).astype(np.float32),
    )

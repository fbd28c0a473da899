"""Generate st3d/OmniNeRF training data from one equirect RGB-D panorama.

Capability parity: /root/reference/equirect/Generate_data.ipynb — augments a
single 512x1024 RGB-D panorama into N translated viewpoints with occlusion
masks (rm_occluded/mask_%d.png), writes cam_pos.txt train/test splits in the
layout load_st3d_data expects.

Method: back-project each pixel to a world point (unit direction x depth),
then for each new camera position re-project all points into the new
equirect view with z-buffering; pixels losing the depth test (occluded from
the new viewpoint) are masked out.

Usage:
  python -m hashnerf_tpu.tools.generate_equirect_data <scene_dir> \
      [--n_train 100] [--n_test 10] [--radius 0.3]
  where <scene_dir>/<name>_rgb.png and <scene_dir>/<name>_d.png exist.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from hashnerf_tpu.ops.rays import equirect_directions


def backproject(rgb: np.ndarray, depth: np.ndarray):
    H, W = rgb.shape[:2]
    dirs = equirect_directions(H, W).astype(np.float64)
    pts = dirs * depth[..., None]
    return pts.reshape(-1, 3), rgb.reshape(-1, 3)


def project_equirect(pts: np.ndarray, H: int, W: int):
    """World points -> (row, col, dist) in an equirect camera at origin.
    Inverse of equirect_directions' convention."""
    d = np.linalg.norm(pts, axis=-1)
    dn = pts / np.maximum(d[..., None], 1e-12)
    theta = np.arcsin(np.clip(dn[:, 1], -1, 1))  # latitude
    # equirect_directions: a0 = cos(t)cos(p), a2 = -cos(t)sin(p)
    #   =>  p = atan2(-a2, a0)
    phi = np.arctan2(-dn[:, 2], dn[:, 0])
    x = (1.0 - 2.0 * theta / np.pi) * H / 2.0  # row from latitude
    y = (0.5 - phi / (2.0 * np.pi)) * W  # col from longitude
    return x, y % W, d


def render_view(pts, cols, cam_pos, H, W):
    """Z-buffer splat of the point cloud into an equirect view at cam_pos.
    Returns (rgb, depth, hitmask)."""
    rel = pts - cam_pos[None, :]
    x, y, d = project_equirect(rel, H, W)
    xi = np.clip(np.round(x).astype(np.int64), 0, H - 1)
    yi = np.clip(np.round(y).astype(np.int64), 0, W - 1)
    flat = xi * W + yi

    order = np.argsort(-d)  # far first; near overwrites
    zbuf = np.full(H * W, np.inf)
    img = np.zeros((H * W, 3))
    hit = np.zeros(H * W, bool)
    fo = flat[order]
    zbuf[fo] = d[order]
    img[fo] = cols[order]
    hit[fo] = True
    return img.reshape(H, W, 3), zbuf.reshape(H, W), hit.reshape(H, W)


def occlusion_mask(pts, cam_pos, H, W, src_idx_depth):
    """A source pixel survives if its point is the closest along its ray in
    the NEW view (not occluded by any other point)."""
    rel = pts - cam_pos[None, :]
    x, y, d = project_equirect(rel, H, W)
    xi = np.clip(np.round(x).astype(np.int64), 0, H - 1)
    yi = np.clip(np.round(y).astype(np.int64), 0, W - 1)
    flat = xi * W + yi
    zbuf = np.full(H * W, np.inf)
    np.minimum.at(zbuf, flat, d)
    visible = d <= zbuf[flat] * (1.0 + 1e-3)
    return visible.reshape(H, W)


def generate(scene_dir: str, n_train: int = 100, n_test: int = 10, radius: float = 0.3, seed: int = 0):
    from PIL import Image

    name = os.path.basename(scene_dir.rstrip("/"))
    rgb = np.asarray(Image.open(os.path.join(scene_dir, name + "_rgb.png")))[..., :3] / 255.0
    d = np.asarray(Image.open(os.path.join(scene_dir, name + "_d.png"))).astype(np.float64)
    H, W = rgb.shape[:2]
    depth = d / d.max()

    pts, cols = backproject(rgb, depth)

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(scene_dir, "rm_occluded"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "test"), exist_ok=True)

    train_pos = rng.uniform(-radius, radius, (n_train, 3))
    with open(os.path.join(scene_dir, "cam_pos.txt"), "w") as f:
        for i, c in enumerate(train_pos):
            f.write("{} {} {}\n".format(*c))
            mask = occlusion_mask(pts, c, H, W, depth)
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(scene_dir, "rm_occluded", f"mask_{i}.png")
            )

    test_pos = rng.uniform(-radius / 2, radius / 2, (n_test, 3))
    with open(os.path.join(scene_dir, "test", "cam_pos.txt"), "w") as f:
        for i, c in enumerate(test_pos):
            f.write("{} {} {}\n".format(*c))
            img, _, hit = render_view(pts, cols, c, H, W)
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(scene_dir, "test", f"rgb_{i}.png")
            )
    return scene_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("scene_dir")
    p.add_argument("--n_train", type=int, default=100)
    p.add_argument("--n_test", type=int, default=10)
    p.add_argument("--radius", type=float, default=0.3)
    a = p.parse_args()
    print(generate(a.scene_dir, a.n_train, a.n_test, a.radius))

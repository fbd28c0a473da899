"""st3d / OmniNeRF equirectangular-panorama loader.

Capability parity: /root/reference/load/load_st3d.py:29-169 (load_st3d_data):
one 512x1024 RGB-D panorama -> per-pixel spherical direction field, 100
augmented train viewpoints with occlusion masks, 10 test poses + one identity
(GT) pose, laplacian-of-RGB gradient target. The reference's dataclass-default
bug (`o: List = None` then `.append`) and the NotImplementedError stage=1
branch are not replicated; stage>=1 raises a clear error.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from hashnerf_tpu.data.scene import RayBundle
from hashnerf_tpu.ops.rays import equirect_directions


def _laplacian_gradient(rgb: np.ndarray) -> np.ndarray:
    import cv2

    g = cv2.Laplacian(rgb, cv2.CV_64F)
    return 2.0 * (g - np.min(g)) / np.ptp(g) - 1.0


def load_st3d_data(basedir: str, stage: int = 0) -> Tuple[RayBundle, RayBundle, int, int]:
    from PIL import Image
    import cv2

    if stage > 0:
        raise NotImplementedError(
            "st3d iterative-stage training is unimplemented upstream too "
            "(reference load_st3d.py:92-108 raises NotImplementedError)"
        )

    basename = basedir.rstrip("/").split("/")[-1] + "_"
    rgb = np.asarray(Image.open(os.path.join(basedir, basename + "rgb.png"))) / 255.0

    parent = basedir.rstrip("/").split("/")[-2] if "/" in basedir.rstrip("/") else ""
    if parent == "mp3d":
        d = cv2.imread(
            os.path.join(basedir, basename + "depth.exr"), cv2.IMREAD_ANYDEPTH
        ).astype(np.float64)
    else:
        d = np.asarray(Image.open(os.path.join(basedir, basename + "d.png")))

    gradient = _laplacian_gradient(rgb)

    max_depth = np.max(d)
    d = d.reshape(rgb.shape[0], rgb.shape[1], 1) / max_depth

    H, W = 512, 1024
    original_coord = equirect_directions(H, W).astype(np.float64)
    coord = original_coord * d  # back-projected points at unit-sphere * depth

    image_coords = []
    with open(os.path.join(basedir, "cam_pos.txt"), "r") as fp:
        for p in fp.readlines():
            image_coords.append(np.array(p.split()).astype(float))
    with open(os.path.join(basedir, "test", "cam_pos.txt"), "r") as fp:
        for p in fp.readlines():
            image_coords.append(np.array(p.split()).astype(float))
    image_coords.append(np.array([0.0, 0.0, 0.0]))
    image_coords = np.array(image_coords)

    tr_o, tr_d, tr_rgb, tr_dep, tr_g = [], [], [], [], []
    te_o, te_d, te_rgb, te_dep = [], [], [], []
    for idx, c in enumerate(image_coords):
        dep = np.linalg.norm(coord - c, axis=-1)
        if idx < 100:
            dirs = coord - c
            dirs = dirs / np.linalg.norm(dirs, axis=-1)[..., None]
            mask = (
                np.asarray(
                    Image.open(os.path.join(basedir, "rm_occluded", "mask_%d.png" % idx))
                ).copy()
                / 255
            )
            sel = mask > 0
            tr_o.append(np.repeat(c.reshape(1, -1), sel.sum(), axis=0))
            tr_d.append(dirs[sel])
            tr_rgb.append(rgb[sel])
            tr_dep.append(dep[sel])
            tr_g.append(gradient[sel])
        elif idx < 110:
            te_o.append(np.repeat(c.reshape(1, -1), H * W, axis=0))
            te_d.append(original_coord.reshape(-1, 3))
            te_rgb.append(
                np.asarray(
                    Image.open(os.path.join(basedir, "test", f"rgb_{idx - 100}.png"))
                ).reshape(-1, 3)
                / 255.0
            )
            te_dep.append(dep.reshape(-1))
        else:  # identity (GT) pose
            te_o.append(np.repeat(c.reshape(1, -1), H * W, axis=0))
            te_d.append(coord.reshape(-1, 3))
            te_rgb.append(rgb.reshape(-1, 3))
            te_dep.append(dep.reshape(-1))

    train = RayBundle(
        o=np.concatenate(tr_o, 0).astype(np.float32),
        d=np.concatenate(tr_d, 0).astype(np.float32),
        rgb=np.concatenate(tr_rgb, 0).astype(np.float32),
        depth=np.concatenate(tr_dep, 0).astype(np.float32),
        g=np.concatenate(tr_g, 0).astype(np.float32),
    )
    test = RayBundle(
        o=np.concatenate(te_o, 0).astype(np.float32),
        d=np.concatenate(te_d, 0).astype(np.float32),
        rgb=np.concatenate(te_rgb, 0).astype(np.float32),
        depth=np.concatenate(te_dep, 0).astype(np.float32),
    )
    return train, test, H, W

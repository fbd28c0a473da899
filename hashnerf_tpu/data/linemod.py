"""LINEMOD loader: blender-like json with per-dataset intrinsic matrix K.

Capability parity: /root/reference/load/load_LINEMOD.py:37-93
(load_LINEMOD_data): frames carry absolute file paths and an
`intrinsic_matrix`; near/far come from floor/ceil of the split metadata.
"""
from __future__ import annotations

import json
import os

import numpy as np

from hashnerf_tpu.data.scene import Scene
from hashnerf_tpu.data.pose_paths import spherical_render_poses


def load_linemod_scene(
    basedir: str, half_res: bool = False, testskip: int = 1, white_bkgd: bool = False
) -> Scene:
    import imageio.v2 as imageio
    import cv2

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json"), "r") as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            imgs.append(imageio.imread(frame["file_path"]))
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    K = np.array(metas["train"]["frames"][0]["intrinsic_matrix"], dtype=np.float64)
    focal = float(K[0][0])

    render_poses = spherical_render_poses()

    if half_res:
        H, W = H // 2, W // 2
        focal = focal / 2.0
        K = K.copy()
        K[:2] /= 2.0
        imgs = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA) for im in imgs], 0
        ).astype(np.float32)

    near = float(np.floor(min(metas["train"]["near"], metas["test"]["near"])))
    far = float(np.ceil(max(metas["train"]["far"], metas["test"]["far"])))

    if imgs.shape[-1] == 4:
        if white_bkgd:
            imgs = imgs[..., :3] * imgs[..., -1:] + (1.0 - imgs[..., -1:])
        else:
            imgs = imgs[..., :3]

    return Scene(
        images=imgs.astype(np.float32),
        poses=poses[:, :3, :4],
        render_poses=render_poses,
        hwf=(H, W, focal),
        K=K[:3, :3],
        i_train=i_split[0],
        i_val=i_split[1],
        i_test=i_split[2],
        near=near,
        far=far,
        bounding_box=None,
    )

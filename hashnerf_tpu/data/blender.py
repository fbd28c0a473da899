"""Blender / nerf-synthetic loader.

Capability parity: /root/reference/load/load_blender.py:38-91
(load_blender_data): transforms_{split}.json + PNG frames, RGBA/255, testskip,
spherical demo path, half_res INTER_AREA downsampling, bbox from train-camera
frusta at near=2/far=6. White-background compositing (run_nerf.py:259-262) is
folded in here so the Scene always carries 3-channel images.
"""
from __future__ import annotations

import json
import os

import numpy as np

from hashnerf_tpu.data.scene import Scene
from hashnerf_tpu.data.pose_paths import spherical_render_poses
from hashnerf_tpu.ops.bbox import get_bbox3d_for_blenderobj


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def _resize_area(img: np.ndarray, W: int, H: int) -> np.ndarray:
    import cv2

    return cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)


def load_blender_scene(
    basedir: str, half_res: bool = False, testskip: int = 1, white_bkgd: bool = False
) -> Scene:
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
            imgs.append(_imread(os.path.join(basedir, frame["file_path"] + ".png")))
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)  # RGBA
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_poses = spherical_render_poses()

    if half_res:
        H, W = H // 2, W // 2
        focal = focal / 2.0
        imgs = np.stack([_resize_area(im, W, H) for im in imgs], 0).astype(np.float32)

    bounding_box = get_bbox3d_for_blenderobj(metas["train"], H, W, near=2.0, far=6.0)

    # Alpha compositing (run_nerf.py:259-262)
    if imgs.shape[-1] == 4:
        if white_bkgd:
            imgs = imgs[..., :3] * imgs[..., -1:] + (1.0 - imgs[..., -1:])
        else:
            imgs = imgs[..., :3]

    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    return Scene(
        images=imgs.astype(np.float32),
        poses=poses[:, :3, :4],
        render_poses=render_poses,
        hwf=(H, W, focal),
        K=K,
        i_train=i_split[0],
        i_val=i_split[1],
        i_test=i_split[2],
        near=2.0,
        far=6.0,
        bounding_box=bounding_box,
    )

"""DeepVoxels loader: intrinsics.txt parsing + pose dirs.

Capability parity: /root/reference/load/load_deepvoxels.py:6-108
(load_dv_data). near/far from the hemisphere radius is computed here (the
reference does it in main, run_nerf.py:293-295). No bbox — deepvoxels is a
positional-encoding path in the reference too.
"""
from __future__ import annotations

import os

import numpy as np

from hashnerf_tpu.data.scene import Scene


def _parse_intrinsics(filepath: str, trgt_sidelength: int):
    with open(filepath, "r") as file:
        f, cx, cy = list(map(float, file.readline().split()))[:3]
        grid_barycenter = np.array(list(map(float, file.readline().split())))
        near_plane = float(file.readline())
        scale = float(file.readline())
        height, width = map(float, file.readline().split())
    cx = cx / width * trgt_sidelength
    cy = cy / height * trgt_sidelength
    f = trgt_sidelength / height * f
    return f, cx, cy, grid_barycenter, scale, near_plane


def _load_pose(filename: str) -> np.ndarray:
    nums = open(filename).read().split()
    return np.array([float(x) for x in nums]).reshape([4, 4]).astype(np.float32)


def _dir2poses(posedir: str) -> np.ndarray:
    poses = np.stack(
        [
            _load_pose(os.path.join(posedir, f))
            for f in sorted(os.listdir(posedir))
            if f.endswith("txt")
        ],
        0,
    )
    transf = np.array(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1.0]]
    )
    poses = poses @ transf
    return poses[:, :3, :4].astype(np.float32)


def load_deepvoxels_scene(
    scene: str = "greek", basedir: str = "/data/deepvoxels", testskip: int = 8
) -> Scene:
    import imageio.v2 as imageio

    H = W = 512
    base = f"{basedir}/train/{scene}/"
    focal, cx, cy, _, _, _ = _parse_intrinsics(os.path.join(base, "intrinsics.txt"), H)

    poses = _dir2poses(os.path.join(base, "pose"))
    testposes = _dir2poses(f"{basedir}/test/{scene}/pose")[::testskip]
    valposes = _dir2poses(f"{basedir}/validation/{scene}/pose")[::testskip]

    def _load_imgs(d, skip=1):
        files = [f for f in sorted(os.listdir(d)) if f.endswith("png")]
        return np.stack(
            [imageio.imread(os.path.join(d, f)) / 255.0 for f in files[::skip]], 0
        ).astype(np.float32)

    imgs = _load_imgs(os.path.join(base, "rgb"))
    testimgs = _load_imgs(f"{basedir}/test/{scene}/rgb", testskip)
    valimgs = _load_imgs(f"{basedir}/validation/{scene}/rgb", testskip)

    all_imgs = [imgs, valimgs, testimgs]
    counts = np.cumsum([0] + [x.shape[0] for x in all_imgs])
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]

    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate([poses, valposes, testposes], 0)

    hemi_R = float(np.mean(np.linalg.norm(poses[:, :3, -1], axis=-1)))
    near, far = hemi_R - 1.0, hemi_R + 1.0

    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    return Scene(
        images=imgs[..., :3],
        poses=poses,
        render_poses=testposes,
        hwf=(H, W, focal),
        K=K,
        i_train=i_split[0],
        i_val=i_split[1],
        i_test=i_split[2],
        near=near,
        far=far,
        bounding_box=None,
    )

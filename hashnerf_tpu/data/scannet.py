"""ScanNet loader: nerf-style json with OpenCV->NeRF axis flip, mesh bbox.

Capability parity: /root/reference/load/load_scannet.py:37-106
(load_scannet_data). The pyvista mesh-bounds dependency is replaced by a
minimal self-contained PLY reader (ascii + binary_little_endian) that computes
vertex bounds.
"""
from __future__ import annotations

import json
import os
import struct

import numpy as np

from hashnerf_tpu.data.scene import Scene
from hashnerf_tpu.data.pose_paths import spherical_render_poses


def ply_vertex_bounds(path: str):
    """Min/max of vertex positions in a PLY file (replaces pyvista
    mesh.bounds, reference load_scannet.py:103-105)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_vertex = 0
        props = []  # (name, dtype) for the vertex element
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1].decode()
            elif line.startswith(b"element"):
                parts = line.split()
                in_vertex = parts[1] == b"vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif line.startswith(b"property") and in_vertex:
                parts = line.split()
                props.append((parts[-1].decode(), parts[1].decode()))
            elif line == b"end_header":
                break

        type_map = {
            "float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
            "float64": ("d", 8), "uchar": ("B", 1), "uint8": ("B", 1),
            "char": ("b", 1), "int8": ("b", 1), "short": ("h", 2),
            "ushort": ("H", 2), "int": ("i", 4), "int32": ("i", 4),
            "uint": ("I", 4), "uint32": ("I", 4),
        }
        if fmt == "ascii":
            pts = []
            names = [p[0] for p in props]
            ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
            for _ in range(n_vertex):
                vals = f.readline().split()
                pts.append([float(vals[ix]), float(vals[iy]), float(vals[iz])])
            v = np.asarray(pts)
        elif fmt == "binary_little_endian":
            fmt_str = "<" + "".join(type_map[t][0] for _, t in props)
            size = struct.calcsize(fmt_str)
            names = [p[0] for p in props]
            ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
            raw = f.read(n_vertex * size)
            arr = np.array(
                [struct.unpack_from(fmt_str, raw, i * size) for i in range(n_vertex)]
            )
            v = arr[:, [ix, iy, iz]].astype(np.float64)
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return v.min(0), v.max(0)


def load_scannet_scene(
    basedir: str,
    sceneID: str = "scene0000_00",
    half_res: bool = False,
    trainskip: int = 10,
    testskip: int = 1,
) -> Scene:
    import imageio.v2 as imageio
    import cv2

    scansdir = os.path.join(basedir, "scans")
    nerfdir = os.path.join(basedir, "nerfstyle_" + sceneID)

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(nerfdir, f"transforms_{s}.json"), "r") as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = trainskip if s == "train" else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            imgs.append(imageio.imread(os.path.join(nerfdir, frame["file_path"] + ".png")))
            pose = np.array(frame["transform_matrix"])
            # OpenCV -> NeRF convention (reference load_scannet.py:67-69)
            pose[:3, 1] *= -1
            pose[:3, 2] *= -1
            poses.append(pose)
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(metas["test"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_poses = spherical_render_poses()

    if half_res:
        H, W = H // 2, W // 2
        focal = focal / 2.0
        imgs = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA) for im in imgs], 0
        ).astype(np.float32)

    vmin, vmax = ply_vertex_bounds(
        os.path.join(scansdir, sceneID, f"{sceneID}_vh_clean.ply")
    )
    bounding_box = (
        (vmin - 1.0).astype(np.float32),
        (vmax + 1.0).astype(np.float32),
    )

    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    return Scene(
        images=imgs[..., :3].astype(np.float32),
        poses=poses[:, :3, :4],
        render_poses=render_poses,
        hwf=(H, W, focal),
        K=K,
        i_train=i_split[0],
        i_val=i_split[1],
        i_test=i_split[2],
        near=0.1,
        far=10.0,
        bounding_box=bounding_box,
    )

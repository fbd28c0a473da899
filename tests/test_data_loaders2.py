"""Loader tests: scannet, deepvoxels, LINEMOD, st3d (tiny generated data)."""
import json
import os
import struct

import numpy as np
import pytest

from hashnerf_tpu.data.pose_paths import pose_spherical


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(str(path), arr)


def test_scannet_loader(tmp_path):
    from hashnerf_tpu.data.scannet import load_scannet_scene

    rng = np.random.default_rng(0)
    H = W = 24
    sceneID = "scene0000_00"
    nerfdir = tmp_path / ("nerfstyle_" + sceneID)
    scandir = tmp_path / "scans" / sceneID
    os.makedirs(nerfdir / "frames")
    os.makedirs(scandir)

    for split, n in [("train", 10), ("val", 2), ("test", 2)]:
        frames = []
        for i in range(n):
            fname = f"frames/{split}_{i}"
            _write_png(nerfdir / (fname + ".png"), rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
            frames.append(
                {"file_path": fname, "transform_matrix": pose_spherical(i * 30.0, -20, 3.0).tolist()}
            )
        with open(nerfdir / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.9, "frames": frames}, f)

    # binary PLY mesh for bounds
    verts = [(-2.0, -1.0, 0.0), (3.0, 4.0, 2.5)]
    header = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    with open(scandir / f"{sceneID}_vh_clean.ply", "wb") as f:
        f.write(header + b"".join(struct.pack("<fff", *v) for v in verts))

    sc = load_scannet_scene(str(tmp_path), sceneID, half_res=False, trainskip=2)
    assert len(sc.i_train) == 5  # trainskip=2 over 10
    assert sc.near == 0.1 and sc.far == 10.0
    bmin, bmax = sc.bounding_box
    np.testing.assert_allclose(bmin, [-3.0, -2.0, -1.0])
    np.testing.assert_allclose(bmax, [4.0, 5.0, 3.5])
    # OpenCV->NeRF flip applied: columns 1,2 negated vs raw matrix
    raw = np.array(pose_spherical(0.0, -20, 3.0))
    np.testing.assert_allclose(sc.poses[0][:3, 1], -raw[:3, 1], atol=1e-6)


def test_deepvoxels_loader(tmp_path):
    from hashnerf_tpu.data.deepvoxels import load_deepvoxels_scene

    rng = np.random.default_rng(1)
    scene = "greek"
    for split, n in [("train", 4), ("test", 2), ("validation", 2)]:
        base = tmp_path / split / scene
        os.makedirs(base / "pose")
        os.makedirs(base / "rgb")
        for i in range(n):
            m = np.eye(4)
            m[:3, 3] = [0, 0, 2.0 + 0.1 * i]
            with open(base / "pose" / f"{i:03d}.txt", "w") as f:
                f.write(" ".join(str(v) for v in m.ravel()))
            _write_png(base / "rgb" / f"{i:03d}.png", rng.integers(0, 255, (512, 512, 3)).astype(np.uint8))
        if split == "train":
            with open(base / "intrinsics.txt", "w") as f:
                f.write("400.0 256.0 256.0\n0 0 0\n1.0\n1.0\n512 512\n0\n")

    sc = load_deepvoxels_scene(scene, str(tmp_path), testskip=1)
    assert sc.images.shape[1:] == (512, 512, 3)
    assert len(sc.i_train) == 4 and len(sc.i_test) == 2
    # near/far from hemisphere radius (run_nerf.py:293-295)
    assert sc.near == pytest.approx(sc.far - 2.0)
    assert sc.bounding_box is None


def test_linemod_loader(tmp_path):
    from hashnerf_tpu.data.linemod import load_linemod_scene

    rng = np.random.default_rng(2)
    H = W = 16
    K = [[120.0, 0, 8.0], [0, 120.0, 8.0], [0, 0, 1.0]]
    for split, n in [("train", 3), ("val", 1), ("test", 2)]:
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            fp = str(tmp_path / split / f"{i}.png")
            _write_png(fp, rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
            frames.append(
                {
                    "file_path": fp,
                    "transform_matrix": pose_spherical(i * 50.0, -30, 2.5).tolist(),
                    "intrinsic_matrix": K,
                }
            )
        meta = {"frames": frames, "near": 0.4, "far": 2.2}
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)

    sc = load_linemod_scene(str(tmp_path), half_res=False, testskip=1)
    assert sc.K[0, 0] == 120.0
    assert sc.near == 0.0 and sc.far == 3.0  # floor/ceil (load_LINEMOD.py:91-92)
    assert len(sc.i_test) == 2


# st3d_dir fixture lives in conftest.py (session scope — shared with the
# st3d CLI e2e test in test_cli.py)
def test_st3d_loader(st3d_dir):
    from hashnerf_tpu.data.st3d import load_st3d_data

    train, test, H, W = load_st3d_data(st3d_dir, stage=0)
    assert (H, W) == (512, 1024)
    assert train.o.shape == train.d.shape == train.rgb.shape
    assert train.depth.shape[0] == train.o.shape[0]
    assert train.g.shape == train.rgb.shape
    # directions unit-norm
    np.testing.assert_allclose(np.linalg.norm(train.d, axis=-1), 1.0, atol=1e-4)
    # test split: 10 aug views + 1 GT view, full panoramas
    assert test.rgb.shape[0] == 11 * H * W
    assert test.g is None
    # rgb normalized
    assert 0.0 <= train.rgb.min() and train.rgb.max() <= 1.0


def test_st3d_stage_raises(st3d_dir):
    from hashnerf_tpu.data.st3d import load_st3d_data

    with pytest.raises(NotImplementedError):
        load_st3d_data(st3d_dir, stage=1)

"""Offline tooling smoke tests (SURVEY §2 #30-31: the reference's scripts/
directory + camera_pose_visualizer — gif assembly, loss plots, pose viz,
render-path plot, checkpoint re-render)."""
import os
import pickle

import numpy as np
import pytest


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(str(path), arr)


def test_make_gif_collects_iteration_frames(tmp_path):
    """Reference scripts/make_gif.py: stitch first frames of renderonly_* /
    testset_* dirs into an iter-stamped convergence gif."""
    from hashnerf_tpu.tools.make_gif import collect_frames, make_gif

    rng = np.random.default_rng(0)
    for it in (100, 300, 200):
        d = tmp_path / f"testset_{it:06d}"
        os.makedirs(d)
        _write_png(d / "000.png",
                   rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    # a non-matching dir must be ignored
    os.makedirs(tmp_path / "not_a_render_dir")

    frames = collect_frames(str(tmp_path))
    assert [it for it, _ in frames] == [100, 200, 300]  # iteration order
    out = make_gif(str(tmp_path))
    assert os.path.exists(out) and out.endswith("convergence.gif")


def test_make_gif_empty_dir_raises(tmp_path):
    from hashnerf_tpu.tools.make_gif import make_gif

    with pytest.raises(FileNotFoundError):
        make_gif(str(tmp_path))


def test_plot_losses(tmp_path):
    """Reference scripts/plot_losses.py consumes the loss_vs_time.pkl the
    trainer writes (run_nerf.py:708-719 layout)."""
    from hashnerf_tpu.tools.plot_losses import plot_losses

    hist = {
        "losses": list(np.exp(-np.linspace(0, 3, 50))),
        "psnr": list(np.linspace(10, 30, 50)),
        "time": list(np.linspace(0, 100, 50)),
    }
    with open(tmp_path / "loss_vs_time.pkl", "wb") as f:
        pickle.dump(hist, f)
    out = plot_losses(str(tmp_path))
    assert os.path.exists(out) and out.endswith("losses.png")


def test_pose_visualizer(tmp_path):
    """Reference camera_pose_visualizer.py: frustum pyramids from c2w."""
    from hashnerf_tpu.data.pose_paths import pose_spherical
    from hashnerf_tpu.tools.pose_visualizer import CameraPoseVisualizer

    viz = CameraPoseVisualizer()
    for th in (0.0, 120.0, 240.0):
        viz.add_pose(np.asarray(pose_spherical(th, -30.0, 4.0))[:3, :4])
    out = str(tmp_path / "poses.png")
    viz.save(out)
    assert os.path.exists(out)


def test_blender_render_poses_plot(tmp_path):
    """Reference scripts/blender_render_poses.py: plot the spherical path."""
    from hashnerf_tpu.tools.blender_render_poses import plot_render_path

    out = plot_render_path(str(tmp_path / "render_poses.png"), n=12)
    assert os.path.exists(out)


def test_generate_equirect_roundtrip():
    """Datagen geometry: project_equirect inverts equirect_directions."""
    from hashnerf_tpu.ops.rays import equirect_directions
    from hashnerf_tpu.tools.generate_equirect_data import project_equirect

    H, W = 32, 64
    dirs = equirect_directions(H, W).astype(np.float64)
    x, y, d = project_equirect(dirs.reshape(-1, 3) * 2.0, H, W)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # pixel-center convention: recovered coordinates within half a pixel
    assert np.max(np.abs(x - (gy.reshape(-1) + 0.5))) <= 0.51
    wrap = np.minimum(np.abs(y - (gx.reshape(-1) + 0.5)),
                      W - np.abs(y - (gx.reshape(-1) + 0.5)))
    assert np.max(wrap) <= 0.51
    np.testing.assert_allclose(d, 2.0, atol=1e-9)

"""LLFF/NDC end-to-end TRAINING test (VERDICT r4 next #8).

The reference's forward-facing path warps batch rays to NDC inside render()
(run_nerf_helpers.py:353-356) with near=0/far=1 bounds (run_nerf.py:577-605
trains through that same render call); our train step calls render_rays
directly, so the warp lives in make_loss_fn (driver.py). This test drives a
tiny synthetic forward-facing scene through ndc=True training — the last
previously-untested render_rays branch.
"""
import numpy as np
import pytest

from hashnerf_tpu.data.scene import Scene
from hashnerf_tpu.data.synthetic import _render_view
from hashnerf_tpu.ops.bbox import get_bbox3d_for_llff
from hashnerf_tpu.train.config import config_parser
from hashnerf_tpu.train.driver import Trainer


def _forward_facing_scene(H=40, W=40, n_train=6, n_test=1):
    """LLFF-like rig: cameras on a small grid at z≈4 looking along -z
    (identity rotation, blender/right-up-back convention), NDC bounds
    near=0 far=1 like the reference's llff branch (run_nerf.py:276-283)."""
    focal = 0.5 * W / np.tan(0.5 * 0.6911)
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    rng = np.random.default_rng(0)
    n = n_train + n_test
    offsets = rng.uniform(-0.25, 0.25, (n, 2))
    poses = np.stack(
        [
            np.array(
                [[1, 0, 0, ox], [0, 1, 0, oy], [0, 0, 1, 4.0]], np.float32
            )
            for ox, oy in offsets
        ],
        0,
    )
    images = np.stack(
        [_render_view(H, W, K, p, "sphere", 2) for p in poses], 0
    ).astype(np.float32)
    bbox = get_bbox3d_for_llff(poses, (H, W, focal), near=0.0, far=1.0)
    idx = np.arange(n)
    return Scene(
        images=images,
        poses=poses,
        render_poses=poses[:1],
        hwf=(H, W, focal),
        K=K,
        i_train=idx[:n_train],
        i_val=idx[n_train:],
        i_test=idx[n_train:],
        near=0.0,
        far=1.0,
        bounding_box=bbox,
        ndc=True,
        lindisp=False,
    )


def test_ndc_train_loss_decreases():
    scene = _forward_facing_scene()
    args = config_parser().parse_args([])
    args.N_rand = 256
    args.N_samples = 24
    args.N_importance = 16
    args.use_viewdirs = True
    args.white_bkgd = False
    args.finest_res = 64
    args.log2_hashmap_size = 12
    args.n_levels = 8
    args.lrate = 0.01
    args.chunk = 2048

    trainer = Trainer(args, scene)
    assert trainer.render_cfg.ndc
    assert trainer.near == 0.0 and trainer.far == 1.0

    rng = np.random.default_rng(1)
    losses, psnrs = [], []
    for _ in range(24):
        img_i = int(rng.choice(scene.i_train))
        m = trainer.step(trainer.sample_image(img_i, args.N_rand, precrop=False))
        losses.append(float(m["loss"]))
        psnrs.append(float(m["psnr"]))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-6:]) < np.mean(losses[:6])
    assert np.mean(psnrs[-6:]) > np.mean(psnrs[:6])


def test_ndc_eval_render_finite():
    """render() applies the same NDC warp at eval; all maps finite and the
    trained-for-a-few-steps field renders a plausible image."""
    scene = _forward_facing_scene(H=24, W=24, n_train=3, n_test=1)
    args = config_parser().parse_args([])
    args.N_rand = 128
    args.N_samples = 16
    args.N_importance = 0
    args.use_viewdirs = True
    args.finest_res = 32
    args.log2_hashmap_size = 10
    args.chunk = 1024

    trainer = Trainer(args, scene)
    rng = np.random.default_rng(2)
    for _ in range(4):
        img_i = int(rng.choice(scene.i_train))
        trainer.step(trainer.sample_image(img_i, args.N_rand, precrop=False))

    rgbs, depths, psnrs = trainer.render_test_path(
        scene.poses[scene.i_test], gt_imgs=scene.images[scene.i_test]
    )
    assert rgbs.shape == (1, 24, 24, 3)
    assert np.all(np.isfinite(rgbs)) and np.all(np.isfinite(depths))
    assert psnrs and np.isfinite(psnrs[0])

"""Write a full-scale nerf-synthetic-format dataset from the procedural
ray tracer (VERDICT r3 #2/#4: no real datasets exist in this environment, so
full-scale shape validation uses reference-shaped data generated on disk).

Produces the exact on-disk layout the blender loader consumes
(`/root/reference/load/load_blender.py:38-91` — transforms_{split}.json with
camera_angle_x + frames[].file_path/transform_matrix, RGBA PNGs):

    basedir/
      transforms_train.json   train/r_000.png ... (default 100 frames, like
      transforms_val.json     val/r_000.png ...    the nerf-synthetic sets)
      transforms_test.json    test/r_000.png ...

at the reference's native 800x800 resolution, so `run_nerf.py --config` runs
the REAL pipeline end-to-end: loader -> frustum bbox -> training ->
full-frame testset renders (640k rays/frame).

Usage:
  python -m hashnerf_tpu.tools.make_blender_dataset OUTDIR \
      [--hw 800] [--n_train 100] [--n_val 8] [--n_test 25] [--scene multi]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _pose_for(rng: np.random.Generator):
    """Random upper-hemisphere viewpoint, blender-convention c2w (the real
    sets use randomized orbits, not a uniform ring)."""
    from hashnerf_tpu.data.pose_paths import pose_spherical

    theta = rng.uniform(-180.0, 180.0)
    phi = rng.uniform(-60.0, -5.0)
    return pose_spherical(theta, phi, 4.0)


def write_split(basedir, split, n, H, W, scene_kind, ss, camera_angle_x, seed):
    import imageio.v2 as imageio

    from hashnerf_tpu.data.synthetic import _render_view

    rng = np.random.default_rng(seed)
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    os.makedirs(os.path.join(basedir, split), exist_ok=True)
    frames = []
    for i in range(n):
        c2w = _pose_for(rng)
        img = _render_view(H, W, K, np.asarray(c2w)[:3, :4], scene_kind, ss)
        # the tracer composites onto white; store straight RGB + opaque
        # alpha (the loader's white_bkgd compositing is then the identity,
        # matching how GT was rendered)
        rgba = np.concatenate(
            [img, np.ones_like(img[..., :1])], axis=-1
        )
        path = f"{split}/r_{i:03d}"
        imageio.imwrite(
            os.path.join(basedir, path + ".png"),
            (np.clip(rgba, 0, 1) * 255).astype(np.uint8),
        )
        frames.append(
            {
                "file_path": "./" + path,
                "rotation": 0.0,
                "transform_matrix": np.asarray(c2w, np.float64).tolist(),
            }
        )
        if (i + 1) % 10 == 0:
            print(f"  {split}: {i + 1}/{n}", flush=True)
    meta = {"camera_angle_x": camera_angle_x, "frames": frames}
    with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as f:
        json.dump(meta, f, indent=1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("--hw", type=int, default=800)
    p.add_argument("--n_train", type=int, default=100)
    p.add_argument("--n_val", type=int, default=8)
    p.add_argument("--n_test", type=int, default=25)
    p.add_argument("--scene", default="multi", choices=["sphere", "multi"])
    p.add_argument("--ss", type=int, default=2,
                   help="supersampling for the GT tracer (2 at 800x800 "
                   "traces 2.56M rays/frame)")
    a = p.parse_args(argv)

    camera_angle_x = 0.6911112070083618  # the nerf-synthetic lego value
    os.makedirs(a.outdir, exist_ok=True)
    for split, n, seed in (("train", a.n_train, 0), ("val", a.n_val, 1),
                           ("test", a.n_test, 2)):
        print(f"rendering {split} ({n} frames at {a.hw}x{a.hw})...", flush=True)
        write_split(a.outdir, split, n, a.hw, a.hw, a.scene, a.ss,
                    camera_angle_x, seed)
    print(f"wrote {a.outdir}")


if __name__ == "__main__":
    main()

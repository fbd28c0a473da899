#!/usr/bin/env python
"""CLI entry point: `python run_nerf.py --config configs/chair.txt`.

Capability parity: /root/reference/run_nerf.py:188-732 (main) — data dispatch,
experiment dir setup, render-only short-circuit, training loop with periodic
checkpoint/testset/video, and the st3d (equirect) loop variant.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from hashnerf_tpu.train.config import parse_args, create_expname
    from hashnerf_tpu.utils.io import dump_args

    args = parse_args(argv)

    if args.dataset_type == "st3d":
        return main_st3d(args)

    from hashnerf_tpu.data import load_scene
    from hashnerf_tpu.train.driver import Trainer, train_loop

    scene = load_scene(args.dataset_type, args.datadir, args)

    args.expname = create_expname(args)
    savepath = os.path.join(args.basedir, args.expname)
    os.makedirs(savepath, exist_ok=True)
    dump_args(savepath, vars(args), args.config)

    if args.render_only:
        trainer = Trainer(args, scene)
        restored = trainer.try_restore(savepath, args.ft_path)
        print("RENDER ONLY (restored checkpoint)" if restored else "RENDER ONLY (fresh init)")
        if args.render_test:
            poses, gt = scene.poses[scene.i_test], scene.images[scene.i_test]
        else:
            poses, gt = scene.render_poses, None
        testsavedir = os.path.join(
            savepath,
            "renderonly_{}_{:06d}".format(
                "test" if args.render_test else "path", trainer.global_step
            ),
        )
        os.makedirs(testsavedir, exist_ok=True)
        rgbs, _, psnrs = trainer.render_test_path(
            poses, gt_imgs=gt, savedir=testsavedir, render_factor=args.render_factor
        )
        from hashnerf_tpu.utils.io import save_video

        save_video(os.path.join(testsavedir, "video.mp4"), rgbs)
        print("Done rendering", testsavedir)
        return

    train_loop(args, scene)


def main_st3d(args):
    """Equirect-panorama training (reference run_nerf.py:406-501)."""
    import jax
    import jax.numpy as jnp
    from hashnerf_tpu.data.st3d import load_st3d_data
    from hashnerf_tpu.train.config import create_expname
    from hashnerf_tpu.train.driver import Trainer
    from hashnerf_tpu.utils.io import dump_args, save_gif
    from hashnerf_tpu.utils.metrics import img2mse, mse2psnr, to8b

    rays, rays_test, H, W = load_st3d_data(args.datadir, args.stage)
    near, far = 0.0, 2.0
    print(f"Near Far bounds are: {near}, {far}")

    args.expname = create_expname(args)
    savepath = os.path.join(args.basedir, args.expname)
    os.makedirs(savepath, exist_ok=True)
    dump_args(savepath, vars(args), args.config)

    trainer = Trainer(args, scene=None)
    trainer.near, trainer.far = near, far
    # bbox: panorama scene fits in [-far, far]^3 around the origin
    trainer.bbox = jnp.array([[-far, -far, -far], [far, far, far]], jnp.float32)
    trainer._train_step = trainer._build_train_step()
    if not args.no_reload:
        trainer.try_restore(savepath, args.ft_path)

    rng = np.random.default_rng(0)
    rays = rays.shuffled(rng)
    n_rand = args.N_rand
    n_iters = args.N_iters if args.N_iters != 50000 else 200000

    def device_pool(r):
        pool = {
            "rays_o": jnp.asarray(r.o),
            "rays_d": jnp.asarray(r.d),
            "target": jnp.asarray(r.rgb),
        }
        if args.use_depth:
            pool["target_depth"] = jnp.asarray(r.depth)
        if args.use_gradient and r.g is not None:
            pool["target_grad"] = jnp.asarray(r.g)
        return pool

    pool = device_pool(rays)
    pool_size = rays.rgb.shape[0]
    i_batch = 0

    import time

    time0 = time.time()
    spd = max(1, getattr(args, "steps_per_dispatch", 1))
    i = trainer.global_step + 1
    while i <= n_iters:
        # scanned span: stop at the next periodic event or epoch boundary
        end = n_iters
        for e in (args.i_print, args.i_weights, args.i_testset):
            if e and e > 0:
                end = min(end, ((i - 1) // e + 1) * e)
        end = min(end, i + (pool_size - i_batch) // n_rand - 1)
        if end < i:
            rays = rays.shuffled(rng)
            pool = device_pool(rays)
            i_batch = 0
            continue
        n = end - i + 1
        metrics = trainer.run_steps_pool(pool, i_batch, n, block_size=spd)
        i_batch += n * n_rand
        i = end

        if i % args.i_weights == 0:
            trainer.save(os.path.join(savepath, "{:06d}.ckpt".format(i)))
        if i % args.i_testset == 0 and i > 0:
            testsavedir = os.path.join(savepath, "testset_{:06d}".format(i))
            eval_test_omninerf(trainer, rays_test, H, W, testsavedir)
        if i % args.i_print == 0:
            print(f"[TRAIN] Iter: {i} Loss: {float(metrics['loss'])}  PSNR: {float(metrics['psnr'])}")
        i += 1

    return trainer


def eval_test_omninerf(trainer, rays_test, H, W, savedir):
    """Render test rays, PSNR vs GT pose, boomerang gif
    (reference run_nerf.py:171-186)."""
    import jax.numpy as jnp
    from hashnerf_tpu.render.renderer import render
    from hashnerf_tpu.utils.io import save_gif
    from hashnerf_tpu.utils.metrics import to8b

    os.makedirs(savedir, exist_ok=True)
    n_views = rays_test.rgb.shape[0] // (H * W)
    k = getattr(trainer.args, "st3d_eval_views", 0)
    first = max(0, n_views - k) if k > 0 else 0
    rgbs = []
    for v in range(first, n_views):
        sl = slice(v * H * W, (v + 1) * H * W)
        rgb, _, _, _ = render(
            trainer.state, trainer.query_fn, H, W, None, trainer.bbox,
            trainer.render_cfg.eval_mode(), chunk=trainer.args.chunk,
            rays=(jnp.asarray(rays_test.o[sl]), jnp.asarray(rays_test.d[sl])),
            near=trainer.near, far=trainer.far,
        )
        rgbs.append(np.asarray(rgb).reshape(H, W, 3))
    rgbs = np.stack(rgbs, 0)

    gt = rays_test.rgb[-H * W :].reshape(H, W, 3)
    mse = float(np.mean((rgbs[-1] - gt) ** 2))
    psnr = -10.0 * np.log10(mse)
    print(f"ground truth loss: {mse}, psnr: {psnr}")
    with open(os.path.join(savedir, "statistics.txt"), "w") as f:
        f.write(f"loss: {mse}, psnr: {psnr}")

    boom = np.concatenate([rgbs[:-1], rgbs[:-1][::-1]])
    save_gif(os.path.join(savedir, "video2.gif"), boom)
    print("Saved test set")


if __name__ == "__main__":
    main()

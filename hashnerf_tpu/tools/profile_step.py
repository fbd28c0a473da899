"""Decompose train-step wall time into its major components on the real TPU.

Usage: python -m hashnerf_tpu.tools.profile_step [--parity]

Times, each as a separately-jitted program (median of reps after warmup):
  fwd        render_rays forward only (coarse+fine, full losses skipped)
  loss_grad  value_and_grad of the full loss (no optimizer)
  opt        optimizer update alone (grads precomputed)
  step       the full fused train step (grad + update)
  encode_fwd hash encode forward alone on the fine-pass point count
  encode_bwd hash encode VJP backward alone (sort + prefix-sum accumulate)
  scan48     48 scanned steps in one dispatch (per-step amortized)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # axon workaround: force a host fetch of one scalar
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.config import config_parser
    from hashnerf_tpu.train.driver import Trainer, make_loss_fn

    parity = "--parity" in sys.argv

    args = config_parser().parse_args([])
    args.N_rand = 1024
    args.N_samples = 64
    args.N_importance = 128
    args.finest_res = 512
    args.log2_hashmap_size = 19
    args.lrate = 0.01
    args.lrate_decay = 10
    args.use_viewdirs = True
    args.white_bkgd = True
    args.no_batching = True
    if not parity:
        args.n_levels = 8
        args.n_features_per_level = 4
        args.share_fine = True
        args.compute_dtype = "bfloat16"
        args.use_occupancy = True
        args.occ_keep_fraction = 0.25
        args.occ_warmup = 8

    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)
    trainer = Trainer(args, scene)
    trainer.global_step = 1001  # steady state: TV off

    batch = trainer.sample_image(0, args.N_rand, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)

    # Occupancy grid: populate + mark ready like bench does
    occ_grid = None
    if trainer.render_cfg.occupancy is not None:
        m = trainer.run_steps(32, block_size=16)
        float(m["loss"])
        trainer._occ_ready = True
        occ_grid = trainer.occ_grid

    from hashnerf_tpu.render.renderer import render_rays

    cfg = trainer.render_cfg
    qf = trainer.query_fn
    bbox = trainer.bbox

    @jax.jit
    def fwd(state, batch, key, occ):
        return render_rays(
            state, qf, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
            batch["near"], batch["far"], bbox, key, cfg, occ_grid=occ,
        )["rgb_map"]

    print("fwd        %8.2f ms" % (1e3 * timeit(fwd, trainer.state, batch, key, occ_grid)))

    loss_fn = make_loss_fn(args, cfg, qf, bbox, trainer.model_cfg.hash_grid, with_tv=False)

    @jax.jit
    def loss_grad(state, batch, key, occ):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state, batch, key, jnp.float32(0.0), occ
        )
        return l, g

    print("loss_grad  %8.2f ms" % (1e3 * timeit(loss_grad, trainer.state, batch, key, occ_grid)))
    _, grads = loss_grad(trainer.state, batch, key, occ_grid)

    opt = trainer.optimizer

    @jax.jit
    def opt_step(state, opt_state, grads):
        import optax
        updates, opt_state = opt.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state

    print("opt        %8.2f ms" % (1e3 * timeit(opt_step, trainer.state, trainer.opt_state, grads)))

    step_fn = trainer._train_step_no_tv
    print("step       %8.2f ms" % (1e3 * timeit(
        lambda: step_fn(trainer.state, trainer.opt_state, batch, key, jnp.float32(0.0), occ_grid)
    )))

    # encode fwd/bwd alone on the fine-pass (possibly culled) point count
    n_pts = args.N_rand * (args.N_samples + args.N_importance)
    if occ_grid is not None:
        n_pts = -(-int(n_pts * args.occ_keep_fraction) // 128) * 128
    pts = jax.random.uniform(key, (n_pts, 3), minval=-1.2, maxval=1.2)
    hcfg = trainer.model_cfg.hash_grid
    from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast

    @jax.jit
    def enc_fwd(table, pts):
        return hash_encode_fast(table, pts, bbox[0], bbox[1], hcfg)[0]

    print("encode_fwd %8.2f ms (n=%d)" % (1e3 * timeit(enc_fwd, trainer.state.hash_table, pts), n_pts))

    @jax.jit
    def enc_bwd(table, pts):
        f = lambda t: hash_encode_fast(t, pts, bbox[0], bbox[1], hcfg)[0].sum()
        return jax.grad(f)(table)

    print("encode_bwd %8.2f ms" % (1e3 * timeit(enc_bwd, trainer.state.hash_table, pts)))

    # scanned block amortization (one warmup block compiles the program)
    m = trainer.run_steps(48, block_size=48)
    float(m["loss"])
    t0 = time.perf_counter()
    m = trainer.run_steps(96, block_size=48)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print("scan48     %8.2f ms/step (96 steps)" % (1e3 * dt / 96))


if __name__ == "__main__":
    main()

"""Staged TPU bring-up diagnostic for the bench path.

Runs progressively larger pieces of the benchmark workload in ONE process,
printing a timing line after each stage (flushed immediately), so a crash or
hang at stage N still leaves stages 1..N-1 on record. Used to bisect the
round-1 BENCH crash ("TPU worker process crashed", bench.py:89).

Usage:  python -m hashnerf_tpu.tools.tpu_diag [stage...]
  default stages: latency single scan4 scan32occ
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[diag +{time.time() - T0:8.1f}s] {msg}", flush=True)


T0 = time.time()


def main(stages):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    if "latency" in stages:
        @jax.jit
        def f(x):
            return (x @ x).sum()

        x = jnp.ones((1024, 1024))
        t = time.time()
        v = float(f(x))
        log(f"matmul compile+run: {time.time()-t:.2f}s")
        for i in range(3):
            t = time.time()
            v = float(f(x))
            log(f"matmul dispatch {i}: {time.time()-t:.2f}s")

    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.config import config_parser
    from hashnerf_tpu.train.driver import Trainer

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
    args.n_levels = 8
    args.n_features_per_level = 4
    args.share_fine = True
    args.compute_dtype = "bfloat16"
    if "noocc" not in stages:
        args.use_occupancy = True
        args.occ_keep_fraction = 0.25
        args.occ_warmup = 8

    t = time.time()
    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)
    trainer = Trainer(args, scene)
    trainer.global_step = 1001
    log(f"trainer built: {time.time()-t:.2f}s")

    if "single" in stages:
        batch = trainer._host_sample(False)
        t = time.time()
        m = trainer.step(batch)
        v = float(m["loss"])
        log(f"single step compile+run: {time.time()-t:.2f}s loss={v:.4f}")
        t = time.time()
        batch = trainer._host_sample(False)
        m = trainer.step(batch)
        v = float(m["loss"])
        log(f"single step dispatch: {time.time()-t:.2f}s")

    for name in stages:
        if not name.startswith("scan"):
            continue
        spec = name[4:]
        occ = spec.endswith("occ")
        n = int(spec[:-3] if occ else spec)
        if occ and trainer.render_cfg.occupancy is None:
            log(f"skip {name}: occupancy off")
            continue
        t = time.time()
        m = trainer.run_steps(n, block_size=n)
        v = float(m["loss"])
        log(f"{name} block compile+run: {time.time()-t:.2f}s loss={v:.4f}")
        t = time.time()
        m = trainer.run_steps(n, block_size=n)
        v = float(m["loss"])
        dt = time.time() - t
        log(f"{name} block dispatch: {dt:.2f}s = {n*args.N_rand/dt:.0f} rays/s")

    log("ALL STAGES DONE")


if __name__ == "__main__":
    main(sys.argv[1:] or ["latency", "single", "scan4", "scan32occ"])

"""Multi-chip scaling benchmark: rays/s at 1..N devices on a ('data',) mesh.

BASELINE.json's north star asks for rays/s scaling efficiency measured at
1 chip / 1 host / N hosts. On real multi-chip slices this harness measures
true ICI scaling; on a single-chip or CPU environment it exercises the exact
same sharded program over virtual devices (correctness + compile validation;
virtual-device timings are NOT hardware scaling numbers and are labeled so).

Usage:
  python -m hashnerf_tpu.tools.bench_scaling [--devices 1 2 4 8] [--n_rand 4096]
"""
from __future__ import annotations

import argparse
import json
import time


def measure(n_devices_list, n_rand=4096, n_iters=10, n_samples=64, n_importance=128):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.config import config_parser
    from hashnerf_tpu.train.driver import Trainer, make_loss_fn
    from hashnerf_tpu.parallel.train_sharded import (
        make_sharded_train_step,
        shard_train_batch,
    )

    args = config_parser().parse_args([])
    args.N_rand = n_rand
    args.N_samples = n_samples
    args.N_importance = n_importance
    args.finest_res = 512
    args.log2_hashmap_size = 19
    args.use_viewdirs = True
    args.white_bkgd = True

    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)
    trainer = Trainer(args, scene)
    loss_fn = make_loss_fn(
        args, trainer.render_cfg, trainer.query_fn, trainer.bbox,
        trainer.model_cfg.hash_grid, with_tv=False,
    )

    devices = jax.devices()
    results = []
    base_rate = None
    for nd in n_devices_list:
        if nd > len(devices):
            print(f"# skipping {nd} devices (only {len(devices)} available)")
            continue
        mesh = Mesh(np.array(devices[:nd]), axis_names=("data",))
        step_builder = make_sharded_train_step(mesh, loss_fn, trainer.optimizer)

        batch = trainer.sample_image(0, n_rand, precrop=False)
        d = batch["rays_d"]
        batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        batch = shard_train_batch(mesh, batch)
        step = step_builder(trainer.state, trainer.opt_state, batch)

        key = jax.random.PRNGKey(0)
        out = step(trainer.state, trainer.opt_state, batch, key, jnp.float32(0.0))
        float(out[2]["loss"])  # force

        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = step(trainer.state, trainer.opt_state, batch, key, jnp.float32(0.0))
        float(out[2]["loss"])
        dt = (time.perf_counter() - t0) / n_iters
        rate = n_rand / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd / n_devices_list[0])
        results.append(
            {
                "devices": nd,
                "platform": devices[0].platform,
                "rays_per_s": round(rate, 1),
                "scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--n_rand", type=int, default=4096)
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()
    measure(a.devices, a.n_rand, a.iters)

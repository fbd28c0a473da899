#!/usr/bin/env python
"""Benchmark: training-step rays/s on the canonical chair-like config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published number — a GTX 1050Ti takes ~10 min for
5k iterations at N_rand=1024 (README.md:13, configs/chair.txt) ≈ 8.3 it/s ≈
8533 rays/s. vs_baseline = our rays/s / 8533.

Measurement shape: the TPU here sits behind a tunnel with ~3-4 s of
PER-DISPATCH round-trip latency (measured: one pre-compiled 1024^2 matmul
costs ~2.8 s wall), so throughput only exists inside scanned blocks — K full
optimizer steps per XLA dispatch (lax.scan, on-device ray sampling). The
bench times ONE big block dispatch; latency is amortized over BENCH_BLOCK
steps and is INCLUDED in the reported number (it is real wall time a user
pays). A persistent compilation cache (.cache/jax) makes reruns skip the
~1-4 min XLA compile.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_RAYS_PER_S = 5000 * 1024 / 600.0  # 1050Ti reference ≈ 8533 rays/s


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.config import config_parser
    from hashnerf_tpu.train.driver import Trainer

    # Canonical chair hyperparams (reference configs/chair.txt + README.md:20):
    # N_rand=1024, 64 coarse + 128 fine samples, finest_res 512, log2T 19.
    args = config_parser().parse_args([])
    args.N_rand = int(os.environ.get("BENCH_N_RAND", "1024"))
    args.N_samples = 64
    args.N_importance = 128
    args.finest_res = 512
    args.log2_hashmap_size = 19
    args.lrate = 0.01
    args.lrate_decay = 10
    args.use_viewdirs = True
    args.white_bkgd = True
    args.no_batching = True

    # Default = the flagship TPU execution config (same canonical workload:
    # identical ray count, sample counts, table capacity, and 32-dim encoding;
    # TPU-native execution: L8/F4 table halves the gather count, shared
    # coarse/fine network, bf16 MLP compute, Instant-NGP occupancy culling).
    # BENCH_PARITY=1 measures the reference-exact execution path instead.
    if not os.environ.get("BENCH_PARITY"):
        args.n_levels = 8
        args.n_features_per_level = 4
        args.share_fine = True
        args.compute_dtype = "bfloat16"
        args.use_occupancy = True
        args.occ_keep_fraction = float(os.environ.get("BENCH_KEEP", "0.25"))
        args.occ_warmup = 8
    if os.environ.get("BENCH_BF16"):
        args.compute_dtype = "bfloat16"

    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)
    trainer = Trainer(args, scene)

    # Steady state: the reference hard-disables the TV regularizer after iter
    # 1000 (run_nerf.py:637-638), so 98% of training runs the TV-free step;
    # time that variant.
    # NOTE: block_until_ready does not reliably synchronize on the axon
    # backend — force a host fetch (float()) to close each timing region.
    trainer.global_step = 1001
    if trainer.render_cfg.occupancy is not None:
        # Populate the occupancy grid (one update-mode block dispatch), then
        # force readiness: throughput depends only on the static keep budget,
        # not grid contents.
        m = trainer.run_steps(32, block_size=32)
        float(m["loss"])
        trainer._occ_ready = True

    # One warmup dispatch of the SAME block program (scan length is static —
    # a different warmup length would compile a second program for nothing).
    B = int(os.environ.get("BENCH_BLOCK", "256"))
    m = trainer.run_steps(B, block_size=B)
    float(m["loss"])

    n_iters = int(os.environ.get("BENCH_ITERS", str(B)))
    t0 = time.perf_counter()
    m = trainer.run_steps(n_iters, block_size=B)
    float(m["loss"])
    dt = time.perf_counter() - t0

    rays_per_s = n_iters * args.N_rand / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_s",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

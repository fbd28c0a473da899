"""Second TPU eval round: flagship-candidate variants + quality curves.

One attach: (a) amortized step rate for the kitchen-sink config with the
compare-count sample_pdf and with L4/F8 stacked on, (b) PSNR-vs-iters
quality curves for the flagship candidate vs the round-1 tpu-fast config.

Usage: python -m hashnerf_tpu.tools.tpu_eval2
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[e2 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hashnerf_tpu.tools.tpu_fwd_profile import bench_args
    from hashnerf_tpu.data.synthetic import make_synthetic_scene

    log(f"devices: {jax.devices()}")
    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)

    def measure(tag, **over):
        from hashnerf_tpu.train.driver import Trainer

        args = bench_args(**over)
        tr = Trainer(args, scene)
        tr.global_step = 1001
        m = tr.run_steps(32, block_size=32)
        float(m["loss"])
        tr._occ_ready = True
        B = 96
        m = tr.run_steps(B, block_size=B)
        float(m["loss"])
        t = time.perf_counter()
        m = tr.run_steps(B, block_size=B)
        float(m["loss"])
        dt = time.perf_counter() - t
        log(f"variant {tag:30s}: {dt/B*1e3:7.1f} ms/step = {B*args.N_rand/dt:8.0f} rays/s")

    measure("ks+spdf (.125/aabb/4096)", occ_keep_fraction=0.125,
            aabb_clip=True, N_rand=4096)
    measure("ks+spdf+L4F8", occ_keep_fraction=0.125, aabb_clip=True,
            N_rand=4096, n_levels=4, n_features_per_level=8)
    measure("ks+spdf 1024", occ_keep_fraction=0.125, aabb_clip=True)

    import bench_quality

    for tag, env in [
        ("flagship", {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "4096",
                      "QB_ITERS": "1536", "QB_BLOCK": "128"}),
        ("r1fast", {"QB_KEEP": "0.25", "QB_AABB": "0", "QB_NRAND": "1024",
                    "QB_ITERS": "1536", "QB_BLOCK": "128"}),
        ("flagL4F8", {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "4096",
                      "QB_L": "4", "QB_F": "8", "QB_ITERS": "1536",
                      "QB_BLOCK": "128"}),
    ]:
        for k in ("QB_KEEP", "QB_AABB", "QB_NRAND", "QB_ITERS", "QB_BLOCK",
                  "QB_L", "QB_F", "QB_TAG"):
            os.environ.pop(k, None)
        os.environ.update(env)
        os.environ["QB_TAG"] = tag
        log(f"--- quality {tag} ---")
        try:
            bench_quality.main()
        except Exception:
            import traceback

            traceback.print_exc()
    log("DONE")


if __name__ == "__main__":
    main()

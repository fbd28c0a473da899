"""Final round-2 TPU validation: quality of the bench-default config + CLI smoke.

(a) PSNR curve for the shipped bench defaults (keep=0.25, aabb, N_rand=4096)
    — compared per-RAY against the validated r1fast curve (28.3 dB after
    1.57M rays) to confirm the larger batch doesn't cost convergence;
(b) the verify-skill CLI smoke: run_nerf.py --config configs/synthetic_smoke.txt.

Usage: python -m hashnerf_tpu.tools.tpu_eval4
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)

    import bench_quality

    os.environ.update(
        QB_TAG="safe4096", QB_KEEP="0.25", QB_AABB="1", QB_NRAND="4096",
        QB_ITERS="768", QB_BLOCK="128",
    )
    print(f"--- quality safe4096 (t+{time.time()-t0:.0f}s) ---", flush=True)
    try:
        bench_quality.main()
    except Exception:
        import traceback

        traceback.print_exc()

    print(f"--- CLI smoke (t+{time.time()-t0:.0f}s) ---", flush=True)
    import run_nerf

    run_nerf.main(["--config", "configs/synthetic_smoke.txt", "--no_reload"])
    print(f"=== DONE (t+{time.time()-t0:.0f}s) ===", flush=True)


if __name__ == "__main__":
    main()

"""One-attach TPU evaluation: profile_step + bench + bench_quality.

Each fresh process pays a 6-15 min TPU attach in this environment, so run
all three evaluations in ONE process. Results print as they come (flushed);
bench writes its JSON line, bench_quality writes BENCH_QUALITY.json.

Usage: python -m hashnerf_tpu.tools.tpu_eval_all [profile] [bench] [quality]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main(stages):
    t0 = time.time()
    if "profile" in stages:
        print(f"=== profile_step (t+{time.time()-t0:.0f}s) ===", flush=True)
        from hashnerf_tpu.tools import profile_step

        try:
            profile_step.main()
        except Exception:
            import traceback

            traceback.print_exc()
    if "bench" in stages:
        print(f"=== bench (t+{time.time()-t0:.0f}s) ===", flush=True)
        import bench

        bench.main()
    if "quality" in stages:
        print(f"=== bench_quality (t+{time.time()-t0:.0f}s) ===", flush=True)
        import bench_quality

        bench_quality.main()
    print(f"=== ALL DONE (t+{time.time()-t0:.0f}s) ===", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["profile", "bench", "quality"])

#!/usr/bin/env python
"""Benchmark: training-step rays/s on the canonical chair-like config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published number — a GTX 1050Ti takes ~10 min for
5k iterations at N_rand=1024 (README.md:13, configs/chair.txt) ≈ 8.3 it/s ≈
8533 rays/s. vs_baseline = our rays/s / 8533.

Measurement shape: K full optimizer steps per XLA dispatch (lax.scan blocks
with on-device ray sampling — the TPU-native equivalent of the reference's
tight CUDA-stream loop). The number reported is the median of BENCH_REPS
timed block dispatches after one warmup dispatch of the same compiled
program; dispatch latency is included (it is real wall time a user pays).
A persistent compilation cache (.cache/jax) makes reruns skip the XLA
compile; a cold process additionally pays a one-off TPU-runtime attach that
is NOT timed (it happens during warmup).

Robustness: this script NEVER exits non-zero. If a block size fails
(compile/HBM/runtime), it degrades to smaller blocks and finally to
single-step dispatches, reporting whatever it measured plus a "note".

Env knobs: BENCH_BLOCK (256), BENCH_REPS (2), BENCH_N_RAND (1024),
BENCH_PARITY=1 for the reference-exact execution path.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_RAYS_PER_S = 5000 * 1024 / 600.0  # 1050Ti reference ≈ 8533 rays/s


def emit(rays_per_s: float, note: str = ""):
    out = {
        "metric": "train_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
    }
    if note:
        out["note"] = note
    print(json.dumps(out))


def build_trainer():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    # Default = the flagship TPU execution config: same per-ray work shape
    # (64+128 stratified samples, 2^19-row table, 32-dim encoding) with
    # TPU-native execution — L4/F8 packed table (quality-measured BETTER
    # than L8/F4 and L16/F2: BENCH_QUALITY_abl_L4F8 28.89 dB vs 28.34/25.85
    # at 1536 iters — and 1/4 the per-sample fetches of L16), shared
    # coarse/fine net, bf16 MLP compute, Instant-NGP occupancy culling +
    # ray-AABB sample tightening, and a TPU-sized ray batch (rays/s is the
    # metric; per-ray convergence at these settings is tracked by
    # bench_quality.py / BENCH_QUALITY*.json). BENCH_N_RAND=1024 measures at
    # the reference's exact batch; BENCH_PARITY=1 measures the
    # reference-exact execution path.
    if not os.environ.get("BENCH_PARITY"):
        args.n_levels = int(os.environ.get("BENCH_L", "4"))
        args.n_features_per_level = int(os.environ.get("BENCH_F", "8"))
        args.share_fine = True
        args.compute_dtype = "bfloat16"
        args.use_occupancy = True
        # Round-5 flagship budgets (block-8 GLOBAL culling, asymmetric):
        # coarse keeps 0.375 (it drives the fine PDF; its encode is ~1/3 of
        # fine's — r5 measured +0.9 dB over coarse 0.25 for ~+0.4 ms), fine
        # runs the annealed schedule's steady-state 0.125. Quality at these
        # exact steady flags: BENCH_QUALITY_r5_c375late (28.88 dB @1536 at
        # 11.2 ms/step; anneal 0.5 -> 0.25@512 -> 0.125@1024).
        args.occ_keep_fraction = float(os.environ.get("BENCH_KEEP", "0.125"))
        args.occ_warmup = 8
        args.aabb_clip = True
        # round-4 execution knobs (defaults = the measured-best set; the
        # PROFILE_r04.md ledger showed fast_merge is a net LOSS — the
        # order-statistics draw + rank merge cost 1.7 ms vs 0.84 ms for the
        # plain batched sort — so it defaults off):
        # per-ray keep budget (drops the global cull sort AND the un-permute
        # gather), importance-sampled grid updates.
        args.fast_merge = bool(int(os.environ.get("BENCH_FASTMERGE", "0")))
        args.occ_partition = os.environ.get("BENCH_PARTITION", "sort1")
        args.occ_per_ray = bool(int(os.environ.get("BENCH_PERRAY", "0")))
        args.occ_block = int(os.environ.get("BENCH_OCC_BLOCK", "8"))
        kc = float(os.environ.get("BENCH_KEEP_COARSE", "0.375"))
        if kc > 0:
            args.occ_keep_coarse = kc
        args.occ_per_ray_select = os.environ.get("BENCH_SELECT", "sort")
        args.occ_adaptive_update = bool(
            int(os.environ.get("BENCH_ADAPTIVE", "1"))
        )
        # strided dilated-grid scoring: MEASURED LOSS (87.1k vs 92.5k at
        # stride 2 — dilation overhead exceeds the fetch savings); default
        # off, kept as a committed negative result
        args.occ_score_stride = int(os.environ.get("BENCH_SCORE_STRIDE", "1"))
        # N_rand=1024: the REFERENCE's exact batch (honest vs_baseline), the
        # best measured per-iteration convergence (r1fast curve family), AND
        # the best measured rays/s under the packed layout (tpu_lab variants:
        # 33.3k at 1024 vs 31.0k at 4096 — sort/cull costs grow superlinearly
        # with batch).
        args.N_rand = int(os.environ.get("BENCH_N_RAND", "1024"))
        # Corner-packed table layout (ops/packed_grid.py): 1 row fetch per
        # (sample, level) instead of 8 — the round-3 forward-gather lever.
        # BENCH_PACKED=0 measures the round-2 per-corner hash layout.
        args.packed_layout = bool(int(os.environ.get("BENCH_PACKED", "1")))

    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)
    trainer = Trainer(args, scene)

    # Steady state: the reference hard-disables the TV regularizer after iter
    # 1000 (run_nerf.py:637-638), so 98% of training runs the TV-free step.
    # NOTE: block_until_ready does not reliably synchronize on the axon
    # backend — force a host fetch (float()) to close each timing region.
    trainer.global_step = 1001
    return trainer, args


def measure_block(trainer, args, block: int, reps: int) -> float:
    """Median rays/s over `reps` timed dispatches of one compiled B-step
    block (after one untimed warmup dispatch of the same program)."""
    m = trainer.run_steps(block, block_size=block)
    float(m["loss"])  # warmup + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        m = trainer.run_steps(block, block_size=block)
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    return block * args.N_rand / dt


def main():
    trainer, args = build_trainer()

    if trainer.render_cfg.occupancy is not None:
        try:
            # Populate the occupancy grid (one update-mode block dispatch),
            # then force readiness: throughput depends only on the static
            # keep budget, not grid contents.
            m = trainer.run_steps(32, block_size=32)
            float(m["loss"])
            trainer._occ_ready = True
        except Exception:
            traceback.print_exc()
            print("# occupancy populate failed; continuing without culling",
                  file=sys.stderr)
            import dataclasses

            trainer.render_cfg = dataclasses.replace(
                trainer.render_cfg, occupancy=None
            )
            trainer._block_cache = {}

    reps = int(os.environ.get("BENCH_REPS", "2"))
    note = ""
    # Single dispatches must stay under the TPU runtime's execution watchdog
    # (~1-2 min kills the worker — the round-1 crash): the parity path runs
    # ~10-20x more device work per step, and larger ray batches scale step
    # time linearly, so default blocks shrink accordingly.
    if os.environ.get("BENCH_PARITY"):
        default_block = "16"
    elif args.N_rand >= 2048:
        default_block = "128"
    else:
        default_block = "256"
    for block in (int(os.environ.get("BENCH_BLOCK", default_block)), 64, 16, 4):
        try:
            emit(measure_block(trainer, args, block, reps), note)
            return
        except Exception:
            traceback.print_exc()
            note = f"degraded: block {block} failed"
            print(f"# {note}; retrying smaller", file=sys.stderr)

    # last resort: single-step dispatches
    batch = trainer._host_sample(False)
    m = trainer.step(batch)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        m = trainer.step(trainer._host_sample(False))
    float(m["loss"])
    emit(n * args.N_rand / (time.perf_counter() - t0), note + "; single-step mode")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        emit(0.0, "bench failed entirely; see stderr")
    sys.exit(0)

"""Forward-pass decomposition + config-variant sweep on the real TPU.

The round-2 bench sits at ~106 ms/step amortized with the forward dominating
(PROFILE_r02.txt). This tool (a) times each forward component at true shapes,
(b) measures amortized steps/s for candidate execution variants (tighter
culling budget, AABB-clipped sampling, larger ray batches, L4/F8 tables) to
pick the next flagship config. ~20 ms dispatch floor applies to (a) probes;
(b) numbers are scan-amortized and real.

Usage: python -m hashnerf_tpu.tools.tpu_fwd_profile [probes] [variants]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[fp +{time.time() - T0:7.1f}s] {msg}", flush=True)


def timeit(fn, *args, reps=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def bench_args(**over):
    from hashnerf_tpu.train.config import config_parser

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
    args.use_occupancy = True
    args.occ_keep_fraction = 0.25
    args.occ_warmup = 8
    for k, v in over.items():
        setattr(args, k, v)
    return args


def probes():
    import jax
    import jax.numpy as jnp
    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.driver import Trainer

    args = bench_args()
    scene = make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)
    tr = Trainer(args, scene)
    tr.global_step = 1001
    m = tr.run_steps(32, block_size=32)
    float(m["loss"])
    tr._occ_ready = True

    key = jax.random.PRNGKey(0)
    N = 1024 * 192  # fine-pass points
    K = 49152  # culled
    pts = jax.random.uniform(key, (N, 3), minval=-1.4, maxval=1.4)
    kpts = pts[:K]

    from hashnerf_tpu.render.occupancy import occupancy_scores, cull_points
    from hashnerf_tpu.kernels.gather_vjp import take_rows
    from hashnerf_tpu.ops.sh_encoding import sh_encode
    from hashnerf_tpu.ops.volume import raw2outputs
    from hashnerf_tpu.ops.sampling import sample_pdf

    occ_cfg = tr.render_cfg.occupancy
    grid = tr.occ_grid
    bbox = tr.bbox

    f = jax.jit(lambda g, p: occupancy_scores(g, p, bbox, occ_cfg))
    log(f"occ scores 196k:      {timeit(f, grid, pts):7.1f} ms")
    scores = f(grid, pts)
    f = jax.jit(lambda s: cull_points(s, K))
    log(f"cull argsort+inv:     {timeit(f, scores):7.1f} ms")
    f = jax.jit(lambda s: jax.lax.top_k(s, K))
    log(f"top_k only:           {timeit(f, scores):7.1f} ms")

    f = jax.jit(lambda p: sh_encode(p, 4))
    d = jax.random.normal(key, (K, 3))
    log(f"sh_encode 49k:        {timeit(f, d):7.1f} ms")

    raw = jax.random.normal(key, (1024, 192, 4))
    z = jnp.sort(jax.random.uniform(key, (1024, 192), minval=2, maxval=6), -1)
    rd = jax.random.normal(key, (1024, 3))
    f = jax.jit(lambda r, z, d: raw2outputs(r, z, d, 0.0, True).rgb_map)
    log(f"raw2outputs 1024x192: {timeit(f, raw, z, rd):7.1f} ms")
    g = jax.jit(jax.grad(lambda r: raw2outputs(r, z, rd, 0.0, True).rgb_map.sum()))
    log(f"raw2outputs bwd:      {timeit(g, raw):7.1f} ms")

    bins = jnp.sort(jax.random.uniform(key, (1024, 63), minval=2, maxval=6), -1)
    w = jax.random.uniform(key, (1024, 62))
    f = jax.jit(lambda b, w: sample_pdf(key, b, w, 128))
    log(f"sample_pdf 1024x128:  {timeit(f, bins, w):7.1f} ms")

    f = jax.jit(lambda z: jnp.sort(z, axis=-1))
    log(f"z-sort 1024x192:      {timeit(f, z):7.1f} ms")

    rawk = jax.random.normal(key, (N, 4))
    inv = jax.random.permutation(key, N)
    f = jax.jit(lambda r, i: take_rows(r, i))
    log(f"take_rows 196k fwd:   {timeit(f, rawk, inv):7.1f} ms")
    g = jax.jit(jax.grad(lambda r: take_rows(r, inv).sum()))
    log(f"take_rows 196k bwd:   {timeit(g, rawk):7.1f} ms")

    # full culled fine query (everything between raw2outputs calls)
    from hashnerf_tpu.render.occupancy import query_with_culling

    dirs = jax.random.normal(key, (1024, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    p3 = pts.reshape(1024, 192, 3)
    f = jax.jit(
        lambda st, p, d, g: query_with_culling(
            tr.query_fn, st, p, d, bbox, g, occ_cfg, K, fine=True
        ).sum()
    )
    log(f"query_with_culling:   {timeit(f, tr.state, p3, dirs, grid):7.1f} ms")


def variants():
    import jax
    from hashnerf_tpu.data.synthetic import make_synthetic_scene

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
        log(f"variant {tag:28s}: {dt/B*1e3:7.1f} ms/step = {B*args.N_rand/dt:8.0f} rays/s")

    measure("baseline keep=0.25")
    measure("aabb_clip", aabb_clip=True)
    measure("keep=0.125 + aabb", occ_keep_fraction=0.125, aabb_clip=True)
    measure("L4/F8 + aabb", n_levels=4, n_features_per_level=8, aabb_clip=True)
    measure("N_rand=4096 + aabb", N_rand=4096, aabb_clip=True)
    measure(
        "kitchen sink",
        occ_keep_fraction=0.125, aabb_clip=True, N_rand=4096,
    )


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    stages = sys.argv[1:] or ["probes", "variants"]
    log(f"devices: {jax.devices()}")
    if "probes" in stages:
        probes()
    if "variants" in stages:
        variants()
    log("DONE")

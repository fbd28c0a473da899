"""TPU measurement lab — ONE parameterized harness for all on-chip work.

Replaces the round-1/2 scratch drivers (tpu_diag, tpu_microbench[2],
tpu_fwd_profile, tpu_eval2/4, tpu_eval_all) whose committed artifacts live in
PROFILE_r02.txt / FWDPROFILE_r02.txt / BENCH_QUALITY_*.json. Each fresh
process pays a 6-15 min TPU attach in this environment, so chain any number
of stages in one invocation; every line is flushed immediately.

Usage:
    python -m hashnerf_tpu.tools.tpu_lab STAGE [STAGE...]

Stages:
    diag            staged bring-up: dispatch latency, single step, scan blocks
    micro           primitive microbench (sort/gather/segment-accumulate/
                    scatter/top_k/MLP/RAdam) + packed-vs-hash encode probes
    probes          forward-pass decomposition at true shapes
    variants        amortized rays/s for flagship config variants
    variants4       round-4 lever A/B (partition modes, fast_merge,
                    adaptive updates, keep=0.125)
    ledger          roofline ledger (PROFILE_r05.md): scan-amortized phase
                    times vs measured primitive ceilings
    bench           repo-root bench.py (writes the JSON line)
    quality:TAG     PSNR curve; TAG in QUALITY_CONFIGS below
                    (e.g. quality:safe4096 quality:parity768 quality:packed4096)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[lab +{time.time() - T0:7.1f}s] {msg}", flush=True)


def timeit(fn, *args, reps=3):
    """Median of `reps` timed calls after one warmup; closes each timing
    region with a host fetch (block_until_ready does not sync on axon)."""
    import jax
    import jax.numpy as jnp

    def sync(out):
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # ms


def bench_args(**over):
    """The flagship bench config (mirrors bench.py defaults)."""
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
    args.n_levels = 4
    args.n_features_per_level = 8
    args.share_fine = True
    args.compute_dtype = "bfloat16"
    args.use_occupancy = True
    args.occ_keep_fraction = 0.25
    args.occ_warmup = 8
    for k, v in over.items():
        setattr(args, k, v)
    return args


def _scene():
    from hashnerf_tpu.data.synthetic import make_synthetic_scene

    return make_synthetic_scene(H=128, W=128, n_train=8, n_test=2)


# --------------------------------------------------------------------------- #
def stage_diag():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((1024, 1024))
    t = time.time()
    float(f(x))
    log(f"matmul compile+run: {time.time() - t:.2f}s")
    for i in range(3):
        t = time.time()
        float(f(x))
        log(f"matmul dispatch {i}: {time.time() - t:.2f}s")

    from hashnerf_tpu.train.driver import Trainer

    tr = Trainer(bench_args(), _scene())
    tr.global_step = 1001
    batch = tr._host_sample(False)
    t = time.time()
    float(tr.step(batch)["loss"])
    log(f"single step compile+run: {time.time() - t:.2f}s")
    t = time.time()
    float(tr.step(tr._host_sample(False))["loss"])
    log(f"single step dispatch: {time.time() - t:.2f}s")
    for n in (4, 32):
        t = time.time()
        float(tr.run_steps(n, block_size=n)["loss"])
        log(f"scan{n} compile+run: {time.time() - t:.2f}s")
        t = time.time()
        float(tr.run_steps(n, block_size=n)["loss"])
        dt = time.time() - t
        log(f"scan{n} dispatch: {dt:.2f}s = {n * tr.args.N_rand / dt:.0f} rays/s")


# --------------------------------------------------------------------------- #
def stage_micro():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    N = 1024 * 192
    L, F, T = 8, 4, 1 << 19
    M = L * N * 8  # per-corner backward elements (12.6M)

    idx = jax.random.randint(key, (M,), 0, L * T, dtype=jnp.int32)
    vals = jax.random.normal(key, (M, F), dtype=jnp.float32)

    f = jax.jit(lambda i: jax.lax.sort((i, jnp.arange(M, dtype=jnp.int32)), num_keys=1))
    log(f"sort (idx,iota) M={M/1e6:.1f}M:   {timeit(f, idx):8.1f} ms")

    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    f = jax.jit(lambda i, v: _sorted_segment_accumulate_tpu(i, v, num_rows=L * T))
    log(f"segment_accumulate M={M/1e6:.1f}M: {timeit(f, idx, vals):8.1f} ms")

    # packed-layout backward shape: M/8 elements, wide rows
    Mp = M // 8
    for W, rows, tag in ((32, 470_000, "dense8F"), (108, 1 << 18, "fine27F")):
        ip = jax.random.randint(key, (Mp,), 0, rows, dtype=jnp.int32)
        vp = jax.random.normal(key, (Mp, W), dtype=jnp.float32)
        f = jax.jit(lambda i, v: _sorted_segment_accumulate_tpu(i, v, num_rows=rows))
        log(f"segment_accum packed {tag} M={Mp/1e6:.1f}M W={W}: {timeit(f, ip, vp):8.1f} ms")

    # gather fetch-rate vs row width (fixed fetch count)
    Ng = 3_145_728
    for Tg, W in [(1 << 19, 4), (1 << 16, 32), (1 << 16, 108)]:
        tbl = jax.random.normal(key, (Tg, W), jnp.float32)
        ig = jax.random.randint(key, (Ng,), 0, Tg, jnp.int32)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, tbl, ig)
        log(f"gather {Ng/1e6:.1f}M rows from ({Tg},{W}): {dt:7.1f} ms ({dt/Ng*1e6:5.1f} ns/row)")

    # occupancy culling primitives
    scores = jax.random.normal(key, (N,), dtype=jnp.float32)
    f = jax.jit(lambda s: jnp.argsort(-s, stable=True))
    log(f"argsort {N/1e3:.0f}k:             {timeit(f, scores):8.1f} ms")
    f = jax.jit(lambda s: jax.lax.top_k(s, 49152))
    log(f"top_k 49k of {N/1e3:.0f}k:        {timeit(f, scores):8.1f} ms")

    # hash vs packed encode at culled + full scale
    from hashnerf_tpu.ops.hash_encoding import HashGridConfig
    from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast
    from hashnerf_tpu.ops.packed_grid import (
        PackedGridConfig, init_packed_tables, packed_encode,
    )

    hcfg = HashGridConfig(n_levels=L, n_features_per_level=F,
                          log2_hashmap_size=19, finest_resolution=512)
    pcfg = PackedGridConfig(n_levels=L, n_features_per_level=F,
                            log2_hashmap_size=19, finest_resolution=512,
                            log2_blocks=16)
    table = jax.random.normal(key, (L, T, F), dtype=jnp.float32) * 1e-4
    ptables = init_packed_tables(key, pcfg)
    bmin = jnp.array([-1.5, -1.5, -1.5])
    bmax = jnp.array([1.5, 1.5, 1.5])
    for n_pts in (49152, N):
        pts = jax.random.uniform(key, (n_pts, 3), minval=-1.4, maxval=1.4)
        f = jax.jit(lambda t, p: hash_encode_fast(t, p, bmin, bmax, hcfg)[0])
        log(f"hash   fwd n={n_pts/1e3:6.0f}k:     {timeit(f, table, pts):8.1f} ms")
        g = jax.jit(jax.grad(lambda t, p: hash_encode_fast(t, p, bmin, bmax, hcfg)[0].sum()))
        log(f"hash   fwd+bwd n={n_pts/1e3:6.0f}k: {timeit(g, table, pts):8.1f} ms")
        f = jax.jit(lambda t, p: packed_encode(t, p, bmin, bmax, pcfg)[0])
        log(f"packed fwd n={n_pts/1e3:6.0f}k:     {timeit(f, ptables, pts):8.1f} ms")
        g = jax.jit(jax.grad(lambda t, p: jnp.sum(packed_encode(t, p, bmin, bmax, pcfg)[0])))
        log(f"packed fwd+bwd n={n_pts/1e3:6.0f}k: {timeit(g, ptables, pts):8.1f} ms")

    # MLP + optimizer floor
    from hashnerf_tpu.models.nerf import NeRFSmallConfig, init_nerf_small, apply_nerf_small

    mcfg = NeRFSmallConfig(input_ch=L * F, input_ch_views=16)
    params = init_nerf_small(key, mcfg)
    x = jax.random.normal(key, (N, L * F + 16), dtype=jnp.float32)
    g = jax.jit(jax.grad(lambda p, x: apply_nerf_small(p, x, mcfg, jnp.bfloat16).sum()))
    log(f"mlp fwd+bwd {N/1e3:.0f}k bf16:    {timeit(g, params, x):8.1f} ms")


# --------------------------------------------------------------------------- #
def stage_probes():
    import jax
    import jax.numpy as jnp

    from hashnerf_tpu.train.driver import Trainer

    args = bench_args()
    tr = Trainer(args, _scene())
    tr.global_step = 1001
    float(tr.run_steps(32, block_size=32)["loss"])
    tr._occ_ready = True

    key = jax.random.PRNGKey(0)
    N = 1024 * 192
    K = 49152
    pts = jax.random.uniform(key, (N, 3), minval=-1.4, maxval=1.4)

    from hashnerf_tpu.render.occupancy import (
        occupancy_scores, cull_points, query_with_culling,
    )
    from hashnerf_tpu.ops.sampling import sample_pdf
    from hashnerf_tpu.ops.volume import raw2outputs

    occ_cfg = tr.render_cfg.occupancy
    grid, bbox = tr.occ_grid, tr.bbox

    f = jax.jit(lambda g, p: occupancy_scores(g, p, bbox, occ_cfg))
    log(f"occ scores 196k:      {timeit(f, grid, pts):7.1f} ms")
    scores = f(grid, pts)
    f = jax.jit(lambda s: cull_points(s, K))
    log(f"cull argsort+inv:     {timeit(f, scores):7.1f} ms")

    raw = jax.random.normal(key, (1024, 192, 4))
    z = jnp.sort(jax.random.uniform(key, (1024, 192), minval=2, maxval=6), -1)
    rd = jax.random.normal(key, (1024, 3))
    g = jax.jit(jax.grad(lambda r: raw2outputs(r, z, rd, 0.0, True).rgb_map.sum()))
    log(f"raw2outputs fwd+bwd:  {timeit(g, raw):7.1f} ms")

    bins = jnp.sort(jax.random.uniform(key, (1024, 63), minval=2, maxval=6), -1)
    w = jax.random.uniform(key, (1024, 62))
    f = jax.jit(lambda b, w: sample_pdf(key, b, w, 128))
    log(f"sample_pdf 1024x128:  {timeit(f, bins, w):7.1f} ms")
    f = jax.jit(lambda z: jnp.sort(z, axis=-1))
    log(f"z-sort 1024x192:      {timeit(f, z):7.1f} ms")

    dirs = jax.random.normal(key, (1024, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    p3 = pts.reshape(1024, 192, 3)
    f = jax.jit(
        lambda st, p, d, g: query_with_culling(
            tr.query_fn, st, p, d, bbox, g, occ_cfg, K, fine=True
        ).sum()
    )
    log(f"query_with_culling:   {timeit(f, tr.state, p3, dirs, grid):7.1f} ms")


# --------------------------------------------------------------------------- #
def stage_pprofile():
    """Decompose the PACKED flagship step (N_rand=4096) into components,
    each separately jitted at true shapes — the round-3 optimization map."""
    import jax
    import jax.numpy as jnp

    from hashnerf_tpu.train.driver import Trainer, make_loss_fn

    args = bench_args(aabb_clip=True, N_rand=4096, packed_layout=True)
    tr = Trainer(args, _scene())
    tr.global_step = 1001
    float(tr.run_steps(32, block_size=32)["loss"])
    tr._occ_ready = True
    occ_grid = tr.occ_grid
    cfg, qf, bbox = tr.render_cfg, tr.query_fn, tr.bbox

    batch = tr.sample_image(0, args.N_rand, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)

    from hashnerf_tpu.render.renderer import render_rays

    @jax.jit
    def fwd(state, batch, key, occ):
        return render_rays(
            state, qf, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
            batch["near"], batch["far"], bbox, key, cfg, occ_grid=occ,
        )["rgb_map"]

    log(f"fwd only:            {timeit(fwd, tr.state, batch, key, occ_grid):8.1f} ms")

    loss_fn = make_loss_fn(args, cfg, qf, bbox, tr.model_cfg.hash_grid, with_tv=False)

    @jax.jit
    def loss_grad(state, batch, key, occ):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state, batch, key, jnp.float32(0.0), occ
        )
        return l, g

    log(f"loss+grad:           {timeit(loss_grad, tr.state, batch, key, occ_grid):8.1f} ms")
    _, grads = loss_grad(tr.state, batch, key, occ_grid)

    import optax

    opt = tr.optimizer

    @jax.jit
    def opt_step(state, opt_state, grads):
        updates, opt_state = opt.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state

    log(f"optimizer update:    {timeit(opt_step, tr.state, tr.opt_state, grads):8.1f} ms")

    # components at true shapes
    from hashnerf_tpu.render.occupancy import occupancy_scores, cull_points
    from hashnerf_tpu.kernels.gather_vjp import take_rows
    from hashnerf_tpu.ops.packed_grid import packed_encode
    from hashnerf_tpu.ops.sampling import sample_pdf

    R = args.N_rand
    occ_cfg = cfg.occupancy
    for S, tag in ((args.N_samples, "coarse"), (args.N_samples + args.N_importance, "fine")):
        n = R * S
        kf = occ_cfg.keep_fraction
        if tag == "coarse" and occ_cfg.keep_fraction_coarse is not None:
            kf = occ_cfg.keep_fraction_coarse
        k = min(n, -(-int(n * kf) // 128) * 128)
        pts = jax.random.uniform(key, (n, 3), minval=-1.4, maxval=1.4)
        f = jax.jit(lambda g, p: cull_points(occupancy_scores(g, p, bbox, occ_cfg), k))
        log(f"score+cull {tag} ({n/1e3:.0f}k): {timeit(f, occ_grid, pts):8.1f} ms")
        kpts = pts[:k]
        pcfg = tr.model_cfg.packed_grid
        f = jax.jit(lambda t, p: packed_encode(t, p, bbox[0], bbox[1], pcfg)[0])
        log(f"packed enc fwd {tag} ({k/1e3:.0f}k): {timeit(f, tr.state.hash_table, kpts):8.1f} ms")
        g = jax.jit(jax.grad(lambda t, p: jnp.sum(packed_encode(t, p, bbox[0], bbox[1], pcfg)[0])))
        log(f"packed enc f+b {tag} ({k/1e3:.0f}k): {timeit(g, tr.state.hash_table, kpts):8.1f} ms")
        raw_perm = jax.random.normal(key, (n, 4))
        inv = jax.random.permutation(key, n)
        gg = jax.jit(jax.grad(lambda r: take_rows(r, inv).sum()))
        log(f"unsort f+b {tag} ({n/1e3:.0f}k):   {timeit(gg, raw_perm):8.1f} ms")

    z = jnp.sort(jax.random.uniform(key, (R, 192), minval=2, maxval=6), -1)
    f = jax.jit(lambda z: jnp.sort(z, axis=-1))
    log(f"z-sort {R}x192:      {timeit(f, z):8.1f} ms")
    bins = jnp.sort(jax.random.uniform(key, (R, 63), minval=2, maxval=6), -1)
    w = jax.random.uniform(key, (R, 62))
    f = jax.jit(lambda b, w: sample_pdf(key, b, w, 128))
    log(f"sample_pdf {R}x128:  {timeit(f, bins, w):8.1f} ms")


def _measure_variant(scene, tag, **over):
    from hashnerf_tpu.train.driver import Trainer

    args = bench_args(**over)
    tr = Trainer(args, scene)
    tr.global_step = 1001
    float(tr.run_steps(32, block_size=32)["loss"])
    tr._occ_ready = True
    B = 96
    float(tr.run_steps(B, block_size=B)["loss"])
    t = time.perf_counter()
    float(tr.run_steps(B, block_size=B)["loss"])
    dt = time.perf_counter() - t
    log(f"variant {tag:36s}: {dt/B*1e3:7.1f} ms/step = {B*args.N_rand/dt:8.0f} rays/s")
    return B * args.N_rand / dt


def stage_variants():
    scene = _scene()

    def measure(tag, **over):
        _measure_variant(scene, tag, **over)

    measure("packed 1024 aabb (bench cfg)", aabb_clip=True, packed_layout=True)
    measure("packed 1024 L4F8 keep=.125", aabb_clip=True, packed_layout=True,
            n_levels=4, n_features_per_level=8, occ_keep_fraction=0.125)
    measure("packed 1024 keep=.5 noaabb", packed_layout=True,
            occ_keep_fraction=0.5)
    measure("packed keep=.25 aabb 4096", aabb_clip=True, N_rand=4096,
            packed_layout=True)


def stage_variants4():
    """Round-4 lever A/B at the L4/F8 flagship (VERDICT r3 #2): each knob
    isolated, then the full stack, then the stack at keep=0.125."""
    scene = _scene()
    base = dict(aabb_clip=True, packed_layout=True)

    def measure(tag, **over):
        _measure_variant(scene, tag, **base, **over)

    measure("r3 flagship (sort2, no merge)", occ_partition="sort2")
    measure("+ sort1 partition", occ_partition="sort1")
    measure("+ cumsum partition", occ_partition="cumsum")
    measure("+ fast_merge (sort1)", occ_partition="sort1", fast_merge=True)
    measure("+ adaptive update (sort1+fm)", occ_partition="sort1",
            fast_merge=True, occ_adaptive_update=True)
    measure("full stack keep=.25", occ_partition="cumsum", fast_merge=True,
            occ_adaptive_update=True)
    measure("full stack keep=.125", occ_partition="cumsum", fast_merge=True,
            occ_adaptive_update=True, occ_keep_fraction=0.125)
    measure("sort1+fm keep=.125", occ_partition="sort1", fast_merge=True,
            occ_adaptive_update=True, occ_keep_fraction=0.125)


def stage_perray():
    """Per-ray culling A/B (round-4 second wave, after the PROFILE_r04
    ledger showed the global path's sort + un-permute are the shaveable
    slack)."""
    scene = _scene()
    base = dict(aabb_clip=True, packed_layout=True, occ_adaptive_update=True)

    def measure(tag, **over):
        _measure_variant(scene, tag, **base, **over)

    measure("global keep=.25 (r3 path)")
    measure("per-ray keep=.25", occ_per_ray=True)
    measure("per-ray keep=.125", occ_per_ray=True, occ_keep_fraction=0.125)
    measure("per-ray keep=.125 2048", occ_per_ray=True,
            occ_keep_fraction=0.125, N_rand=2048)
    measure("per-ray keep=.25 2048", occ_per_ray=True, N_rand=2048)
    measure("per-ray keep=.125 4096", occ_per_ray=True,
            occ_keep_fraction=0.125, N_rand=4096)


def stage_perray2():
    """Third-wave shaves at the shipping 2048/keep=.125 flagship: score
    reuse is already in (fine pass scores only the 128 new z's); A/B the
    top-K selection algorithm."""
    scene = _scene()
    base = dict(aabb_clip=True, packed_layout=True, occ_adaptive_update=True,
                occ_per_ray=True, occ_keep_fraction=0.125, N_rand=2048)

    def measure(tag, **over):
        _measure_variant(scene, tag, **base, **over)

    measure("2048 .125 sort (+score reuse)")
    measure("2048 .125 topk", occ_per_ray_select="topk")
    measure("2048 .125 approx", occ_per_ray_select="approx")
    base["N_rand"] = 1024
    measure("1024 .125 sort")
    measure("1024 .125 approx", occ_per_ray_select="approx")
    base["N_rand"] = 4096
    measure("4096 .125 approx", occ_per_ray_select="approx")


def stage_blockcull():
    """Block-granular GLOBAL culling (keeps cross-ray reallocation, cuts the
    cull sort /B and widens un-permute rows xB) vs the per-point global path
    and per-ray, at matched budgets."""
    scene = _scene()
    base = dict(aabb_clip=True, packed_layout=True, occ_adaptive_update=True)

    def measure(tag, **over):
        _measure_variant(scene, tag, **base, **over)

    measure("global pt keep=.25 1024 (r3)")
    measure("global blk8 keep=.25 1024", occ_block=8)
    measure("global blk8 keep=.25 2048", occ_block=8, N_rand=2048)
    measure("global blk8 keep=.1875 2048", occ_block=8, N_rand=2048,
            occ_keep_fraction=0.1875)
    measure("global blk8 .25c/.125f 2048", occ_block=8, N_rand=2048,
            occ_keep_fraction=0.125, occ_keep_coarse=0.25)
    measure("global blk8 keep=.125 2048", occ_block=8, N_rand=2048,
            occ_keep_fraction=0.125)
    measure("global blk8 .25c/.125f 1024", occ_block=8,
            occ_keep_fraction=0.125, occ_keep_coarse=0.25)
    measure("global blk8 .25c/.1875f 1024", occ_block=8,
            occ_keep_fraction=0.1875, occ_keep_coarse=0.25)


# --------------------------------------------------------------------------- #
def stage_ledger():
    """Roofline ledger for the flagship step (VERDICT r3 #7): each phase at
    true shapes, AMORTIZED inside one lax.scan (K reps chained through the
    carry so XLA cannot hoist the body), against its measured primitive
    ceiling. Writes PROFILE_r05.md."""
    import jax
    import jax.numpy as jnp

    K_REPS = 32

    def timeit_scanned(fn, x, reps=3):
        """ms per call of fn(x), amortized over K_REPS scan iterations.
        fn's input is perturbed by the carry so iterations are dependent."""
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(jax.tree_util.tree_map(
                    lambda a: a + c.astype(a.dtype) * 1e-30
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, x))
                leaves = [o.sum().astype(jnp.float32)
                          for o in jax.tree_util.tree_leaves(out)]
                return c + sum(leaves) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K_REPS)
            return c

        float(run(x))
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            float(run(x))
            ts.append(time.perf_counter() - t)
        ts.sort()
        return ts[len(ts) // 2] * 1e3 / K_REPS

    from hashnerf_tpu.train.driver import Trainer

    # round-5 flagship flags (bench.py defaults): block-8 global culling,
    # coarse keep 0.375 / fine 0.125, adaptive updates
    args = bench_args(aabb_clip=True, packed_layout=True, occ_block=8,
                      occ_keep_fraction=0.125, occ_keep_coarse=0.375,
                      occ_adaptive_update=True)
    tr = Trainer(args, _scene())
    tr.global_step = 1001
    float(tr.run_steps(32, block_size=32)["loss"])
    tr._occ_ready = True

    # measured step total at the same flags
    B = 96
    float(tr.run_steps(B, block_size=B)["loss"])
    t = time.perf_counter()
    float(tr.run_steps(B, block_size=B)["loss"])
    step_ms = (time.perf_counter() - t) / B * 1e3
    log(f"step total: {step_ms:.2f} ms")

    key = jax.random.PRNGKey(0)
    R = args.N_rand
    occ_cfg = tr.render_cfg.occupancy
    grid, bbox = tr.occ_grid, tr.bbox
    pcfg = tr.model_cfg.packed_grid

    from hashnerf_tpu.render.occupancy import (
        cull_points, occupancy_scores, sample_update_cells,
    )
    from hashnerf_tpu.ops.packed_grid import packed_encode
    from hashnerf_tpu.ops.sampling import merge_sorted, sample_pdf, sorted_uniform
    from hashnerf_tpu.ops.volume import raw2outputs
    from hashnerf_tpu.kernels.gather_vjp import take_rows

    rows = []

    def entry(name, ms, elems, ceiling_ns=None, note=""):
        nspe = ms * 1e6 / elems
        light = (f"{ceiling_ns / nspe * 100:5.1f}%" if ceiling_ns else "    —")
        rows.append((name, ms, elems, nspe, light, note))
        log(f"{name:34s}: {ms:7.3f} ms  {nspe:7.2f} ns/elt  light={light} {note}")

    for S, tag in ((args.N_samples, "coarse"), (args.N_samples + args.N_importance, "fine")):
        n = R * S
        kf = occ_cfg.keep_fraction
        if tag == "coarse" and occ_cfg.keep_fraction_coarse is not None:
            kf = occ_cfg.keep_fraction_coarse
        k = min(n, -(-int(n * kf) // 128) * 128)
        pts = jax.random.uniform(key, (n, 3), minval=-1.4, maxval=1.4)
        ms = timeit_scanned(lambda p: occupancy_scores(grid, p, bbox, occ_cfg), pts)
        entry(f"occ score gather {tag} ({n//1000}k)", ms, n, 17.0,
              "ceiling: 17 ns/row fetch")
        scores = occupancy_scores(grid, pts, bbox, occ_cfg)
        for mode in ("sort2", "sort1", "cumsum"):
            ms = timeit_scanned(lambda s, m=mode: cull_points(s, k, mode=m)[1], scores)
            entry(f"cull {mode} {tag} ({n//1000}k)", ms, n, 4.5,
                  "ceiling: 4.5 ns/elt sort rate")
        kpts = pts[:k]
        ms = timeit_scanned(
            lambda p: packed_encode(tr.state.hash_table, p, bbox[0], bbox[1], pcfg)[0],
            kpts)
        entry(f"packed enc fwd {tag} ({k//1000}k)", ms, k * pcfg.n_levels, 17.0,
              "elems = row fetches")
        g = jax.grad(lambda t, p: jnp.sum(packed_encode(t, p, bbox[0], bbox[1], pcfg)[0]))
        ms = timeit_scanned(lambda p: g(tr.state.hash_table, p), kpts)
        entry(f"packed enc f+b {tag} ({k//1000}k)", ms, k * pcfg.n_levels, None)
        raw_perm = jax.random.normal(key, (n, 4))
        inv = jax.random.permutation(key, n)
        gg = jax.grad(lambda r: take_rows(r, inv).sum())
        ms = timeit_scanned(gg, raw_perm)
        entry(f"unpermute f+b {tag} ({n//1000}k)", ms, 2 * n, 17.0,
              "fwd+bwd row gathers")

    # hierarchical sampling path
    z = jnp.sort(jax.random.uniform(key, (R, 192), minval=2, maxval=6), -1)
    ms = timeit_scanned(lambda z: jnp.sort(z, axis=-1), z)
    entry("z full sort 192 (r3 path)", ms, R * 192, 4.5)
    a = z[:, :64]
    b = jnp.sort(jax.random.uniform(key, (R, 128), minval=2, maxval=6), -1)
    ms = timeit_scanned(lambda ab: merge_sorted(ab[0], ab[1]), (a, b))
    entry("rank-merge 64+128 (r4 path)", ms, R * 192, None)
    bins = jnp.sort(jax.random.uniform(key, (R, 63), minval=2, maxval=6), -1)
    w = jax.random.uniform(key, (R, 62))
    ms = timeit_scanned(lambda bw: sample_pdf(key, bw[0], bw[1], 128), (bins, w))
    entry("sample_pdf 1024x128", ms, R * 128 * 64, None, "elems = compares")
    ms = timeit_scanned(lambda s: sorted_uniform(key, (R, 128)) + s[0, 0] * 1e-30, z)
    entry("sorted_uniform 1024x128", ms, R * 128, None)

    # compositor + occupancy update amortized
    raw = jax.random.normal(key, (R, 192, 4))
    rd = jax.random.normal(key, (R, 3))
    gr = jax.grad(lambda r: raw2outputs(r, z, rd, 0.0, True).rgb_map.sum())
    ms = timeit_scanned(gr, raw)
    entry("raw2outputs f+b", ms, R * 192, None)
    ms = timeit_scanned(lambda g2: sample_update_cells(g2, key, occ_cfg), grid)
    entry("occ update cells (per-update)", ms, occ_cfg.n_update_samples, None,
          f"every {occ_cfg.update_every} steps")

    with open(os.path.join(REPO, "PROFILE_r05.md"), "w") as f:
        f.write("# PROFILE_r05 — flagship step roofline ledger "
                "(v5e, N_rand=1024, L4/F8 packed, block-8, "
                "coarse keep 0.375 / fine 0.125)\n\n")
        f.write(f"Measured step total: **{step_ms:.2f} ms** "
                f"({args.N_rand / step_ms * 1e3:.0f} rays/s). Components "
                "amortized over a 32-iteration lax.scan (no dispatch "
                "overhead); 'light' = measured primitive ceiling / achieved "
                "rate (gather fetch 17 ns/row, sort 4.5 ns/elt from "
                "docs/TPU_DESIGN.md micro probes).\n\n")
        f.write("| phase | ms | elems | ns/elt | % of light | note |\n")
        f.write("|---|---|---|---|---|---|\n")
        for name, ms, elems, nspe, light, note in rows:
            f.write(f"| {name} | {ms:.3f} | {elems} | {nspe:.2f} | {light} "
                    f"| {note} |\n")
        tot = sum(r[1] for r in rows)
        f.write(f"\nComponent sum (one coarse+fine step's phases): "
                f"~{tot:.1f} ms vs step total {step_ms:.2f} ms (components "
                "overlap/fuse inside the real program; sum is an upper "
                "bound on slack attribution).\n")
    log(f"wrote PROFILE_r05.md (component sum {sum(r[1] for r in rows):.1f} ms)")


# --------------------------------------------------------------------------- #
# Quality-curve configs: every config bench.py can report rays/s for must
# have a same-flags PSNR curve committed (VERDICT r2 #2).
QUALITY_CONFIGS = {
    # the exact bench.py defaults (keep=0.25 + aabb + N_rand=4096)
    "safe4096": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "4096",
                 "QB_ITERS": "768", "QB_BLOCK": "128"},
    # reference-semantics anchor (fp32, 16x2 table, no culling)
    "parity768": {"QB_PARITY": "1", "QB_ITERS": "768", "QB_BLOCK": "64"},
    # corner-packed flagship
    "packed4096": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "4096",
                   "QB_PACKED": "1", "QB_ITERS": "768", "QB_BLOCK": "128"},
    # the bench.py default config (packed, reference batch)
    "packed1024": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                   "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128"},
    # long run hunting iters_to_psnr30 at the bench config
    "psnr30_1024": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128"},
    "r1fast": {"QB_KEEP": "0.25", "QB_AABB": "0", "QB_NRAND": "1024",
               "QB_ITERS": "1536", "QB_BLOCK": "128"},
    # flagship WITHOUT aabb clip (isolates aabb's quality effect at 1024)
    "packedr1": {"QB_KEEP": "0.25", "QB_AABB": "0", "QB_NRAND": "1024",
                 "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128"},
    # ---- saturation ablations (flagship = packed/1024/aabb/keep.25/bf16/
    # share_fine/cull-at-eval saturates ~26 dB; parity converges past 28 —
    # each run flips ONE knob to find where the dB went) ----
    "abl_evalfull": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                     "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                     "QB_EVALCULL": "0"},
    "abl_f32": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                "QB_DTYPE": "float32"},
    "abl_keep50": {"QB_KEEP": "0.5", "QB_AABB": "1", "QB_NRAND": "1024",
                   "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128"},
    "abl_L16F2": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                  "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                  "QB_L": "16", "QB_F": "2"},
    "abl_L4F8": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                 "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                 "QB_L": "4", "QB_F": "8"},
    # tighter culling budget at the L4F8 flagship (keep=0.125 halves the
    # encoded points; quality must hold vs abl_L4F8's 28.89 dB @1536)
    "abl_keep125": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128"},
    # L4F8-flagship long runs (tags distinct from the L8F4 generation so
    # both artifact sets stay committed)
    "psnr30_L4F8": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                    "QB_L": "4", "QB_F": "8"},
    "quality30_L4F8": {"QB_KEEP": "0.5", "QB_AABB": "0", "QB_NRAND": "1024",
                       "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                       "QB_L": "4", "QB_F": "8"},
    "abl_noshare": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                    "QB_SHARE": "0"},
    "abl_noocc": {"QB_AABB": "1", "QB_NRAND": "1024", "QB_PACKED": "1",
                  "QB_ITERS": "1536", "QB_BLOCK": "128", "QB_OCC": "0"},
    # best-quality execution set from the ablation matrix (keep=0.5, no
    # aabb — each measured ~+0.7 dB over the throughput flagship), long run
    # for the iters_to_psnr30 north-star metric
    "quality30": {"QB_KEEP": "0.5", "QB_AABB": "0", "QB_NRAND": "1024",
                  "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128"},
    # harder multi-primitive scene — discriminative PSNR (VERDICT r2 weak #3)
    "multi2k": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                "QB_PACKED": "1", "QB_ITERS": "2048", "QB_BLOCK": "128",
                "QB_SCENE": "multi"},
    # ---- round 4: the annealed-keep flagship + its controls ----
    # full r4 stack: fast_merge + sort1 partition + adaptive updates +
    # annealed keep (0.5 while the grid forms, 0.25, then 0.125 steady) —
    # must hold within ~0.5 dB of abl_L4F8's 28.89 @1536 (VERDICT r3 #2a)
    "r4_flagship": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                    "QB_FASTMERGE": "1", "QB_PARTITION": "sort1",
                    "QB_ADAPTIVE": "1",
                    "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # constant keep=0.125 + adaptive updates (isolates VERDICT r3 #9: does
    # grid sharpening alone recover abl_keep125's -4.1 dB?)
    "r4_keep125_adaptive": {"QB_KEEP": "0.125", "QB_AABB": "1",
                            "QB_NRAND": "1024", "QB_PACKED": "1",
                            "QB_ITERS": "1536", "QB_BLOCK": "128",
                            "QB_FASTMERGE": "1", "QB_PARTITION": "sort1",
                            "QB_ADAPTIVE": "1"},
    # cumsum partition quality control (approximate top-k vs exact)
    "r4_cumsum": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                  "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                  "QB_FASTMERGE": "1", "QB_PARTITION": "cumsum",
                  "QB_ADAPTIVE": "1"},
    # parity rerun recording train_s/steady_step_ms (honest iso-quality
    # comparison, VERDICT r3 #1) — long enough to cross 30 dB
    "r4_parity2k": {"QB_PARITY": "1", "QB_ITERS": "2560", "QB_BLOCK": "64"},
    # r4 flagship long run: iters-to-30dB + measured train_s
    "r4_psnr30": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                  "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                  "QB_FASTMERGE": "1", "QB_PARTITION": "sort1",
                  "QB_ADAPTIVE": "1",
                  "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # packed-layout seam A/B on the hard multi-object scene (VERDICT r3 #8):
    # identical flags except the table layout
    "r4_multi_packed": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                        "QB_PACKED": "1", "QB_ITERS": "2048",
                        "QB_BLOCK": "128", "QB_SCENE": "multi"},
    "r4_multi_unpacked": {"QB_KEEP": "0.25", "QB_AABB": "1",
                          "QB_NRAND": "1024", "QB_PACKED": "0",
                          "QB_ITERS": "2048", "QB_BLOCK": "128",
                          "QB_SCENE": "multi"},
    # ---- round 4, second wave: PER-RAY culling flagship (stage_perray
    # measured 81k rays/s @1024, 113k @2048 with keep=.125 — the global
    # path's cull sort + un-permute gone). Quality gates below. ----
    # the shipping flagship: N_rand=2048, per-ray, adaptive updates,
    # annealed keep 0.5 -> 0.25 -> 0.125
    "r4p_flagship2048": {"QB_KEEP": "0.25", "QB_AABB": "1",
                         "QB_NRAND": "2048", "QB_PACKED": "1",
                         "QB_ITERS": "1536", "QB_BLOCK": "128",
                         "QB_PERRAY": "1", "QB_ADAPTIVE": "1",
                         "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # same at the reference's exact batch (honest 1024 line)
    "r4p_flagship1024": {"QB_KEEP": "0.25", "QB_AABB": "1",
                         "QB_NRAND": "1024", "QB_PACKED": "1",
                         "QB_ITERS": "1536", "QB_BLOCK": "128",
                         "QB_PERRAY": "1", "QB_ADAPTIVE": "1",
                         "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # constant keep=.25 per-ray (isolates per-ray allocation vs global:
    # compare against abl_L4F8's 28.89 dB @1536)
    "r4p_keep25": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                   "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                   "QB_PERRAY": "1", "QB_ADAPTIVE": "1"},
    # constant keep=.125 per-ray + adaptive (VERDICT r3 #9 gate: within
    # 1 dB of keep=.25)
    "r4p_keep125": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                    "QB_PERRAY": "1", "QB_ADAPTIVE": "1"},
    # flagship long run: iters/seconds-to-30dB at the shipping config
    "r4p_psnr30": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "2048",
                   "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                   "QB_PERRAY": "1", "QB_ADAPTIVE": "1",
                   "QB_KEEP_COARSE": "0.25",
                   "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # hard multi-object scene at the shipping flagship flags
    "r4p_multi": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "2048",
                  "QB_PACKED": "1", "QB_ITERS": "2048", "QB_BLOCK": "128",
                  "QB_PERRAY": "1", "QB_ADAPTIVE": "1", "QB_SCENE": "multi",
                  "QB_KEEP_COARSE": "0.25",
                  "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # ---- asymmetric-budget flagship (flat 0.125 anneal measured -4 dB at
    # the switch): coarse stays 0.25 (PDF quality), fine anneals to 0.125 —
    # fine encode is the cost center, so throughput stays ~flagship2048 ----
    "r4a_flagship2048": {"QB_KEEP": "0.25", "QB_AABB": "1",
                         "QB_NRAND": "2048", "QB_PACKED": "1",
                         "QB_ITERS": "1536", "QB_BLOCK": "128",
                         "QB_PERRAY": "1", "QB_ADAPTIVE": "1",
                         "QB_KEEP_COARSE": "0.25",
                         "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # same + approximate top-k selection (quality control for approx mode)
    "r4a_approx2048": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "2048",
                       "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                       "QB_PERRAY": "1", "QB_ADAPTIVE": "1",
                       "QB_KEEP_COARSE": "0.25", "QB_SELECT": "approx",
                       "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # asymmetric long run for iters/seconds-to-30dB
    "r4a_psnr30": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "2048",
                   "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                   "QB_PERRAY": "1", "QB_ADAPTIVE": "1",
                   "QB_KEEP_COARSE": "0.25",
                   "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # ---- block-granular GLOBAL culling (cross-ray reallocation kept;
    # r4p_keep25 measured per-ray -2.3 dB vs global at equal budget) ----
    # block8 global at the proven keep=.25, reference batch — quality must
    # track abl_L4F8's 28.89 (block granularity is the only delta)
    "r4b_keep25": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                   "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                   "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1"},
    # the block8 flagship candidate: 2048 rays, anneal to keep=.1875
    "r4b_flagship2048": {"QB_KEEP": "0.25", "QB_AABB": "1",
                         "QB_NRAND": "2048", "QB_PACKED": "1",
                         "QB_ITERS": "1536", "QB_BLOCK": "128",
                         "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                         "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.1875"},
    # deeper anneal (0.125 steady): did global allocation fix what flat
    # per-ray 0.125 broke?
    "r4b_keep125_2048": {"QB_KEEP": "0.25", "QB_AABB": "1",
                         "QB_NRAND": "2048", "QB_PACKED": "1",
                         "QB_ITERS": "1536", "QB_BLOCK": "128",
                         "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                         "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # the asymmetric block8 flagship: coarse 0.25 constant, fine anneals to
    # 0.125 (101k rays/s measured) — THE 10x-gate candidate
    "r4b_asym2048": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "2048",
                     "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                     "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                     "QB_KEEP_COARSE": "0.25",
                     "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # the asym block8 flagship at the REFERENCE batch (throughput + quality
    # + time-to-30dB in one config)
    "r4b_asym1024": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                     "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                     "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                     "QB_KEEP_COARSE": "0.25",
                     "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    "r4basym1024_psnr30": {"QB_KEEP": "0.125", "QB_AABB": "1",
                           "QB_NRAND": "1024", "QB_PACKED": "1",
                           "QB_ITERS": "6144", "QB_BLOCK": "128",
                           "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                           "QB_KEEP_COARSE": "0.25",
                           "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # the SHIPPED flagship flags on the hard multi-object scene
    "r4b_asym_multi": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                       "QB_PACKED": "1", "QB_ITERS": "2048", "QB_BLOCK": "128",
                       "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                       "QB_KEEP_COARSE": "0.25", "QB_SCENE": "multi",
                       "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # fallback asym: fine floor 0.1875 instead of 0.125
    "r4b_asym1875": {"QB_KEEP": "0.1875", "QB_AABB": "1", "QB_NRAND": "2048",
                     "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                     "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                     "QB_KEEP_COARSE": "0.25",
                     "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.1875"},
    # asym block8 long run for iters/seconds-to-30dB
    "r4basym_psnr30": {"QB_KEEP": "0.125", "QB_AABB": "1",
                       "QB_NRAND": "2048", "QB_PACKED": "1",
                       "QB_ITERS": "6144", "QB_BLOCK": "128",
                       "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                       "QB_KEEP_COARSE": "0.25",
                       "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # block8 long run at the flagship anneal for iters/seconds-to-30dB
    "r4b_psnr30": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "2048",
                   "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                   "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                   "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.1875"},
    # time-to-quality king: blk8 keep=.25 at the reference batch, long run
    # (28.99 @1536 == the global-path quality at 14.9 ms/step)
    "r4k_psnr30": {"QB_KEEP": "0.25", "QB_AABB": "1", "QB_NRAND": "1024",
                   "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                   "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1"},
    # ---- round 5: erase the equal-iteration dB tax (VERDICT r4 next #2:
    # >=28.5 dB @1536 at >=85k rays/s). The r4 asym curve LEADS keep25
    # until the 768 switch, dips -2.7 dB there, ends 1 dB short — so the
    # levers are a LATER switch (more recovery room; the early 0.25 phase
    # is a one-off cost, the steady phase is unchanged) and a LOOSER
    # COARSE budget (coarse drives the fine PDF at 1/3 the encode cost).
    # Steady-phase flags must stay bench-measurable at >=85k rays/s. ----
    "r5_late1024": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                    "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                    "QB_KEEP_COARSE": "0.25",
                    "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    "r5_coarse375": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                     "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                     "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                     "QB_KEEP_COARSE": "0.375",
                     "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    "r5_c375late": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                    "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                    "QB_KEEP_COARSE": "0.375",
                    "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    # smoother fine anneal: intermediate 0.1875 phase softens the budget
    # switch (the r4 curve dipped -2.7 dB at the hard 0.25->0.125 edge)
    "r5_smooth": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                  "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                  "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                  "QB_KEEP_COARSE": "0.25",
                  "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.1875,1152:0.125"},
    # 2x grid-update cadence: a sharper grid picks better samples at the
    # same keep budget (amortized update cost ~0.3 ms/step at every-8)
    "r5_update8": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                   "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                   "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                   "QB_KEEP_COARSE": "0.25", "QB_UPDATE_EVERY": "8",
                   "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # coarse keep 0.5 (32/64 coarse samples): +~0.9 ms over kc=0.25, still
    # inside the 12.05 ms (>=85k rays/s) budget; the PDF-quality lever at
    # its loosest useful setting (coarse >=16/64 is the collapse floor)
    "r5_c50": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
               "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
               "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
               "QB_KEEP_COARSE": "0.5",
               "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # round-5 FLAGSHIP long run (the r5_c375late winner: coarse 0.375,
    # late anneal): iters/seconds-to-30dB at the shipping flags
    "r5_psnr30": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                  "QB_PACKED": "1", "QB_ITERS": "6144", "QB_BLOCK": "128",
                  "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                  "QB_KEEP_COARSE": "0.375",
                  "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    # flagship flags on the hard multi-object scene
    "r5_multi": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                 "QB_PACKED": "1", "QB_ITERS": "2048", "QB_BLOCK": "128",
                 "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                 "QB_KEEP_COARSE": "0.375", "QB_SCENE": "multi",
                 "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    # seed replicas of the flagship curve (error bars on the 28.88 claim)
    "r5_c375late_s1": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                       "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                       "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                       "QB_KEEP_COARSE": "0.375", "QB_SEED": "1",
                       "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    "r5_c375late_s2": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                       "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                       "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                       "QB_KEEP_COARSE": "0.375", "QB_SEED": "2",
                       "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    # PAIRED r4-flagship seed replicas (same seeds as r5_c375late_s*):
    # endpoint noise is ~±1.5 dB, so the r5-vs-r4 claim is made seed-paired
    "r4b_asym1024_s1": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                        "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                        "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                        "QB_KEEP_COARSE": "0.25", "QB_SEED": "1",
                        "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    "r4b_asym1024_s2": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                        "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                        "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                        "QB_KEEP_COARSE": "0.25", "QB_SEED": "2",
                        "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # low-noise head-to-head: 8 held-out views (4x less eval variance than
    # the 2-view protocol) — the definitive r5-vs-r4 flagship comparison
    "r5_c375late_t8": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                       "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                       "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                       "QB_KEEP_COARSE": "0.375", "QB_NTEST": "8",
                       "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    "r4b_asym1024_t8": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                        "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                        "QB_OCCBLOCK": "8", "QB_ADAPTIVE": "1",
                        "QB_KEEP_COARSE": "0.25", "QB_NTEST": "8",
                        "QB_KEEP_SCHEDULE": "0:0.5,384:0.25,768:0.125"},
    # unculled control at 8 views (the ceiling the culled configs chase)
    "r5_noocc_t8": {"QB_AABB": "1", "QB_NRAND": "1024", "QB_PACKED": "1",
                    "QB_ITERS": "1536", "QB_BLOCK": "128", "QB_OCC": "0",
                    "QB_NTEST": "8"},
    # block-16 cull granularity (bench: 95.0k vs 92.5k at block-8; sort and
    # unpermute shrink/widen 2x) — quality gate vs the block-8 flagship
    "r5_blk16": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                 "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                 "QB_OCCBLOCK": "16", "QB_ADAPTIVE": "1",
                 "QB_KEEP_COARSE": "0.375",
                 "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
    "r5_blk16_t8": {"QB_KEEP": "0.125", "QB_AABB": "1", "QB_NRAND": "1024",
                    "QB_PACKED": "1", "QB_ITERS": "1536", "QB_BLOCK": "128",
                    "QB_OCCBLOCK": "16", "QB_ADAPTIVE": "1",
                    "QB_KEEP_COARSE": "0.375", "QB_NTEST": "8",
                    "QB_KEEP_SCHEDULE": "0:0.5,512:0.25,1024:0.125"},
}

_QB_KEYS = ("QB_KEEP", "QB_AABB", "QB_NRAND", "QB_ITERS", "QB_BLOCK",
            "QB_L", "QB_F", "QB_TAG", "QB_PARITY", "QB_PACKED", "QB_SCENE",
            "QB_CHUNK", "QB_VIEWS", "QB_EVALCULL", "QB_DTYPE", "QB_SHARE",
            "QB_OCC", "QB_FASTMERGE", "QB_PARTITION", "QB_ADAPTIVE",
            "QB_KEEP_SCHEDULE", "QB_PERRAY", "QB_KEEP_COARSE", "QB_SELECT",
            "QB_OCCBLOCK", "QB_UPDATE_EVERY", "QB_SEED", "QB_NTEST")


def stage_quality(tag):
    env = QUALITY_CONFIGS[tag]
    for k in _QB_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)
    os.environ["QB_TAG"] = tag
    log(f"--- quality {tag}: {env} ---")
    import bench_quality

    try:
        bench_quality.main()
    except Exception:
        import traceback

        traceback.print_exc()


def stage_bench():
    import bench

    bench.main()


def stage_smoke():
    """The verify-skill CLI smoke (run_nerf.py end-to-end) in this attach."""
    import run_nerf

    run_nerf.main(["--config", "configs/synthetic_smoke.txt", "--no_reload"])


# --------------------------------------------------------------------------- #
def main(stages):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    for st in stages:
        log(f"=== stage {st} ===")
        try:
            if st == "diag":
                stage_diag()
            elif st == "micro":
                stage_micro()
            elif st == "probes":
                stage_probes()
            elif st == "pprofile":
                stage_pprofile()
            elif st == "variants":
                stage_variants()
            elif st == "variants4":
                stage_variants4()
            elif st == "perray":
                stage_perray()
            elif st == "perray2":
                stage_perray2()
            elif st == "blockcull":
                stage_blockcull()
            elif st == "ledger":
                stage_ledger()
            elif st == "bench":
                stage_bench()
            elif st == "smoke":
                stage_smoke()
            elif st.startswith("quality:"):
                stage_quality(st.split(":", 1)[1])
            else:
                log(f"unknown stage {st!r}")
        except Exception:
            import traceback

            traceback.print_exc()
    log("ALL DONE")


def subproc_main(stages):
    """Run each stage in its OWN child process with a timeout.

    The remote-compile RPC occasionally wedges forever (observed twice at
    compile-heavy windows); in one big process that loses the whole session.
    The TPU attach is cheap when the tunnel is warm (~10 s), so per-stage
    isolation costs little and a wedge only loses one stage.
    """
    import subprocess

    t_limit = int(os.environ.get("TPL_STAGE_TIMEOUT", "2400"))
    for st in stages:
        print(f"[lab-driver] === {st} (limit {t_limit}s) ===", flush=True)
        t0 = time.time()
        try:
            rc = subprocess.call(
                [sys.executable, "-m", "hashnerf_tpu.tools.tpu_lab", st],
                timeout=t_limit, cwd=REPO,
            )
            print(f"[lab-driver] {st}: rc={rc} ({time.time()-t0:.0f}s)", flush=True)
        except subprocess.TimeoutExpired:
            print(f"[lab-driver] {st}: TIMEOUT after {t_limit}s — killed, "
                  "continuing", flush=True)
    print("[lab-driver] ALL DONE", flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:] or ["diag"]
    if argv[0] == "--subproc":
        subproc_main(argv[1:])
    else:
        main(argv)

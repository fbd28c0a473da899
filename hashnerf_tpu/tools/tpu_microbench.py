"""Microbenchmark the train step's component primitives on the real TPU.

Isolates the candidate bottlenecks of the ~1.5-2 s/step observed by tpu_diag:
sort, random gather, cumsum/searchsorted (the segment-accumulate backward),
argsort/top_k (occupancy culling), XLA scatter-add, and the MLP matmuls.
Prints one timing line per primitive, flushed immediately.

Usage: python -m hashnerf_tpu.tools.tpu_microbench
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[ub +{time.time() - T0:7.1f}s] {msg}", flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile
    _sync(out)
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t)
    ts.sort()
    return ts[len(ts) // 2]


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)

    # Chair-scale shapes: N = 1024 rays * 192 samples; idx per (level, corner).
    N = 1024 * 192
    L, F, T = 8, 4, 1 << 19
    M = L * N * 8  # 12.58M

    idx = jax.random.randint(key, (M,), 0, L * T, dtype=jnp.int32)
    vals = jax.random.normal(key, (M, F), dtype=jnp.float32)
    fvals = jax.random.normal(key, (M,), dtype=jnp.float32)

    f = jax.jit(lambda i: jax.lax.sort((i, jnp.arange(M, dtype=jnp.int32)), num_keys=1))
    log(f"sort (idx,iota) M={M/1e6:.1f}M:      {timeit(f, idx)*1e3:8.1f} ms")

    f = jax.jit(lambda i: jax.lax.sort((i.reshape(L, -1), jnp.broadcast_to(jnp.arange(N * 8, dtype=jnp.int32), (L, N * 8))), num_keys=1, dimension=-1))
    log(f"batched per-level sort (L,{N*8/1e6:.2f}M): {timeit(f, idx)*1e3:8.1f} ms")

    f = jax.jit(lambda v, p: jnp.take(v, p, axis=0))
    perm = jax.random.permutation(key, M)
    log(f"random gather (M,{F}):           {timeit(f, vals, perm)*1e3:8.1f} ms")

    f = jax.jit(lambda v: jnp.cumsum(v, axis=0))
    log(f"cumsum (M,{F}):                  {timeit(f, vals)*1e3:8.1f} ms")

    sidx = jnp.sort(idx)
    f = jax.jit(lambda s: jnp.searchsorted(s, jnp.arange(L * T, dtype=jnp.int32), side="right"))
    log(f"searchsorted T={L*T/1e6:.1f}M:         {timeit(f, sidx)*1e3:8.1f} ms")

    from hashnerf_tpu.kernels.segment_scatter import _sorted_segment_accumulate_tpu

    f = jax.jit(lambda i, v: _sorted_segment_accumulate_tpu(i, v, num_rows=L * T))
    log(f"segment_accumulate full:        {timeit(f, idx, vals)*1e3:8.1f} ms")

    f = jax.jit(lambda i, v: jnp.zeros((L * T, F), jnp.float32).at[i].add(v))
    log(f"XLA scatter-add:                {timeit(f, idx, vals)*1e3:8.1f} ms")

    # occupancy culling primitives (196k points)
    scores = jax.random.normal(key, (N,), dtype=jnp.float32)
    f = jax.jit(lambda s: jnp.argsort(-s, stable=True))
    log(f"argsort {N/1e3:.0f}k:                  {timeit(f, scores)*1e3:8.1f} ms")
    f = jax.jit(lambda s: jax.lax.top_k(s, 49152))
    log(f"top_k 49k of {N/1e3:.0f}k:             {timeit(f, scores)*1e3:8.1f} ms")

    # hash-encode forward at fine scale (culled 49k and full 196k points)
    from hashnerf_tpu.ops.hash_encoding import HashGridConfig
    from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast

    hcfg = HashGridConfig(n_levels=L, n_features_per_level=F,
                          log2_hashmap_size=19, finest_resolution=512)
    table = jax.random.normal(key, (L, T, F), dtype=jnp.float32) * 1e-4
    bmin = jnp.array([-1.5, -1.5, -1.5])
    bmax = jnp.array([1.5, 1.5, 1.5])
    for n_pts in (49152, N):
        pts = jax.random.uniform(key, (n_pts, 3), minval=-1.4, maxval=1.4)
        f = jax.jit(lambda t, p: hash_encode_fast(t, p, bmin, bmax, hcfg)[0])
        log(f"encode fwd n={n_pts/1e3:6.0f}k:         {timeit(f, table, pts)*1e3:8.1f} ms")
        g = jax.jit(jax.grad(lambda t, p: hash_encode_fast(t, p, bmin, bmax, hcfg)[0].sum()))
        log(f"encode fwd+bwd n={n_pts/1e3:6.0f}k:     {timeit(g, table, pts)*1e3:8.1f} ms")

    # MLP fwd+bwd at fine scale
    from hashnerf_tpu.models.nerf import NeRFSmallConfig, init_nerf_small, apply_nerf_small

    mcfg = NeRFSmallConfig(input_ch=L * F, input_ch_views=16)
    params = init_nerf_small(key, mcfg)
    x = jax.random.normal(key, (N, L * F + 16), dtype=jnp.float32)
    f = jax.jit(lambda p, x: apply_nerf_small(p, x, mcfg, jnp.bfloat16).sum())
    log(f"mlp fwd {N/1e3:.0f}k bf16:             {timeit(f, params, x)*1e3:8.1f} ms")
    g = jax.jit(jax.grad(lambda p, x: apply_nerf_small(p, x, mcfg, jnp.bfloat16).sum()))
    log(f"mlp fwd+bwd {N/1e3:.0f}k bf16:         {timeit(g, params, x)*1e3:8.1f} ms")

    # RAdam dense update on the table param group
    import optax
    from hashnerf_tpu.train.radam import radam

    opt = radam(lambda s: 0.01, b1=0.9, b2=0.99, eps=1e-15)
    tstate = opt.init(table)
    gr = jax.random.normal(key, table.shape) * 1e-3

    @jax.jit
    def opt_step(t, s, g):
        u, s = opt.update(g, s, t)
        return optax.apply_updates(t, u), s

    log(f"radam table update (L,T,F):     {timeit(opt_step, table, tstate, gr)*1e3:8.1f} ms")

    log("DONE")


if __name__ == "__main__":
    main()

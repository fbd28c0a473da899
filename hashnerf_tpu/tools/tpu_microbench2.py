"""Layout probes: is the narrow (.., F=4) minor dimension killing bandwidth?

Hypothesis from tpu_microbench round 1: elementwise/scan ops over (M, 4)
arrays run at ~7-20 GB/s effective — consistent with XLA TPU tiled layouts
padding the minor dim toward the 128-lane tile. These probes compare the
same byte volumes in narrow vs wide layouts to decide whether the hash
table / gradient plumbing should be re-laid out.

Usage: python -m hashnerf_tpu.tools.tpu_microbench2
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[ub2 +{time.time() - T0:7.1f}s] {msg}", flush=True)


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
    return ts[len(ts) // 2]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    M = 1024 * 192 * 8 * 8  # 12.6M

    # 1. elementwise bandwidth: same 200 MB as (M,4) vs (M/32,128) vs 1-D
    ew = jax.jit(lambda x: x * 1.0001 + 0.5)
    for shape, tag in [((M, 4), "(M,4)   "), ((M // 32, 128), "(M/32,128)"), ((M * 4,), "(4M,) 1-D")]:
        x = jax.random.normal(key, shape, jnp.float32)
        dt = timeit(ew, x)
        gbs = 2 * 4 * M * 4 / dt / 1e9  # read+write of 200MB
        log(f"elementwise {tag}: {dt*1e3:7.1f} ms  ({gbs:5.1f} GB/s eff)")

    # 2. cumsum along elements: (M,4) vs (M/32,128)
    for shape, ax, tag in [((M, 4), 0, "(M,4) ax0  "), ((M // 32, 128), 0, "(M/32,128) ")]:
        x = jax.random.normal(key, shape, jnp.float32)
        f = jax.jit(lambda x: jnp.cumsum(x, axis=ax))
        log(f"cumsum {tag}: {timeit(f, x)*1e3:7.1f} ms")

    # 3. RAdam-ish update: narrow vs wide param layout (same 64 MB of params)
    import optax
    from hashnerf_tpu.train.radam import radam

    for shape, tag in [((8, 1 << 19, 4), "(8,2^19,4) "), ((8, 1 << 14, 128), "(8,2^14,128)")]:
        p = jax.random.normal(key, shape, jnp.float32) * 1e-4
        opt = radam(lambda s: 0.01, b1=0.9, b2=0.99, eps=1e-15)
        st = opt.init(p)
        g = jax.random.normal(key, shape) * 1e-3

        @jax.jit
        def step(p, st, g):
            u, st2 = opt.update(g, st, p)
            return optax.apply_updates(p, u), st2

        log(f"radam {tag}: {timeit(step, p, st, g)*1e3:7.1f} ms")

    # 4. random row gather rate vs row width (fixed 3.1M fetches)
    N = 3_145_728
    for T, W in [(1 << 19, 4), (1 << 19, 8), (1 << 16, 32), (1 << 14, 128)]:
        tbl = jax.random.normal(key, (T, W), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, tbl, idx)
        log(f"gather {N/1e6:.1f}M rows from ({T},{W}): {dt*1e3:7.1f} ms  ({dt/N*1e9:5.1f} ns/row)")

    # 5. one-level hash-table gather at fine-culled scale, idx sorted vs not
    T, F = 1 << 19, 4
    tbl = jax.random.normal(key, (T, F), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    log(f"gather unsorted:      {timeit(f, tbl, idx)*1e3:7.1f} ms")
    sidx = jnp.sort(idx)
    log(f"gather sorted idx:    {timeit(f, tbl, sidx)*1e3:7.1f} ms")

    log("DONE")


if __name__ == "__main__":
    main()

"""hashnerf_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP-style NeRF framework.

Capability parity target: mache102/HashNeRF-pytorch (see /root/repo/SURVEY.md).
Everything here is a from-scratch TPU-first design: pure-function ops, a single
(L, 2^T, F) hash-table parameter array, one fully-jitted train step, and
multi-chip scaling via jax.sharding.Mesh + NamedSharding over the ray axis.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles through the axon tunnel
# take minutes; every CLI invocation would otherwise pay them again. The
# config route works even when jax was pre-imported (env vars would not).
def _enable_compilation_cache():
    import os

    import jax

    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/hashnerf_jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these config names


_enable_compilation_cache()

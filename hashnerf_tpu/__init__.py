"""hashnerf_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP-style NeRF framework.

Capability parity target: mache102/HashNeRF-pytorch (see /root/repo/SURVEY.md).
Everything here is a from-scratch TPU-first design: pure-function ops, a single
(L, 2^T, F) hash-table parameter array, one fully-jitted train step, and
multi-chip scaling via jax.sharding.Mesh + NamedSharding over the ray axis.
"""

__version__ = "0.1.0"

"""Rectified Adam as an optax GradientTransformation.

Capability parity: /root/reference/radam.py:5-94 (the vendored RAdam the
reference trains with). Semantics replicated exactly, including:
  * variance-rectification gate N_sma >= 5; with degenerated_to_sgd=False
    (the reference's create_nerf default) the first few steps apply NO update
    while the moment estimates warm up;
  * decoupled weight decay `p -= wd * lr * p` applied only on update steps;
  * per-group hyperparameters via optax.multi_transform (net: wd=1e-6,
    embeddings: eps=1e-15 — reference run_nerf_helpers.py:131-135).

Implemented with jnp.where on scalar step-dependent terms (branch-free, XLA
friendly), not python control flow.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    mu: optax.Updates
    nu: optax.Updates


def radam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    degenerated_to_sgd: bool = False,
) -> optax.GradientTransformation:
    """learning_rate: float or schedule fn(step) -> lr."""

    def lr_at(step):
        if callable(learning_rate):
            return learning_rate(step)
        return jnp.asarray(learning_rate)

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamState(step=jnp.zeros([], jnp.int32), mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("radam requires params (for weight decay)")
        t = state.step + 1
        tf = t.astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        # 1 - b^t via expm1 to dodge fp32 cancellation (torch computes these
        # scalars in python float64; expm1 keeps us allclose without x64).
        import math

        one_minus_beta2_t = -jnp.expm1(tf * math.log(b2))
        beta2_t = 1.0 - one_minus_beta2_t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / one_minus_beta2_t

        rect = jnp.sqrt(
            one_minus_beta2_t
            * (n_sma - 4.0)
            / (n_sma_max - 4.0)
            * (n_sma - 2.0)
            / n_sma
            * n_sma_max
            / (n_sma_max - 2.0)
        )
        bias1 = -jnp.expm1(tf * math.log(b1))
        adaptive_step = rect / bias1  # valid when n_sma >= 5
        sgd_step = 1.0 / bias1

        lr = lr_at(state.step)
        use_adaptive = n_sma >= 5.0
        use_sgd = jnp.logical_and(jnp.logical_not(use_adaptive), degenerated_to_sgd)
        any_update = jnp.logical_or(use_adaptive, use_sgd)

        def per_param(p, m, v):
            adaptive = adaptive_step * m / (jnp.sqrt(v) + eps)
            sgd = sgd_step * m
            delta = jnp.where(use_adaptive, adaptive, jnp.where(use_sgd, sgd, 0.0))
            wd_term = jnp.where(any_update, weight_decay * p, 0.0)
            return -lr * (delta + wd_term)

        new_updates = jax.tree_util.tree_map(per_param, params, mu, nu)
        return new_updates, RAdamState(step=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)

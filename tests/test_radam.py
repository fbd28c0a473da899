"""RAdam vs an independent numpy implementation of the reference algorithm."""
import numpy as np
import jax
import jax.numpy as jnp

from hashnerf_tpu.train.radam import radam


def numpy_radam_run(p0, grads, lr, b1, b2, eps, wd, degenerated_to_sgd):
    """Step-by-step scalar RAdam written independently from the paper."""
    p = float(p0)
    m = v = 0.0
    n_sma_max = 2.0 / (1.0 - b2) - 1.0
    hist = []
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        beta2_t = b2**t
        n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
        if n_sma >= 5:
            rect = np.sqrt(
                (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4) * (n_sma - 2) / n_sma
                * n_sma_max / (n_sma_max - 2)
            )
            step = rect / (1 - b1**t)
            p = p - wd * lr * p
            p = p - lr * step * m / (np.sqrt(v) + eps)
        elif degenerated_to_sgd:
            step = 1.0 / (1 - b1**t)
            p = p - wd * lr * p
            p = p - lr * step * m
        hist.append(p)
    return hist


def _run_optax(p0, grads, **kw):
    opt = radam(**kw)
    params = {"p": jnp.array(p0)}
    state = opt.init(params)
    hist = []
    for g in grads:
        upd, state = opt.update({"p": jnp.array(g)}, state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
        hist.append(float(params["p"]))
    return hist


def test_matches_reference_semantics():
    grads = [0.5, -0.3, 0.8, 0.1, -0.9, 0.4, 0.2, -0.1, 0.6, -0.4, 0.3, 0.7]
    for b2, wd, sgd in [(0.99, 0.0, False), (0.99, 1e-2, False), (0.999, 0.0, True)]:
        got = _run_optax(1.0, grads, learning_rate=0.01, b1=0.9, b2=b2, eps=1e-8,
                         weight_decay=wd, degenerated_to_sgd=sgd)
        want = numpy_radam_run(1.0, grads, 0.01, 0.9, b2, 1e-8, wd, sgd)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_no_update_before_warmup():
    """With degenerated_to_sgd=False and b2=0.99, steps 1-5 leave params fixed
    (N_sma < 5), matching the reference's silent warmup."""
    got = _run_optax(1.0, [1.0] * 6, learning_rate=0.1, b1=0.9, b2=0.99,
                     eps=1e-8, weight_decay=0.0, degenerated_to_sgd=False)
    assert all(abs(v - 1.0) < 1e-7 for v in got[:5])
    assert abs(got[5] - 1.0) > 1e-4


def test_schedule_callable():
    lrs = []
    def sched(step):
        return 0.01 * (0.1 ** (step / 10.0))
    got = _run_optax(1.0, [0.1] * 8, learning_rate=sched, b1=0.9, b2=0.9,
                     eps=1e-8, weight_decay=0.0, degenerated_to_sgd=True)
    assert got[-1] < 1.0  # moved

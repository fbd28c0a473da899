"""SH + positional encoders vs closed-form numpy golden values."""
import numpy as np
import jax.numpy as jnp

from hashnerf_tpu.ops.sh_encoding import sh_encode, sh_out_dim
from hashnerf_tpu.ops.positional import PositionalConfig, positional_encode


def test_sh_dims():
    d = jnp.array([[0.0, 0.0, 1.0]])
    for deg in range(1, 6):
        assert sh_encode(d, deg).shape == (1, sh_out_dim(deg))


def test_sh_degree1_constant():
    d = np.random.default_rng(0).normal(size=(10, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d), 1))
    np.testing.assert_allclose(out, 0.28209479177387814, rtol=1e-6)


def test_sh_band1_golden():
    # Y_1^{-1} = -C1*y, Y_1^0 = C1*z, Y_1^1 = -C1*x (reference ordering)
    C1 = 0.4886025119029199
    d = np.array([[0.3, -0.5, 0.8]], np.float32)
    out = np.asarray(sh_encode(jnp.asarray(d), 2))[0]
    np.testing.assert_allclose(out[1], -C1 * -0.5, rtol=1e-6)
    np.testing.assert_allclose(out[2], C1 * 0.8, rtol=1e-6)
    np.testing.assert_allclose(out[3], -C1 * 0.3, rtol=1e-6)


def test_sh_degree4_orthonormality():
    """Monte-Carlo check: int Y_i Y_j dOmega ~ delta_ij (real SH basis)."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(d.astype(np.float32)), 4))
    G = 4 * np.pi * (Y.T @ Y) / d.shape[0]
    np.testing.assert_allclose(G, np.eye(16), atol=0.06)


def test_positional_out_dim_and_values():
    cfg = PositionalConfig(num_freqs=4, max_freq_log2=3)
    assert cfg.out_dim == 3 + 2 * 4 * 3
    x = np.array([[0.1, -0.2, 0.3]], np.float32)
    out = np.asarray(positional_encode(jnp.asarray(x), cfg))[0]
    np.testing.assert_allclose(out[:3], x[0], rtol=1e-6)
    # first band f=1: sin(x), cos(x)
    np.testing.assert_allclose(out[3:6], np.sin(x[0]), rtol=1e-6)
    np.testing.assert_allclose(out[6:9], np.cos(x[0]), rtol=1e-6)
    # last band f=8
    np.testing.assert_allclose(out[-3:], np.cos(8 * x[0]), rtol=1e-5)


def test_positional_linear_sampling():
    cfg = PositionalConfig(num_freqs=3, max_freq_log2=2, log_sampling=False)
    assert np.allclose(cfg.freq_bands, [1.0, 2.5, 4.0])

"""Native (C++) ray-pool builder vs the numpy reference implementation."""
import numpy as np
import pytest

from hashnerf_tpu import native
from hashnerf_tpu.data.synthetic import make_synthetic_scene


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(H=16, W=20, n_train=3, n_test=1)


def test_native_builds():
    assert native.native_available(), "C++ toolchain should be present in CI image"


def test_pool_matches_numpy_unshuffled(scene):
    got = native.build_ray_pool(scene.poses, scene.images, scene.K, shuffle=False)
    want = native._numpy_build(
        np.ascontiguousarray(scene.poses[:, :3, :4], np.float32),
        scene.images.astype(np.float32),
        scene.K.astype(np.float32),
        0,
        False,
    )
    assert got.shape == want.shape == (5 * 16 * 20, 3, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pool_shuffle_is_permutation(scene):
    plain = native.build_ray_pool(scene.poses, scene.images, scene.K, shuffle=False)
    shuf = native.build_ray_pool(scene.poses, scene.images, scene.K, seed=3, shuffle=True)
    assert not np.array_equal(plain, shuf)
    a = np.sort(plain.reshape(plain.shape[0], -1), axis=0)
    b = np.sort(shuf.reshape(shuf.shape[0], -1), axis=0)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_shuffle_rows_permutation(scene):
    pool = native.build_ray_pool(scene.poses, scene.images, scene.K, shuffle=False)
    out = native.shuffle_rows(pool, seed=7)
    assert out.shape == pool.shape
    assert not np.array_equal(out, pool)
    np.testing.assert_allclose(
        np.sort(out.reshape(out.shape[0], -1), 0),
        np.sort(pool.reshape(pool.shape[0], -1), 0),
        rtol=1e-6,
    )


def test_deterministic_seed(scene):
    a = native.build_ray_pool(scene.poses, scene.images, scene.K, seed=11)
    b = native.build_ray_pool(scene.poses, scene.images, scene.K, seed=11)
    np.testing.assert_array_equal(a, b)

"""Ray generation and NDC warp tests."""
import numpy as np
import jax.numpy as jnp

from hashnerf_tpu.ops.rays import (
    get_rays,
    get_rays_np,
    get_ndc_rays,
    get_directions,
    ray_from_directions,
)
from hashnerf_tpu.ops.bbox import get_bbox3d_for_blenderobj


def _K(H, W, focal):
    return np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])


def test_get_rays_matches_numpy():
    H, W, focal = 12, 16, 20.0
    K = _K(H, W, focal)
    c2w = np.eye(4)[:3, :4].astype(np.float32)
    o_j, d_j = get_rays(H, W, K, c2w)
    o_n, d_n = get_rays_np(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(o_j), o_n, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_j), d_n, atol=1e-5)


def test_center_pixel_looks_down_minus_z():
    H = W = 10
    K = _K(H, W, 50.0)
    c2w = np.eye(4)[:3, :4]
    _, d = get_rays(H, W, K, c2w)
    center = np.asarray(d)[H // 2, W // 2]
    assert center[2] == -1.0
    assert abs(center[0]) < 0.02 and abs(center[1]) < 0.02


def test_ray_origins_are_camera_position():
    H = W = 4
    K = _K(H, W, 10.0)
    c2w = np.array([[1, 0, 0, 1.5], [0, 1, 0, -2.0], [0, 0, 1, 3.0]], np.float32)
    o, _ = get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(o)[0, 0], [1.5, -2.0, 3.0], atol=1e-6)


def test_ndc_bounds_forward_facing():
    """NDC-warped points at z in [near, inf) land in z' in [-1, 1]."""
    H, W, focal = 10, 10, 15.0
    o = np.zeros((5, 3), np.float32)
    o[:, 2] = 1.0  # camera above near plane
    d = np.array([[0.1, 0.0, -1.0]] * 5, np.float32)
    no, nd = get_ndc_rays(H, W, focal, 1.0, jnp.asarray(o), jnp.asarray(d))
    no, nd = np.asarray(no), np.asarray(nd)
    # at t=0 (near plane): z' = 1 + 2*near/oz where oz = -near => -1
    np.testing.assert_allclose(no[:, 2], -1.0, atol=1e-5)
    # at t=1 (infinity): z' = o2 + d2 = 1
    np.testing.assert_allclose(no[:, 2] + nd[:, 2], 1.0, atol=1e-5)


def test_ray_from_directions_normalized():
    dirs = get_directions(8, 8, 10.0)
    c2w = np.eye(4)[:3, :4].astype(np.float32)
    o, d = ray_from_directions(dirs, c2w)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert o.shape == d.shape == (64, 3)


def test_blender_bbox_contains_origin():
    """A ring of inward-looking cameras at r=4 must produce a bbox around 0."""
    frames = []
    for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        c, s = np.cos(ang), np.sin(ang)
        # camera at (4c, 4s, 0) looking at origin: -z axis toward origin
        fwd = -np.array([c, s, 0.0])
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, -fwd)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2] = right, up, -fwd
        m[:3, 3] = [4 * c, 4 * s, 0]
        frames.append({"transform_matrix": m.tolist()})
    transforms = {"camera_angle_x": 0.8, "frames": frames}
    bmin, bmax = get_bbox3d_for_blenderobj(transforms, 64, 64, near=2.0, far=6.0)
    assert np.all(bmin < 0) and np.all(bmax > 0)
    assert np.all(bmax - bmin > 2.0)


def test_ray_aabb_near_far():
    import jax.numpy as jnp
    from hashnerf_tpu.ops.rays import ray_aabb_near_far

    bbox = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 4.0], [3.0, 3.0, 4.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    near = jnp.full((3,), 2.0)
    far = jnp.full((3,), 6.0)
    n2, f2 = ray_aabb_near_far(o, d, bbox, near, far)
    # ray 0 passes through the box: [3, 5]
    np.testing.assert_allclose(np.asarray(n2[0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f2[0]), 5.0, rtol=1e-5)
    # ray 1 points away: degenerate interval at near
    assert float(f2[1] - n2[1]) < 0.01
    # ray 2 misses laterally: degenerate
    assert float(f2[2] - n2[2]) < 0.01
    # intervals stay ordered and inside [near, far]
    assert float(n2.min()) >= 2.0 and float(f2.max()) <= 6.0


def test_aabb_clip_training_is_finite_and_learns():
    import jax.numpy as jnp
    from hashnerf_tpu.data.synthetic import make_synthetic_scene
    from hashnerf_tpu.train.driver import Trainer
    from tests.test_train_e2e import tiny_args

    scene = make_synthetic_scene(H=24, W=24, n_train=3, n_test=1)
    args = tiny_args(N_rand=64, N_samples=8, N_importance=8)
    args.aabb_clip = True
    t = Trainer(args, scene)
    assert t.render_cfg.aabb_clip
    m1 = t.run_steps(8, block_size=4)
    m2 = t.run_steps(56, block_size=8)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["psnr"]) > float(m1["psnr"])

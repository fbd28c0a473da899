"""Scanned multi-step trainer: K optimizer steps fused into one lax.scan
dispatch (driver.Trainer.run_steps) must train equivalently to the host loop.

The reference has no analogue (its loop is one CUDA dispatch stream per op);
this is the TPU-native replacement for per-step host dispatch.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; default run: -m "not slow"

from hashnerf_tpu.data.synthetic import make_synthetic_scene
from hashnerf_tpu.train.config import config_parser
from hashnerf_tpu.train.driver import Trainer, train_loop


def tiny_args(**kw):
    args = config_parser().parse_args([])
    args.N_rand = 32
    args.N_samples = 8
    args.N_importance = 8
    args.finest_res = 32
    args.log2_hashmap_size = 10
    args.netwidth = 16
    args.netwidth_fine = 16
    args.use_viewdirs = True
    args.white_bkgd = True
    args.no_batching = True
    args.precrop_iters = 0
    for k, v in kw.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(H=16, W=16, n_train=3, n_test=1)


def test_run_steps_advances_and_is_finite(scene):
    t = Trainer(tiny_args(), scene)
    m = t.run_steps(10, block_size=5)
    assert t.global_step == 10
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["psnr"]))


def test_run_steps_crosses_tv_boundary(scene):
    """A span straddling iter 1000 must split into TV and no-TV blocks."""
    t = Trainer(tiny_args(), scene)
    t.global_step = 997
    m = t.run_steps(8, block_size=8)
    assert t.global_step == 1005
    assert np.isfinite(float(m["loss"]))


def test_run_steps_with_occupancy(scene):
    args = tiny_args(use_occupancy=True, occ_warmup=4, occ_update_every=4,
                     occ_keep_fraction=0.5, occ_resolution=16)
    t = Trainer(args, scene)
    m = t.run_steps(16, block_size=8)
    assert t.global_step == 16
    assert np.isfinite(float(m["loss"]))
    # grid received updates inside the scanned blocks
    assert float(np.asarray(t.occ_grid).max()) >= 0.0


def test_run_steps_matches_host_loop_loss_scale(scene):
    """Same model/key trained 30 steps scanned vs 30 host steps: both must
    reduce the loss to the same ballpark (RNG streams differ by design)."""
    t_scan = Trainer(tiny_args(), scene)
    m_scan = t_scan.run_steps(30, block_size=10)

    t_host = Trainer(tiny_args(), scene)
    rng = np.random.default_rng(0)
    for _ in range(30):
        img_i = int(rng.choice(scene.i_train))
        batch = t_host.sample_image(img_i, t_host.args.N_rand, precrop=False)
        m_host = t_host.step(batch)

    l_scan, l_host = float(m_scan["loss"]), float(m_host["loss"])
    assert np.isfinite(l_scan) and np.isfinite(l_host)
    assert l_scan < 1.0 and l_host < 1.0


def test_train_loop_scanned(tmp_path, scene):
    args = tiny_args(steps_per_dispatch=8)
    args.basedir = str(tmp_path)
    args.expname = "scan_e2e"
    args.i_print = 20
    args.i_weights = 10**9
    args.i_video = 10**9
    args.i_testset = 10**9
    args.N_iters = 40
    logs = []
    trainer = train_loop(args, scene, log_fn=logs.append)
    assert trainer.global_step == 40
    assert any("Iter: 40" in str(l) for l in logs)


def test_run_steps_pool_consumes_sequentially(scene):
    """Pool-scanned path (st3d / batching mode): trains, advances the step
    counter, and consumes pool[offset:offset+n*N_rand] exactly like the
    sequential host loop's slicing."""
    import jax
    import jax.numpy as jnp

    t = Trainer(tiny_args(), scene)
    n_rand = t.args.N_rand
    n_pool = n_rand * 12
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((n_pool, 3)) + jnp.array([0.0, 0.0, 4.0])
    d = jax.random.normal(key, (n_pool, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pool = {
        "rays_o": o,
        "rays_d": d,
        "target": jax.random.uniform(key, (n_pool, 3)),
    }
    m = t.run_steps_pool(pool, 0, 8, block_size=4)
    assert t.global_step == 8
    assert np.isfinite(float(m["loss"]))
    # remaining pool span fits 4 more steps from offset 8*n_rand
    m = t.run_steps_pool(pool, 8 * n_rand, 4, block_size=4)
    assert t.global_step == 12
    assert np.isfinite(float(m["loss"]))


def test_train_loop_batching_scanned(tmp_path, scene):
    """train_loop with use_batching + steps_per_dispatch>1 routes through the
    pool-scanned path, crossing epoch boundaries."""
    args = tiny_args(no_batching=False, steps_per_dispatch=4)
    args.basedir = str(tmp_path)
    args.expname = "pool_scan"
    args.N_iters = 30
    args.i_print = 10
    args.i_weights = 10**9
    args.i_video = 10**9
    args.i_testset = 10**9
    trainer = train_loop(args, scene, n_iters=30)
    assert trainer.global_step == 30


def test_run_steps_pool_with_occupancy(scene):
    """--use_occupancy in the pool path: the grid is maintained inside the
    scanned block (warmup -> populated) and culling-mode blocks compile
    (round-2 regression: the pool path silently ignored occupancy)."""
    import jax
    import jax.numpy as jnp

    t = Trainer(tiny_args(use_occupancy=True, occ_warmup=4,
                          occ_update_every=2, occ_keep_fraction=0.5,
                          occ_resolution=16))
    t.scene = scene
    t.__post_init__()
    n_rand = t.args.N_rand
    n_pool = n_rand * 32
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((n_pool, 3)) + jnp.array([0.0, 0.0, 4.0])
    d = jax.random.normal(key, (n_pool, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pool = {
        "rays_o": o, "rays_d": d,
        "target": jax.random.uniform(key, (n_pool, 3)),
    }
    m = t.run_steps_pool(pool, 0, 8, block_size=4)
    assert t.global_step == 8
    assert np.isfinite(float(m["loss"]))
    # the scanned update segments must have populated the grid
    assert float(jnp.max(t.occ_grid)) >= 0.0
    # culling mode (grid ready) also compiles and runs
    t._occ_ready = True
    m = t.run_steps_pool(pool, 8 * n_rand, 4, block_size=4)
    assert t.global_step == 12
    assert np.isfinite(float(m["loss"]))


def test_keep_schedule_anneals_across_blocks(scene):
    """--occ_keep_schedule must split blocks at anneal boundaries and build
    per-keep compiled programs; training stays finite across transitions."""
    args = tiny_args(use_occupancy=True, occ_warmup=4, occ_update_every=4,
                     occ_keep_fraction=0.5, occ_resolution=16,
                     occ_keep_schedule="0:0.5,8:0.25,16:0.125")
    t = Trainer(args, scene)
    assert t.keep_schedule == [(0, 0.5), (8, 0.25), (16, 0.125)]
    assert t._keep_at(0) == (0.5, 8)
    assert t._keep_at(8) == (0.25, 16)
    assert t._keep_at(99) == (0.125, None)
    m = t.run_steps(24, block_size=24)
    assert t.global_step == 24
    assert np.isfinite(float(m["loss"]))
    # distinct compiled blocks for distinct keeps once culling is active
    keeps = {k[4] for k in t._block_cache if k[2] == "cull"}
    assert len(keeps) >= 2


def test_cumsum_partition_trains(scene):
    args = tiny_args(use_occupancy=True, occ_warmup=4, occ_update_every=4,
                     occ_keep_fraction=0.5, occ_resolution=16,
                     occ_partition="cumsum", occ_adaptive_update=True,
                     fast_merge=True)
    t = Trainer(args, scene)
    m = t.run_steps(12, block_size=4)
    assert t.global_step == 12
    assert np.isfinite(float(m["loss"]))

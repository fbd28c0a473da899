"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hashnerf_tpu.parallel.mesh import make_mesh, shard_rays, replicate
from hashnerf_tpu.parallel.train_sharded import (
    make_sharded_train_step,
    shard_train_batch,
)
from hashnerf_tpu.data.synthetic import make_synthetic_scene
from hashnerf_tpu.train.driver import Trainer, make_loss_fn
from tests.test_train_e2e import tiny_args


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh(4)
    assert mesh2.shape == {"data": 4}


def test_sharded_batch_placement():
    mesh = make_mesh(8)
    batch = {"rays_o": np.zeros((64, 3), np.float32)}
    out = shard_train_batch(mesh, batch)
    sh = out["rays_o"].sharding
    assert sh.is_equivalent_to(NamedSharding(mesh, P("data")), 2)


@pytest.fixture(scope="module")
def sharded_setup():
    scene = make_synthetic_scene(H=32, W=32, n_train=4, n_test=1)
    args = tiny_args(N_rand=128, N_samples=8, N_importance=4, chunk=1024)
    trainer = Trainer(args, scene)
    loss_fn = make_loss_fn(
        args, trainer.render_cfg, trainer.query_fn, trainer.bbox,
        trainer.model_cfg.hash_grid,
    )
    return scene, args, trainer, loss_fn


def test_sharded_step_runs_and_is_finite(sharded_setup):
    scene, args, trainer, loss_fn = sharded_setup
    mesh = make_mesh(8)
    compile_for = make_sharded_train_step(mesh, loss_fn, trainer.optimizer)

    batch = trainer.sample_image(int(scene.i_train[0]), 128, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = shard_train_batch(mesh, batch)

    step = compile_for(trainer.state, trainer.opt_state, batch)
    state, opt_state, metrics = step(
        trainer.state, trainer.opt_state, batch, jax.random.PRNGKey(0), jnp.float32(1e-6)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated
    assert state.hash_table.sharding.is_fully_replicated


def test_sharded_matches_single_device(sharded_setup):
    """Same batch + key: the 8-way sharded step must produce the same loss
    and (numerically close) updated params as the single-device step."""
    scene, args, trainer, loss_fn = sharded_setup
    batch = trainer.sample_image(int(scene.i_train[0]), 128, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(7)
    tvw = jnp.float32(1e-6)

    # single-device
    s1, o1, m1 = trainer._train_step(trainer.state, trainer.opt_state, batch, key, tvw)

    mesh = make_mesh(8)
    sbatch = shard_train_batch(mesh, batch)
    step = make_sharded_train_step(mesh, loss_fn, trainer.optimizer)(
        trainer.state, trainer.opt_state, sbatch
    )
    s8, o8, m8 = step(trainer.state, trainer.opt_state, sbatch, key, tvw)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.hash_table), np.asarray(s8.hash_table), rtol=1e-5, atol=1e-8
    )


def test_num_devices_flag_scanned_path_matches_single_device():
    """--num_devices 8 must be a real flag: the Trainer builds the mesh and
    the SCANNED block path (run_steps) produces the same losses as
    single-device (same keys, same on-device sampling; sharding only changes
    reduction order)."""
    scene = make_synthetic_scene(H=32, W=32, n_train=4, n_test=1)
    args1 = tiny_args(N_rand=128, N_samples=8, N_importance=4, chunk=1024)
    args8 = tiny_args(N_rand=128, N_samples=8, N_importance=4, chunk=1024)
    args8.num_devices = 8

    t1 = Trainer(args1, scene, key=jax.random.PRNGKey(3))
    t8 = Trainer(args8, scene, key=jax.random.PRNGKey(3))
    assert t8.mesh is not None and t8.mesh.shape == {"data": 8}
    assert t1.mesh is None

    m1 = t1.run_steps(4, block_size=2)
    m8 = t8.run_steps(4, block_size=2)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(t1.state.hash_table), np.asarray(t8.state.hash_table),
        rtol=1e-4, atol=1e-7,
    )
    # per-ray compute really is distributed: the batch constraint leaves the
    # params replicated
    assert t8.state.hash_table.sharding.is_fully_replicated


def test_num_devices_validation():
    scene = make_synthetic_scene(H=16, W=16, n_train=2, n_test=1)
    args = tiny_args(N_rand=100, N_samples=8, N_importance=0, chunk=1024)
    args.num_devices = 8  # 100 % 8 != 0
    with pytest.raises(ValueError):
        Trainer(args, scene)


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_scaling_harness_runs():
    from hashnerf_tpu.tools.bench_scaling import measure

    res = measure([1, 2], n_rand=64, n_iters=1, n_samples=8, n_importance=4)
    assert len(res) == 2
    assert res[0]["devices"] == 1 and res[1]["devices"] == 2
    assert all(r["rays_per_s"] > 0 for r in res)


def test_dp_zero_matches_single_device_fp32():
    """ZeRO-1 step (fp32 wire) with deterministic rendering must reproduce
    the single-device optimizer step bit-for-bit (up to fp reassociation):
    all-gather(master) -> grads -> reduce-scatter -> RAdam-on-shard is an
    exact refactoring of the replicated update."""
    from hashnerf_tpu.parallel.train_sharded import (
        chunk_params, init_dp_zero, make_dp_zero_train_step, unchunk_params,
    )

    scene = make_synthetic_scene(H=32, W=32, n_train=4, n_test=1)
    args = tiny_args(N_rand=128, N_samples=8, N_importance=4, chunk=1024)
    args.perturb = 0.0
    args.raw_noise_std = 0.0
    t = Trainer(args, scene, key=jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(
        args, t.render_cfg, t.query_fn, t.bbox, t.model_cfg.hash_grid,
        with_tv=False,
    )
    mesh = make_mesh(8)
    build = make_dp_zero_train_step(
        mesh, loss_fn, t.optimizer,
        grad_dtype=jnp.float32, broadcast_dtype=jnp.float32,
    )
    master, zopt = init_dp_zero(mesh, t.state, t.optimizer)
    step = build(t.state, zopt)

    batch = t.sample_image(int(scene.i_train[0]), 128, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    key = jax.random.PRNGKey(3)
    master2, zopt2, m = step(master, zopt, dict(batch), key, jnp.float32(0.0))
    assert np.isfinite(float(m["loss"]))

    # single-device oracle (same params, same deterministic batch)
    s_ref, o_ref, m_ref = t._train_step_no_tv(
        t.state, t.opt_state, batch, key, jnp.float32(0.0), None
    )
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    got = unchunk_params(jax.tree_util.tree_map(np.asarray, master2), t.state)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-6)
    # ZeRO: moments are sharded (1/8 per device), never replicated
    for leaf in jax.tree_util.tree_leaves(zopt2):
        if getattr(leaf, "ndim", 0) == 2:
            assert leaf.sharding.spec == P("data", None)


def test_dp_zero_bf16_wire_trains():
    """bf16 reduce-scatter + bf16 param broadcast: finite, loss tracks the
    fp32 path closely (forward-only bf16; fp32 masters keep precision)."""
    from hashnerf_tpu.parallel.train_sharded import (
        init_dp_zero, make_dp_zero_train_step,
    )

    scene = make_synthetic_scene(H=32, W=32, n_train=4, n_test=1)
    args = tiny_args(N_rand=128, N_samples=8, N_importance=4, chunk=1024)
    args.perturb = 0.0
    t = Trainer(args, scene, key=jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(
        args, t.render_cfg, t.query_fn, t.bbox, t.model_cfg.hash_grid,
        with_tv=False,
    )
    mesh = make_mesh(8)
    build = make_dp_zero_train_step(mesh, loss_fn, t.optimizer)
    master, zopt = init_dp_zero(mesh, t.state, t.optimizer)
    step = build(t.state, zopt)
    batch = t.sample_image(int(scene.i_train[0]), 128, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    losses = []
    key = jax.random.PRNGKey(3)
    # bf16 param broadcast rounds away sub-ulp updates, so the loss moves in
    # steps (fp32 masters keep accumulating between visible drops) — give it
    # a few iterations.
    for i in range(8):
        master, zopt, m = step(master, zopt, dict(batch), key,
                               jnp.float32(0.0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # optimizing on a fixed batch


def test_sharded_step_per_ray_flagship():
    """The per-ray flagship execution set (occupancy + per-ray cull + packed
    layout + aabb clip) compiles and runs data-parallel on the virtual mesh:
    every per-ray op (score gather, per-ray top-K, compacted composite) is
    ray-axis local, so no cross-ray collective appears."""
    scene = make_synthetic_scene(H=32, W=32, n_train=4, n_test=1)
    args = tiny_args(N_rand=128, N_samples=16, N_importance=16, chunk=1024)
    args.use_occupancy = True
    args.occ_per_ray = True
    args.occ_keep_fraction = 0.25
    args.occ_keep_coarse = 0.5
    args.occ_warmup = 0
    args.aabb_clip = True
    trainer = Trainer(args, scene)
    loss_fn = make_loss_fn(
        args, trainer.render_cfg, trainer.query_fn, trainer.bbox,
        trainer.model_cfg.hash_grid,
    )
    mesh = make_mesh(8)
    compile_for = make_sharded_train_step(
        mesh, loss_fn, trainer.optimizer, with_occ=True
    )

    batch = trainer.sample_image(int(scene.i_train[0]), 128, precrop=False)
    d = batch["rays_d"]
    batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = shard_train_batch(mesh, batch)

    step = compile_for(trainer.state, trainer.opt_state, batch)
    state, opt_state, metrics = step(
        trainer.state, trainer.opt_state, batch, jax.random.PRNGKey(0),
        jnp.float32(1e-6), trainer.occ_grid,
    )
    assert np.isfinite(float(metrics["loss"]))

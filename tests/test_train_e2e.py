"""End-to-end: train on the procedural scene, PSNR must improve."""
import argparse

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; default run: -m "not slow"

from hashnerf_tpu.data.synthetic import make_synthetic_scene
from hashnerf_tpu.train.config import config_parser
from hashnerf_tpu.train.driver import Trainer


def tiny_args(**overrides):
    args = config_parser().parse_args([])
    args.N_rand = 256
    args.N_samples = 16
    args.N_importance = 8
    args.lrate = 0.01
    args.lrate_decay = 10
    args.use_viewdirs = True
    args.finest_res = 64
    args.log2_hashmap_size = 13
    args.white_bkgd = True
    args.no_batching = True
    args.chunk = 4096
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(H=48, W=48, n_train=6, n_test=2)


def test_training_improves_psnr(scene):
    args = tiny_args()
    trainer = Trainer(args, scene)
    rng = np.random.default_rng(0)

    psnrs = []
    for i in range(60):
        img_i = int(rng.choice(scene.i_train))
        batch = trainer.sample_image(img_i, args.N_rand, precrop=False)
        metrics = trainer.step(batch)
        psnrs.append(float(metrics["psnr"]))
        assert np.isfinite(psnrs[-1]), f"non-finite psnr at step {i}"

    early = np.mean(psnrs[:10])
    late = np.mean(psnrs[-10:])
    assert late > early + 2.0, f"PSNR did not improve: {early:.2f} -> {late:.2f}"


def test_eval_render_shapes(scene):
    args = tiny_args()
    trainer = Trainer(args, scene)
    rgb, depth, acc, extras = trainer.render_image(scene.poses[scene.i_test[0]])
    assert rgb.shape == (scene.H, scene.W, 3)
    assert depth.shape == (scene.H, scene.W)
    assert np.isfinite(np.asarray(rgb)).all()


def test_checkpoint_roundtrip(tmp_path, scene):
    args = tiny_args()
    trainer = Trainer(args, scene)
    batch = trainer.sample_image(int(scene.i_train[0]), args.N_rand, precrop=False)
    trainer.step(batch)
    path = str(tmp_path / "000001.ckpt")
    trainer.save(path)

    trainer2 = Trainer(args, scene)
    assert trainer2.try_restore(str(tmp_path))
    assert trainer2.global_step == trainer.global_step
    a = np.asarray(trainer.state.hash_table)
    b = np.asarray(trainer2.state.hash_table)
    np.testing.assert_array_equal(a, b)


def test_batching_pool_mode(scene):
    args = tiny_args(no_batching=False)
    trainer = Trainer(args, scene)
    pool = trainer.build_ray_pool()
    assert pool.shape[1:] == (3, 3)
    batch = trainer.sample_pool(pool, 0, args.N_rand)
    metrics = trainer.step(batch)
    assert np.isfinite(float(metrics["loss"]))


def test_precrop_sampling(scene):
    args = tiny_args(precrop_iters=10)
    trainer = Trainer(args, scene)
    batch = trainer.sample_image(int(scene.i_train[0]), 64, precrop=True)
    assert batch["rays_o"].shape == (64, 3)
    metrics = trainer.step(batch)
    assert np.isfinite(float(metrics["loss"]))


def test_tv_all_levels_matches_per_level():
    import jax
    import jax.numpy as jnp
    from hashnerf_tpu.train.losses import (
        total_variation_loss,
        total_variation_loss_all_levels,
    )

    key = jax.random.PRNGKey(5)
    L, T, F = 4, 1 << 12, 2
    table = jax.random.normal(jax.random.PRNGKey(1), (L, T, F)) * 0.01
    got = float(total_variation_loss_all_levels(key, table, 16, 64, 12))
    keys = jax.random.split(key, L)
    want = sum(
        float(total_variation_loss(keys[l], table[l], 16, 64, l, 12, L))
        for l in range(L)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_eval_keep_budget(scene):
    """--occ_keep_eval: eval renders use the LOOSE eval-only budget (not the
    training budgets) once the grid is populated; maps stay finite and close
    to the exact eval (VERDICT r4 next #5, PSNR-neutral eval accelerator)."""
    import jax.numpy as jnp

    args = tiny_args(
        use_occupancy=True, occ_resolution=32, occ_update_every=4,
        occ_warmup=8, occ_keep_fraction=0.25, occ_keep_coarse=0.5,
        occ_block=8, N_samples=16, N_importance=16,
    )
    args.occ_keep_eval = 0.75
    trainer = Trainer(args, scene)
    ecfg = trainer.render_cfg.eval_mode().occupancy
    assert ecfg.keep_fraction == 0.75 and ecfg.keep_fraction_coarse is None

    rng = np.random.default_rng(0)
    for _ in range(16):
        img_i = int(rng.choice(scene.i_train))
        trainer.step(trainer.sample_image(img_i, args.N_rand, precrop=False))
    assert trainer._occ_ready
    assert trainer._eval_occ_grid is not None

    pose = scene.poses[scene.i_test[0]]
    rgb_budget, depth_b, _, _ = trainer.render_image(pose)
    assert np.all(np.isfinite(np.asarray(rgb_budget)))

    # exact-eval control: same field, no eval grid
    import dataclasses

    saved = trainer.render_cfg
    trainer.render_cfg = dataclasses.replace(
        saved,
        occupancy=dataclasses.replace(saved.occupancy, keep_fraction_eval=None),
    )
    rgb_exact, _, _, _ = trainer.render_image(pose)
    trainer.render_cfg = saved
    # loose budget on a (briefly) trained field: images nearly identical
    mse = float(np.mean(np.square(np.asarray(rgb_budget) - np.asarray(rgb_exact))))
    assert mse < 5e-3, f"eval budget diverged from exact: mse {mse}"


def test_eval_transmittance_cull(scene):
    """--occ_eval_transmittance: the T<1e-3 threshold path compiles, renders
    finite maps, and stays near the budget-only eval on a trained field
    (occluded samples it demotes contribute <0.1% to the composite)."""
    import dataclasses

    args = tiny_args(
        use_occupancy=True, occ_resolution=32, occ_update_every=4,
        occ_warmup=8, occ_keep_fraction=0.25, occ_keep_coarse=0.5,
        occ_block=8, N_samples=16, N_importance=16,
    )
    args.occ_keep_eval = 0.5
    args.occ_eval_transmittance = True
    trainer = Trainer(args, scene)
    assert trainer.render_cfg.eval_mode().occupancy.transmittance_cull
    assert not trainer.render_cfg.occupancy.transmittance_cull  # train: off

    rng = np.random.default_rng(0)
    for _ in range(16):
        img_i = int(rng.choice(scene.i_train))
        trainer.step(trainer.sample_image(img_i, args.N_rand, precrop=False))

    pose = scene.poses[scene.i_test[0]]
    rgb_t, _, _, _ = trainer.render_image(pose)
    assert np.all(np.isfinite(np.asarray(rgb_t)))

    saved = trainer.render_cfg
    trainer.render_cfg = dataclasses.replace(
        saved,
        occupancy=dataclasses.replace(saved.occupancy, eval_transmittance=False),
    )
    rgb_b, _, _, _ = trainer.render_image(pose)
    trainer.render_cfg = saved
    mse = float(np.mean(np.square(np.asarray(rgb_t) - np.asarray(rgb_b))))
    assert mse < 5e-3, f"transmittance threshold diverged from budget-only: {mse}"


def test_occ_score_stride_trains(scene):
    """--occ_score_stride 2 (dilated-grid strided scoring, the committed
    negative-result lever): still trains to finite, improving PSNR."""
    args = tiny_args(
        use_occupancy=True, occ_resolution=32, occ_update_every=4,
        occ_warmup=8, occ_keep_fraction=0.25, occ_keep_coarse=0.5,
        occ_block=8, occ_score_stride=2, N_samples=16, N_importance=16,
    )
    trainer = Trainer(args, scene)
    assert trainer.render_cfg.occupancy.score_stride == 2
    rng = np.random.default_rng(0)
    psnrs = []
    for _ in range(30):
        img_i = int(rng.choice(scene.i_train))
        m = trainer.step(trainer.sample_image(img_i, args.N_rand, precrop=False))
        psnrs.append(float(m["psnr"]))
        assert np.isfinite(psnrs[-1])
    assert np.mean(psnrs[-5:]) > np.mean(psnrs[:5])


def test_debug_check_finite(capsys):
    import jax.numpy as jnp
    from hashnerf_tpu.utils.debug import check_finite

    clean = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    assert check_finite(clean)
    dirty = {"a": jnp.array([1.0, jnp.nan]), "i": jnp.array([1, 2])}
    assert not check_finite(dirty, where="test:")
    assert "Numerical Error" in capsys.readouterr().out


def test_tpu_fast_preset_training(scene):
    """Flagship fast mode: preset flags -> shared net, L4/F8 packed table,
    occupancy+bbox culling — trains and improves PSNR like the parity path."""
    from hashnerf_tpu.train.config import parse_args

    args = parse_args(["--preset", "tpu-fast"])
    assert args.share_fine and args.use_occupancy and args.packed_layout
    # round-3 flagship shape: 4 levels x 8 features (measured best on BOTH
    # throughput and quality — BENCH_QUALITY_abl_L4F8)
    assert (args.n_levels, args.n_features_per_level) == (4, 8)
    # CLI flags override the preset
    args2 = parse_args(["--preset", "tpu-fast", "--n_levels", "8"])
    assert args2.n_levels == 8

    args = tiny_args(
        share_fine=True, n_levels=8, n_features_per_level=4,
        use_occupancy=True, occ_resolution=32, occ_update_every=4, occ_warmup=8,
        occ_keep_fraction=0.25,
    )
    trainer = Trainer(args, scene)
    assert trainer.state.fine is None  # shared network
    assert trainer.state.hash_table.shape[:1] == (8,)
    assert trainer.state.hash_table.shape[2:] == (4,)
    rng = np.random.default_rng(0)
    psnrs = []
    for i in range(50):
        img_i = int(rng.choice(scene.i_train))
        batch = trainer.sample_image(img_i, args.N_rand, precrop=False)
        m = trainer.step(batch)
        psnrs.append(float(m["psnr"]))
        assert np.isfinite(psnrs[-1])
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 1.5


@pytest.mark.parametrize(
    "L,F,log2T,finest,log2_blocks",
    [
        (4, 4, 14, 128, 11),   # round-3 flagship-ish shape
        (8, 2, 15, 256, 10),   # reference-like L/F split, deeper pyramid
        (4, 8, 16, 512, 12),   # flagship L4/F8 at full finest_res
    ],
)
def test_tv_packed_magnitude_matches_unpacked(L, F, log2T, finest, log2_blocks):
    """--tv-loss-weight must mean the same thing across table layouts
    (VERDICT r4 weak #5 / next #6): on an iid N(0, s) table both the packed
    TV (per-level row batches, normalization derived from _tv_level_geometry)
    and the reference-style per-level cuboid TV have expectation
    6*s^2*F*cube_size^2 per level, so their ratio must sit near 1 — asserted
    within 2x across THREE table shapes (sampling noise + the dense levels'
    exact-cube vs hashed-cube difference are the only slack)."""
    import jax
    from hashnerf_tpu.ops.packed_grid import PackedGridConfig, init_packed_tables
    from hashnerf_tpu.train.losses import (
        total_variation_loss_all_levels,
        total_variation_loss_packed,
    )

    pcfg = PackedGridConfig(
        n_levels=L, n_features_per_level=F, log2_hashmap_size=log2T,
        base_resolution=16, finest_resolution=finest, log2_blocks=log2_blocks,
    )
    key = jax.random.PRNGKey(0)
    tables = init_packed_tables(key, pcfg)
    # same element scale for both layouts: N(0, 0.01)
    tables = jax.tree_util.tree_map(
        lambda x: jax.random.normal(key, x.shape) * 0.01, tables
    )
    table_ref = jax.random.normal(key, (L, 1 << log2T, F)) * 0.01
    # average a few keys to separate the layout normalization from the
    # single-draw sampling noise of the random cuboids/row batches
    tv_packed = float(np.mean([
        float(total_variation_loss_packed(jax.random.PRNGKey(k), tables, pcfg))
        for k in range(4)
    ]))
    tv_ref = float(np.mean([
        float(total_variation_loss_all_levels(
            jax.random.PRNGKey(k), table_ref, 16, finest, log2T
        ))
        for k in range(4)
    ]))
    assert tv_packed > 0 and tv_ref > 0
    ratio = tv_packed / tv_ref
    assert 0.5 < ratio < 2.0, (
        f"TV magnitude mismatch at L={L} F={F} T=2^{log2T} "
        f"finest={finest}: packed/unpacked ratio {ratio:.3f}"
    )

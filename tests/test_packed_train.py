"""End-to-end training with the corner-packed layout (--packed_layout):
the full pipeline (packed encode -> render -> losses incl. packed TV ->
RAdam two-group update -> checkpoint roundtrip) on tiny shapes."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from hashnerf_tpu.data.synthetic import make_synthetic_scene
from hashnerf_tpu.train.config import config_parser
from hashnerf_tpu.train.driver import Trainer


def packed_args(**kw):
    args = config_parser().parse_args([])
    args.N_rand = 64
    args.N_samples = 8
    args.N_importance = 8
    args.finest_res = 32
    args.n_levels = 4
    args.n_features_per_level = 2
    # base res 16 -> resolutions (16, 20, 25, 32); 17^3=4913 <= 2^13 so
    # level 0 is dense, levels 1-3 block-hashed
    args.log2_hashmap_size = 13
    args.log2_blocks = 10
    args.packed_layout = True
    args.share_fine = True
    args.use_viewdirs = True
    args.white_bkgd = True
    args.no_batching = True
    args.precrop_iters = 0
    args.lrate = 0.01
    args.lrate_decay = 10
    for k, v in kw.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(H=24, W=24, n_train=3, n_test=1)


def test_packed_state_structure(scene):
    t = Trainer(packed_args(), scene)
    assert isinstance(t.state.hash_table, dict)
    assert set(t.state.hash_table) == {"dense", "fine"}


def test_packed_training_reduces_loss(scene):
    t = Trainer(packed_args(), scene)
    losses = []
    for _ in range(12):
        m = t.step(t._host_sample(False))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # both packed tables actually moved (gradients reached them)
    tbl = t.state.hash_table
    assert float(jnp.abs(tbl["dense"]).max()) > 1e-4  # init range is 1e-4
    assert float(jnp.abs(tbl["fine"]).max()) > 1e-4


def test_packed_run_steps_scanned(scene):
    """Scanned blocks (+ occupancy lifecycle) compile and run with packed."""
    args = packed_args(use_occupancy=True, occ_warmup=4,
                       occ_update_every=2, occ_keep_fraction=0.5,
                       occ_resolution=16)
    t = Trainer(args, scene)
    m = t.run_steps(8, block_size=4)
    assert np.isfinite(float(m["loss"]))
    # force culling-mode compilation too
    t._occ_ready = True
    m = t.run_steps(4, block_size=4)
    assert np.isfinite(float(m["loss"]))


def test_packed_checkpoint_roundtrip(tmp_path, scene):
    t = Trainer(packed_args(), scene)
    t.step(t._host_sample(False))
    p = os.path.join(tmp_path, "000001.ckpt")
    t.save(p)
    t2 = Trainer(packed_args(), scene)
    assert t2.try_restore(str(tmp_path))
    for k in ("dense", "fine"):
        np.testing.assert_array_equal(
            np.asarray(t.state.hash_table[k]), np.asarray(t2.state.hash_table[k])
        )
    assert t2.global_step == t.global_step


def test_packed_render_image(scene):
    t = Trainer(packed_args(), scene)
    rgb, depth, acc, _ = t.render_image(scene.poses[scene.i_test[0]])
    assert rgb.shape == (scene.H, scene.W, 3)
    assert np.isfinite(np.asarray(rgb)).all()

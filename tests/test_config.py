"""Config parser + expname tests (reference-flag compatibility)."""
import os

from hashnerf_tpu.train.config import parse_args, config_parser, create_expname


def test_defaults_match_reference():
    args = config_parser().parse_args([])
    # reference run_nerf.py:33-169 defaults
    assert args.netdepth == 8 and args.netwidth == 256
    assert args.N_rand == 4096
    assert args.lrate == 5e-4 and args.lrate_decay == 250
    assert args.chunk == 32768 and args.netchunk == 65536
    assert args.N_samples == 64 and args.N_importance == 0
    assert args.i_embed == 1 and args.i_embed_views == 2
    assert args.multires == 10 and args.multires_views == 4
    assert args.finest_res == 512 and args.log2_hashmap_size == 19
    assert args.sparse_loss_weight == 1e-10 and args.tv_loss_weight == 1e-6
    assert args.i_print == 100 and args.i_weights == 10000
    assert args.testskip == 8 and args.factor == 8 and args.llffhold == 8


def test_config_file_reference_format(tmp_path):
    """Parse a config in the reference's configs/*.txt format."""
    cfg = tmp_path / "chair.txt"
    cfg.write_text(
        "expname = blender_chair\n"
        "basedir = ./logs\n"
        "datadir = ./data/nerf_synthetic/chair\n"
        "dataset_type = blender\n"
        "no_batching = True\n"
        "use_viewdirs = True\n"
        "white_bkgd = True\n"
        "lrate_decay = 500\n"
        "N_samples = 64\n"
        "N_importance = 128\n"
        "N_rand = 1024\n"
        "precrop_iters = 500\n"
        "precrop_frac = 0.5\n"
        "half_res = True\n"
    )
    args = parse_args(["--config", str(cfg)])
    assert args.expname == "blender_chair"
    assert args.dataset_type == "blender"
    assert args.no_batching and args.use_viewdirs and args.white_bkgd
    assert args.N_importance == 128 and args.N_rand == 1024
    assert args.precrop_iters == 500 and args.half_res


def test_cli_overrides_config(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("N_rand = 1024\nlrate = 0.01\n")
    args = parse_args(["--config", str(cfg), "--N_rand", "2048"])
    assert args.N_rand == 2048
    assert args.lrate == 0.01


def test_create_expname_encoding():
    args = config_parser().parse_args([])
    args.expname = "chair"
    name = create_expname(args)
    assert name.startswith("chair_hashXYZ_sphereVIEW_fine512_log2T19")
    assert "_RAdam" in name and "_TV" in name and "_sparse" in name


def test_reference_configs_parse():
    """Every config file shipped with the reference parses cleanly."""
    ref_cfg_dir = "/root/reference/configs"
    if not os.path.isdir(ref_cfg_dir):
        return
    for fname in sorted(os.listdir(ref_cfg_dir)):
        args = parse_args(["--config", os.path.join(ref_cfg_dir, fname)])
        assert args.expname

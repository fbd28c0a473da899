"""Test config: force CPU backend with 8 virtual devices BEFORE jax import.

Multi-chip sharding tests run against this virtual mesh (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (TPU
# tunnel), so the env var above is too late — override via jax.config before
# any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "virtual 8-device CPU mesh required for tests"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def st3d_dir(tmp_path_factory):
    """Tiny st3d scene via the data-generation tool (full pipeline: one
    512x1024 RGB-D panorama -> 100 masked train views + 10 test views,
    reference equirect/Generate_data.ipynb layout). Session-scoped: shared
    by the loader tests and the st3d CLI e2e test."""
    import imageio.v2 as imageio

    from hashnerf_tpu.tools.generate_equirect_data import generate

    root = tmp_path_factory.mktemp("pano") / "scene01"
    os.makedirs(root)
    gen = np.random.default_rng(3)
    H, W = 512, 1024
    rgb = gen.integers(0, 255, (H, W, 3)).astype(np.uint8)
    d = (gen.uniform(0.3, 1.0, (H, W)) * 65535).astype(np.uint16)
    imageio.imwrite(str(root / "scene01_rgb.png"), rgb)
    imageio.imwrite(str(root / "scene01_d.png"), d)
    generate(str(root), n_train=100, n_test=10, radius=0.1, seed=0)
    return str(root)

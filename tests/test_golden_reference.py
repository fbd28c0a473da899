"""Golden parity vs the ACTUAL reference implementation.

Fixtures in tests/golden/reference_golden.npz were produced by executing the
PyTorch reference at /root/reference on CPU (tests/golden/generate_golden.py)
— hash encoder forward + table gradients, positional/SH encoders, sample_pdf,
raw2outputs, get_rays / get_ndc_rays, and a full 8-ray coarse+fine
render_rays with pixel-loss gradients. These tests fail if any semantic
drifts from the reference (BASELINE.md correctness gate: "rendered images and
pixel gradients allclose to reference").

Known, documented divergence (PARITY.md): the reference's keep_mask is
all-True in practice (recomputed per level on already-clamped points,
/root/reference/embedding/hash_encoding.py:66-69), so out-of-bbox points
keep their clamped-surface sigma there; we implement the stated intent
("set sigma to 0 for invalid points", run_nerf_helpers.py:225). The
render_rays fixture uses in-bbox rays where both semantics coincide.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashnerf_tpu.ops.hash_encoding import HashGridConfig, hash_encode

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "reference_golden.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


HCFG = HashGridConfig(
    n_levels=16, n_features_per_level=2, log2_hashmap_size=12,
    base_resolution=16, finest_resolution=512,
)


def _inside(g):
    pts, bmin, bmax = g["hash_pts"], g["hash_bbox_min"], g["hash_bbox_max"]
    return np.all((pts >= bmin) & (pts <= bmax), axis=-1)


def test_hash_encode_forward_matches_reference(g):
    feats, keep = hash_encode(
        jnp.asarray(g["hash_table"]), jnp.asarray(g["hash_pts"]),
        jnp.asarray(g["hash_bbox_min"]), jnp.asarray(g["hash_bbox_max"]), HCFG,
    )
    # In-bbox rows must match the reference exactly; out-of-bbox rows diverge
    # BY DESIGN (reference extrapolates via unclamped trilinear weights and
    # keeps their sigma — latent bugs, PARITY.md; we clamp + mask).
    inside = _inside(g)
    assert 0 < inside.sum() < len(inside)  # fixture has both kinds
    np.testing.assert_allclose(
        np.asarray(feats)[inside], g["hash_feats"][inside], rtol=1e-4, atol=1e-8
    )
    np.testing.assert_array_equal(np.asarray(keep), inside)  # honest mask
    assert g["hash_keep"].all()  # the reference's recorded mask is all-True


def test_hash_encode_fast_forward_matches_reference(g):
    from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast

    feats, _ = hash_encode_fast(
        jnp.asarray(g["hash_table"]), jnp.asarray(g["hash_pts"]),
        jnp.asarray(g["hash_bbox_min"]), jnp.asarray(g["hash_bbox_max"]), HCFG,
    )
    inside = _inside(g)
    np.testing.assert_allclose(
        np.asarray(feats)[inside], g["hash_feats"][inside], rtol=1e-4, atol=1e-8
    )


@pytest.mark.parametrize("impl", ["oracle", "fast"])
def test_hash_table_gradient_matches_reference(g, impl):
    if impl == "fast":
        from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast as enc
    else:
        enc = hash_encode

    probe = jnp.asarray(g["hash_probe"])

    def loss(table):
        feats, _ = enc(
            table, jnp.asarray(g["hash_pts"]),
            jnp.asarray(g["hash_bbox_min"]), jnp.asarray(g["hash_bbox_max"]),
            HCFG,
        )
        return jnp.sum(feats * probe)

    grad = jax.grad(loss)(jnp.asarray(g["hash_table"]))
    np.testing.assert_allclose(
        np.asarray(grad), g["hash_table_grad"], rtol=5e-3, atol=1e-5
    )


def test_positional_encoder_matches_reference(g):
    from hashnerf_tpu.ops.positional import PositionalConfig, positional_encode

    pcfg = PositionalConfig(num_freqs=10, max_freq_log2=9)
    out = positional_encode(jnp.asarray(g["pe_in"]), pcfg)
    np.testing.assert_allclose(np.asarray(out), g["pe_out"], rtol=1e-5, atol=1e-6)


def test_sh_encoder_matches_reference(g):
    from hashnerf_tpu.ops.sh_encoding import sh_encode

    out = sh_encode(jnp.asarray(g["sh_in"]), 4)
    np.testing.assert_allclose(np.asarray(out), g["sh_out"], rtol=1e-5, atol=1e-6)


def test_sample_pdf_matches_reference(g):
    from hashnerf_tpu.ops.sampling import sample_pdf

    out = sample_pdf(
        None, jnp.asarray(g["pdf_bins"]), jnp.asarray(g["pdf_weights"]),
        128, u=jnp.asarray(g["pdf_u"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["pdf_samples"], rtol=1e-4, atol=1e-5)

    det = sample_pdf(
        None, jnp.asarray(g["pdf_bins"]), jnp.asarray(g["pdf_weights"]),
        128, det=True,
    )
    np.testing.assert_allclose(np.asarray(det), g["pdf_samples_det"], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("wb", [False, True])
def test_raw2outputs_matches_reference(g, wb):
    from hashnerf_tpu.ops.volume import raw2outputs

    out = raw2outputs(
        jnp.asarray(g["r2o_raw"]), jnp.asarray(g["r2o_z"]),
        jnp.asarray(g["r2o_raysd"]), raw_noise_std=0.0, white_bkgd=wb,
    )
    tag = "_wb" if wb else ""
    np.testing.assert_allclose(np.asarray(out.rgb_map), g[f"r2o_rgb{tag}"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.disp_map), g[f"r2o_disp{tag}"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc_map), g[f"r2o_acc{tag}"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), g[f"r2o_weights{tag}"], rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.depth_map), g[f"r2o_depth{tag}"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.sparsity_loss), g[f"r2o_sparsity{tag}"], rtol=1e-4)


def test_get_rays_matches_reference(g):
    from hashnerf_tpu.ops.rays import get_rays, get_ndc_rays

    H, W, focal = (int(g["rays_hwf"][0]), int(g["rays_hwf"][1]), float(g["rays_hwf"][2]))
    ro, rd = get_rays(H, W, jnp.asarray(g["rays_K"]), jnp.asarray(g["rays_c2w"]))
    np.testing.assert_allclose(np.asarray(ro), g["rays_o"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), g["rays_d"], rtol=1e-5, atol=1e-6)

    no, nd = get_ndc_rays(
        H, W, focal, 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3)
    )
    np.testing.assert_allclose(np.asarray(no), g["ndc_o"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nd), g["ndc_d"], rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# Full render_rays parity (coarse + fine, hash + SH + NeRFSmall)
# --------------------------------------------------------------------------- #

def _mlp_params_from_golden(g, which):
    """torch Linear stores W as (out, in); our pytree uses (in, out)."""
    return {
        "sigma_net": [
            {"w": jnp.asarray(g[f"mlp_{which}_sigma_net_{i}"].T)} for i in range(2)
        ],
        "color_net": [
            {"w": jnp.asarray(g[f"mlp_{which}_color_net_{i}"].T)} for i in range(3)
        ],
    }


@pytest.fixture(scope="module")
def render_setup(g):
    from hashnerf_tpu.models.factory import ModelConfig, NGPState, create_model
    from hashnerf_tpu.render.renderer import RenderConfig

    mcfg = ModelConfig(
        i_embed=1, i_embed_views=2, use_viewdirs=True, N_importance=32,
        hash_grid=HCFG,
    )
    _, query_fn = create_model(jax.random.PRNGKey(0), mcfg)
    state = NGPState(
        hash_table=jnp.asarray(g["hash_table_render"]),
        coarse=_mlp_params_from_golden(g, "coarse"),
        fine=_mlp_params_from_golden(g, "fine"),
    )
    rcfg = RenderConfig(
        N_samples=32, N_importance=32, perturb=False, raw_noise_std=0.0,
        white_bkgd=True, use_viewdirs=True,
    )
    bbox = jnp.stack([jnp.asarray(g["hash_bbox_min"]), jnp.asarray(g["hash_bbox_max"])])
    rb = g["rr_ray_batch"]
    batch = {
        "rays_o": jnp.asarray(rb[:, 0:3]),
        "rays_d": jnp.asarray(rb[:, 3:6]),
        "near": jnp.asarray(rb[:, 6]),
        "far": jnp.asarray(rb[:, 7]),
        "viewdirs": jnp.asarray(rb[:, 8:11]),
    }
    return state, query_fn, rcfg, bbox, batch


def _run(render_setup):
    from hashnerf_tpu.render.renderer import render_rays

    state, query_fn, rcfg, bbox, batch = render_setup
    return render_rays(
        state, query_fn, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
        batch["near"], batch["far"], bbox, None, rcfg,
    )


def test_render_rays_matches_reference(g, render_setup):
    ret = _run(render_setup)
    np.testing.assert_allclose(np.asarray(ret["rgb_map"]), g["rr_rgb"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret["depth_map"]), g["rr_depth"], rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(ret["acc_map"]), g["rr_acc"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret["rgb0"]), g["rr_rgb0"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret["depth0"]), g["rr_depth0"], rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(ret["acc0"]), g["rr_acc0"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret["sparsity_loss"]), g["rr_sparsity"], rtol=1e-2)
    np.testing.assert_allclose(np.asarray(ret["z_std"]), g["rr_z_std"], rtol=1e-3, atol=1e-5)


def test_render_pixel_gradients_match_reference(g, render_setup):
    """BASELINE.md correctness gate: pixel gradients (hash table + both MLPs)
    through the full coarse+fine render must match torch autograd."""
    from hashnerf_tpu.render.renderer import render_rays
    from hashnerf_tpu.models.factory import NGPState

    state, query_fn, rcfg, bbox, batch = render_setup
    target = jnp.asarray(g["rr_target"])

    def loss_fn(state):
        ret = render_rays(
            state, query_fn, batch["rays_o"], batch["rays_d"],
            batch["viewdirs"], batch["near"], batch["far"], bbox, None, rcfg,
        )
        return jnp.mean((ret["rgb_map"] - target) ** 2) + jnp.mean(
            (ret["rgb0"] - target) ** 2
        )

    loss, grads = jax.value_and_grad(loss_fn)(state)
    np.testing.assert_allclose(float(loss), float(g["rr_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads.hash_table), g["rr_table_grad"], rtol=5e-3, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads.coarse["sigma_net"][0]["w"]).T,
        g["rr_sigma0_w_grad"], rtol=5e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(grads.fine["sigma_net"][0]["w"]).T,
        g["rr_fine_sigma0_w_grad"], rtol=5e-3, atol=1e-5,
    )

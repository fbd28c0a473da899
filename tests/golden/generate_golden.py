"""Generate golden parity fixtures by EXECUTING the reference implementation.

Runs the actual PyTorch reference at /root/reference (read-only) on CPU and
records inputs + outputs for: the hash encoder forward and its table
gradient, the positional and SH encoders, sample_pdf, raw2outputs, get_rays /
get_ndc_rays, and a full 8-ray render_rays (coarse+fine NeRFSmall). The
fixtures are consumed by tests/test_golden_reference.py, closing the round-1
gap of only testing against self-written oracles (VERDICT.md "What's missing"
#2).

The reference is import-broken as checked out (SURVEY.md §8): BOX_OFFSETS is
pinned to 'cuda' at import time, run_nerf_helpers.py:20 imports SHEncoder
from the wrong module, and ray_util.py needs kornia (not installed). This
script patches torch.tensor to drop the device kwarg, pre-seeds sys.modules
with a minimal kornia.create_meshgrid, and injects SHEncoder into
embedding.hash_encoding before importing run_nerf_helpers — executing the
reference's code unmodified otherwise.

Usage: python tests/golden/generate_golden.py   (writes reference_golden.npz)
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_golden.npz")


def _patch_environment():
    import torch

    # BOX_OFFSETS = torch.tensor(..., device='cuda') at import time
    _orig_tensor = torch.tensor

    def _tensor(*args, **kwargs):
        kwargs.pop("device", None)
        return _orig_tensor(*args, **kwargs)

    torch.tensor = _tensor

    # ray_util.py: from kornia import create_meshgrid (kornia absent).
    # Minimal reimplementation of kornia.utils.create_meshgrid semantics.
    def create_meshgrid(height, width, normalized_coordinates=True, device=None, dtype=None):
        xs = torch.linspace(0, width - 1, width)
        ys = torch.linspace(0, height - 1, height)
        if normalized_coordinates:
            xs = (xs / (width - 1) - 0.5) * 2
            ys = (ys / (height - 1) - 0.5) * 2
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]  # (1, H, W, 2)

    kornia = types.ModuleType("kornia")
    kornia.create_meshgrid = create_meshgrid
    sys.modules["kornia"] = kornia

    sys.path.insert(0, REF)


def main():
    _patch_environment()
    import torch

    torch.manual_seed(0)

    import embedding.hash_encoding as hash_mod
    from embedding.spherical_harmonic import SHEncoder

    # run_nerf_helpers.py:20 does `from embedding.hash_encoding import
    # HashEmbedder, SHEncoder` — SHEncoder lives elsewhere (SURVEY §8), and
    # :19 imports get_embedder from embedding.embedder though it is defined in
    # run_nerf_helpers itself. Inject both so the module loads.
    hash_mod.SHEncoder = SHEncoder
    import embedding.embedder as emb_mod

    emb_mod.get_embedder = None  # placeholder; real one defined in rh itself

    import run_nerf_helpers as rh
    import ray_util
    from embedding.embedder import Embedder
    from models import NeRFSmall

    rng = np.random.default_rng(42)
    out = {}

    # ------------------------------------------------------------------ #
    # A. Hash encoder forward + keep_mask + table gradient
    # ------------------------------------------------------------------ #
    bbox_min = np.array([-1.2, -1.1, -0.9], np.float32)
    bbox_max = np.array([1.3, 1.05, 1.15], np.float32)
    bbox = (torch.from_numpy(bbox_min), torch.from_numpy(bbox_max))
    L, F, T_LOG2 = 16, 2, 12
    embedder = hash_mod.HashEmbedder(
        bbox, n_levels=L, n_features_per_level=F,
        log2_hashmap_size=T_LOG2, base_resolution=16, finest_resolution=512,
    )
    table = np.stack(
        [embedder.embeddings[i].weight.detach().numpy() for i in range(L)]
    )  # (L, 2^T, F)
    pts = rng.uniform(-1.4, 1.4, (256, 3)).astype(np.float32)  # some outside bbox
    t_pts = torch.from_numpy(pts)
    feats, keep = embedder(t_pts)
    # The reference EXTRAPOLATES out-of-bbox points (trilinear weights use the
    # unclamped x against clamped voxel vertices, hash_encoding.py:105,141 —
    # latent bug, see PARITY.md); we clamp. Probe only in-bbox rows so the
    # gradient fixture is comparable; the feature fixture is compared on
    # in-bbox rows by the test.
    inside = np.all((pts >= bbox_min) & (pts <= bbox_max), axis=-1)
    probe = rng.standard_normal((256, L * F)).astype(np.float32)
    probe *= inside[:, None].astype(np.float32)
    loss = (feats * torch.from_numpy(probe)).sum()
    loss.backward()
    grad = np.stack(
        [embedder.embeddings[i].weight.grad.numpy() for i in range(L)]
    )
    out.update(
        hash_bbox_min=bbox_min, hash_bbox_max=bbox_max,
        hash_table=table, hash_pts=pts, hash_probe=probe,
        hash_feats=feats.detach().numpy(), hash_keep=keep.numpy(),
        hash_table_grad=grad,
    )

    # ------------------------------------------------------------------ #
    # B. Positional + SH encoders
    # ------------------------------------------------------------------ #
    emb = Embedder(
        include_input=True, input_dims=3, max_freq_log2=9, num_freqs=10,
        log_sampling=True, periodic_fns=[torch.sin, torch.cos],
    )
    pe_in = rng.standard_normal((64, 3)).astype(np.float32)
    out["pe_in"] = pe_in
    out["pe_out"] = emb.embed(torch.from_numpy(pe_in)).numpy()

    sh = SHEncoder(degree=4)
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out["sh_in"] = dirs
    out["sh_out"] = sh(torch.from_numpy(dirs)).numpy()

    # ------------------------------------------------------------------ #
    # C. sample_pdf (explicit u via the pytest seam) + det variant
    # ------------------------------------------------------------------ #
    bins = np.sort(rng.uniform(2.0, 6.0, (8, 63)).astype(np.float32), axis=-1)
    weights = rng.uniform(0.0, 1.0, (8, 62)).astype(np.float32)
    s_rand = rh.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 128,
        det=False, pytest=True,  # u = np.random.seed(0); np.random.rand(...)
    )
    s_det = rh.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 128, det=True
    )
    np.random.seed(0)
    u_rand = np.random.rand(8, 128).astype(np.float64)
    out.update(
        pdf_bins=bins, pdf_weights=weights, pdf_u=u_rand.astype(np.float32),
        pdf_samples=s_rand.numpy(), pdf_samples_det=s_det.numpy(),
    )

    # ------------------------------------------------------------------ #
    # D. raw2outputs (both white_bkgd settings)
    # ------------------------------------------------------------------ #
    raw = rng.standard_normal((8, 64, 4)).astype(np.float32)
    z_vals = np.sort(rng.uniform(2.0, 6.0, (8, 64)).astype(np.float32), axis=-1)
    rays_d = rng.standard_normal((8, 3)).astype(np.float32)
    for tag, wb in (("", False), ("_wb", True)):
        rgb, disp, acc, w, depth, sparsity = rh.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z_vals),
            torch.from_numpy(rays_d), raw_noise_std=0, white_bkgd=wb,
        )
        out.update({
            f"r2o_rgb{tag}": rgb.numpy(), f"r2o_disp{tag}": disp.numpy(),
            f"r2o_acc{tag}": acc.numpy(), f"r2o_weights{tag}": w.numpy(),
            f"r2o_depth{tag}": depth.numpy(), f"r2o_sparsity{tag}": sparsity.numpy(),
        })
    out.update(r2o_raw=raw, r2o_z=z_vals, r2o_raysd=rays_d)

    # ------------------------------------------------------------------ #
    # E. get_rays + get_ndc_rays
    # ------------------------------------------------------------------ #
    H, W, focal = 12, 16, 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    theta = 0.6
    c2w = np.array(
        [
            [np.cos(theta), 0, -np.sin(theta), 0.3],
            [0, 1, 0, -0.2],
            [np.sin(theta), 0, np.cos(theta), 3.7],
        ],
        np.float32,
    )
    ro, rd = ray_util.get_rays(H, W, torch.from_numpy(K), torch.from_numpy(c2w))
    out.update(rays_K=K, rays_c2w=c2w, rays_o=ro.numpy(), rays_d=rd.numpy(),
               rays_hwf=np.array([H, W, focal], np.float32))
    ndc_o, ndc_d = ray_util.get_ndc_rays(
        H, W, focal, 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3)
    )
    out.update(ndc_o=ndc_o.numpy(), ndc_d=ndc_d.numpy())

    # ------------------------------------------------------------------ #
    # F. Full render_rays: 8 rays, coarse+fine, hash + SH + NeRFSmall
    # ------------------------------------------------------------------ #
    sh_enc = SHEncoder(degree=4)
    net_coarse = NeRFSmall(
        num_layers=2, hidden_dim=64, geo_feat_dim=15, num_layers_color=3,
        hidden_dim_color=64, input_ch=L * F, input_ch_views=16,
    )
    net_fine = NeRFSmall(
        num_layers=2, hidden_dim=64, geo_feat_dim=15, num_layers_color=3,
        hidden_dim_color=64, input_ch=L * F, input_ch_views=16,
    )
    # export weights (torch Linear stores (out, in))
    for name, net in (("coarse", net_coarse), ("fine", net_fine)):
        for part in ("sigma_net", "color_net"):
            for i, lin in enumerate(getattr(net, part)):
                out[f"mlp_{name}_{part}_{i}"] = lin.weight.detach().numpy()

    def query_fn(inputs, viewdirs, network_fn):
        return rh.run_network(
            inputs, viewdirs, network_fn,
            embed_fn=embedder, embeddirs_fn=sh_enc, netchunk=1 << 16,
        )

    # Rays chosen so every coarse/fine sample stays INSIDE the bbox: the
    # reference's keep_mask is all-True in practice (recomputed per level on
    # already-clamped points, hash_encoding.py:66-69 — latent bug, see
    # PARITY.md), while ours honestly zeroes sigma outside; in-bbox rays make
    # the two semantics coincide so the golden compare is meaningful.
    n_rays = 8
    rays_o8 = rng.uniform(-0.05, 0.05, (n_rays, 3)).astype(np.float32)
    rays_d8 = rng.standard_normal((n_rays, 3)).astype(np.float32)
    rays_d8 = 1.3 * rays_d8 / np.linalg.norm(rays_d8, axis=-1, keepdims=True)
    viewdirs8 = rays_d8 / np.linalg.norm(rays_d8, axis=-1, keepdims=True)
    near = np.full((n_rays, 1), 0.05, np.float32)
    far = np.full((n_rays, 1), 0.6, np.float32)
    ray_batch = np.concatenate(
        [rays_o8, rays_d8, near, far, viewdirs8], axis=-1
    ).astype(np.float32)

    # give the field non-trivial densities: bump the table init scale
    with torch.no_grad():
        for i in range(L):
            embedder.embeddings[i].weight.mul_(200.0)
    out["hash_table_render"] = np.stack(
        [embedder.embeddings[i].weight.detach().numpy() for i in range(L)]
    )

    with torch.no_grad():
        ret = rh.render_rays(
            torch.from_numpy(ray_batch),
            network_fn=net_coarse,
            network_query_fn=query_fn,
            N_samples=32,
            retraw=False,
            lindisp=False,
            perturb=0.0,
            N_importance=32,
            network_fine=net_fine,
            white_bkgd=True,
            raw_noise_std=0.0,
        )
    out.update(
        rr_ray_batch=ray_batch,
        rr_rgb=ret["rgb_map"].numpy(),
        rr_depth=ret["depth_map"].numpy(),
        rr_acc=ret["acc_map"].numpy(),
        rr_sparsity=ret["sparsity_loss"].numpy(),
        rr_rgb0=ret["rgb0"].numpy(),
        rr_depth0=ret["depth0"].numpy(),
        rr_acc0=ret["acc0"].numpy(),
        rr_z_std=ret["z_std"].numpy(),
    )

    # pixel gradient through the full render (hash table + MLP):
    target = rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)
    ret = rh.render_rays(
        torch.from_numpy(ray_batch), network_fn=net_coarse,
        network_query_fn=query_fn, N_samples=32, lindisp=False, perturb=0.0,
        N_importance=32, network_fine=net_fine, white_bkgd=True,
        raw_noise_std=0.0,
    )
    # fine + coarse mse, like the reference training loss (run_nerf.py:613-621)
    loss = ((ret["rgb_map"] - torch.from_numpy(target)) ** 2).mean() + (
        (ret["rgb0"] - torch.from_numpy(target)) ** 2
    ).mean()
    # clear the grads accumulated by the part-A backward (torch accumulates)
    for i in range(L):
        embedder.embeddings[i].weight.grad = None
    loss.backward()
    out["rr_target"] = target
    out["rr_loss"] = np.float32(loss.item())
    out["rr_table_grad"] = np.stack(
        [embedder.embeddings[i].weight.grad.numpy() for i in range(L)]
    )
    out["rr_sigma0_w_grad"] = net_coarse.sigma_net[0].weight.grad.numpy()
    out["rr_fine_sigma0_w_grad"] = net_fine.sigma_net[0].weight.grad.numpy()

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB, {len(out)} arrays)")


if __name__ == "__main__":
    main()

"""Training driver: fully-jitted train step + host-side loop, both ray modes.

Capability parity: /root/reference/run_nerf.py:503-721 (standard loop: random
ray batching across images OR per-image random pixels with precrop phase,
losses = mse + coarse mse + entropy sparsity + warmup-only TV, exponential LR
decay, periodic checkpoint/testset/video/metrics) and :406-501 (st3d loop with
depth/gradient supervision). The whole optimization step — ray march, losses,
backward (scatter-add into the hash table), RAdam update — is ONE jitted XLA
program; the TV warmup weight is a traced scalar so flipping it at iter 1000
does not recompile.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hashnerf_tpu.data.scene import Scene, RayBundle
from hashnerf_tpu.models.factory import ModelConfig, NGPState, create_model, EMBED_HASH
from hashnerf_tpu.ops.hash_encoding import HashGridConfig
from hashnerf_tpu.ops.rays import get_rays_np
from hashnerf_tpu.render.renderer import RenderConfig, render_rays, render, render_path
from hashnerf_tpu.train.losses import total_variation_loss_all_levels
from hashnerf_tpu.train.radam import radam
from hashnerf_tpu.train.checkpoint import save_checkpoint, load_latest_checkpoint
from hashnerf_tpu.utils.metrics import img2mse, mse2psnr


def model_config_from_args(args) -> ModelConfig:
    return ModelConfig(
        i_embed=args.i_embed,
        i_embed_views=args.i_embed_views,
        multires=args.multires,
        multires_views=args.multires_views,
        use_viewdirs=args.use_viewdirs,
        use_gradient=getattr(args, "use_gradient", False),
        share_fine=getattr(args, "share_fine", False),
        N_importance=args.N_importance,
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine,
        netwidth_fine=args.netwidth_fine,
        hash_grid=HashGridConfig(
            n_levels=getattr(args, "n_levels", 16),
            n_features_per_level=getattr(args, "n_features_per_level", 2),
            log2_hashmap_size=args.log2_hashmap_size,
            finest_resolution=args.finest_res,
        ),
        compute_dtype=getattr(args, "compute_dtype", None),
        packed_layout=getattr(args, "packed_layout", False),
        log2_blocks=getattr(args, "log2_blocks", -1),
    )


def render_config_from_args(args, ndc: bool = False, lindisp: bool = False) -> RenderConfig:
    occupancy = None
    if getattr(args, "use_occupancy", False):
        from hashnerf_tpu.render.occupancy import OccupancyConfig

        occupancy = OccupancyConfig(
            resolution=getattr(args, "occ_resolution", 128),
            keep_fraction=getattr(args, "occ_keep_fraction", 0.5),
            update_every=getattr(args, "occ_update_every", 16),
            warmup_steps=getattr(args, "occ_warmup", 256),
            partition=getattr(args, "occ_partition", "sort1"),
            adaptive_update=getattr(args, "occ_adaptive_update", False),
            per_ray=getattr(args, "occ_per_ray", False),
            per_ray_select=getattr(args, "occ_per_ray_select", "sort"),
            block=getattr(args, "occ_block", 1),
            keep_fraction_coarse=(
                kc if (kc := getattr(args, "occ_keep_coarse", -1.0)) > 0
                else None
            ),
            keep_fraction_eval=(
                ke if (ke := getattr(args, "occ_keep_eval", -1.0)) > 0
                else None
            ),
            keep_fraction_eval_coarse=(
                kec if (kec := getattr(args, "occ_keep_eval_coarse", -1.0)) > 0
                else None
            ),
            eval_transmittance=getattr(args, "occ_eval_transmittance", False),
            score_stride=getattr(args, "occ_score_stride", 1),
        )
        # --occ_block must divide both passes' sample counts AND 128 (the
        # keep budget is rounded up to a multiple of 128, so 128 % block == 0
        # guarantees keep_k % block == 0 for any batch size). Without this
        # the culling path would silently fall back to per-point selection
        # (ADVICE r4 #2: a user-set --occ_block ignored with no warning).
        B = occupancy.block
        if B > 1 and not occupancy.per_ray:
            S_fine = args.N_samples + args.N_importance
            if args.N_samples % B or S_fine % B or 128 % B:
                raise ValueError(
                    f"--occ_block={B} must divide N_samples ({args.N_samples}), "
                    f"N_samples+N_importance ({S_fine}), and 128 (the keep-"
                    "budget rounding); pick a power-of-two block that divides "
                    "all three or use --occ_block 1"
                )
        if getattr(args, "fast_merge", False):
            # The occupancy path replaces the z merge with a multi-operand
            # lax.sort that carries the reused scores (renderer.py), so
            # fast_merge's presorted-uniform draw does not apply there
            # (ADVICE r4 #3: the combination used to change the RNG stream
            # silently).
            print(
                "[config] note: --fast_merge is superseded by the occupancy "
                "path's score-carrying z merge; ignoring fast_merge"
            )
    return RenderConfig(
        fast_merge=getattr(args, "fast_merge", False),
        N_samples=args.N_samples,
        N_importance=args.N_importance,
        perturb=args.perturb > 0.0,
        raw_noise_std=args.raw_noise_std,
        white_bkgd=args.white_bkgd,
        lindisp=lindisp,
        ndc=ndc,
        use_viewdirs=args.use_viewdirs,
        occupancy=occupancy,
        aabb_clip=getattr(args, "aabb_clip", False) and not ndc,
    )


def make_lr_schedule(lrate: float, lrate_decay: int):
    """lr(t) = lrate * 0.1^(t / (decay*1000)) (reference run_nerf.py:647-651)."""
    decay_steps = lrate_decay * 1000

    def sched(step):
        return lrate * jnp.power(0.1, step.astype(jnp.float32) / decay_steps)

    return sched


def make_optimizer(args, state: NGPState) -> optax.GradientTransformation:
    """RAdam with two param groups for the hash path, Adam otherwise
    (reference run_nerf_helpers.py:131-137)."""
    sched = make_lr_schedule(args.lrate, args.lrate_decay)
    if args.i_embed == EMBED_HASH:
        net_opt = radam(sched, b1=0.9, b2=0.99, eps=1e-8, weight_decay=1e-6)
        embed_opt = radam(sched, b1=0.9, b2=0.99, eps=1e-15, weight_decay=0.0)

        def label_fn(params: NGPState):
            return NGPState(
                # tree_map covers both the plain (L,2^T,F) array and the
                # packed-layout {"dense","fine"} dict
                hash_table=jax.tree_util.tree_map(
                    lambda _: "embed", params.hash_table
                ),
                coarse=jax.tree_util.tree_map(lambda _: "net", params.coarse),
                fine=jax.tree_util.tree_map(lambda _: "net", params.fine)
                if params.fine is not None
                else None,
            )

        return optax.multi_transform({"net": net_opt, "embed": embed_opt}, label_fn)
    return optax.adam(sched, b1=0.9, b2=0.999)


def make_loss_fn(
    args, render_cfg: RenderConfig, query_fn, bbox, hcfg: HashGridConfig,
    with_tv: bool = True, hwf=None,
):
    """Build the full training loss (image + coarse + sparsity + TV).

    `with_tv` is STATIC: the reference hard-zeroes the TV weight after iter
    1000 (run_nerf.py:637-638) — compiling a TV-free variant skips the ~2M-row
    hash gather/scatter entirely for the remaining 98% of training instead of
    multiplying it by 0.

    `hwf` is required when render_cfg.ndc: the LLFF forward-facing path warps
    TRAINING rays to NDC here (the reference does it inside render(),
    run_nerf_helpers.py:353-356, which its train loop calls; our train step
    calls render_rays directly, so the warp must happen in the loss).
    viewdirs stay the normalized WORLD directions (reference computes them
    before the warp, run_nerf_helpers.py:344-350).

    Shared by the single-chip Trainer and the sharded multi-chip step
    (hashnerf_tpu.parallel.train_sharded)."""
    cfg = render_cfg
    if cfg.ndc and hwf is None:
        raise ValueError("make_loss_fn: render_cfg.ndc requires hwf=(H, W, focal)")
    use_hash = (args.i_embed == EMBED_HASH) and with_tv
    packed = getattr(args, "packed_layout", False)
    if use_hash and packed:
        from hashnerf_tpu.train.losses import total_variation_loss_packed
        from hashnerf_tpu.ops.packed_grid import PackedGridConfig

        b = getattr(args, "log2_blocks", -1)
        pcfg = PackedGridConfig(
            n_levels=hcfg.n_levels,
            n_features_per_level=hcfg.n_features_per_level,
            log2_hashmap_size=hcfg.log2_hashmap_size,
            base_resolution=hcfg.base_resolution,
            finest_resolution=hcfg.finest_resolution,
            log2_blocks=b if b > 0 else hcfg.log2_hashmap_size - 3,
        )
    sparse_w = args.sparse_loss_weight
    use_depth = getattr(args, "use_depth", False)
    use_gradient = getattr(args, "use_gradient", False)

    def loss_fn(state, batch, key, tv_weight, occ_grid=None):
        k_render, k_tv = jax.random.split(key)
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        if cfg.ndc:
            from hashnerf_tpu.ops.rays import get_ndc_rays

            H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
            rays_o, rays_d = get_ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        ret = render_rays(
            state, query_fn,
            rays_o, rays_d, batch.get("viewdirs"),
            batch["near"], batch["far"], bbox, k_render, cfg,
            occ_grid=occ_grid,
        )
        img_loss = img2mse(ret["rgb_map"], batch["target"])
        loss = img_loss
        psnr = mse2psnr(img_loss)

        if use_depth and "target_depth" in batch:
            loss = loss + jnp.mean(jnp.abs(ret["depth_map"] - batch["target_depth"]))
        if use_gradient and "target_grad" in batch and "grad_map" in ret:
            loss = loss + img2mse(ret["grad_map"], batch["target_grad"])

        if "rgb0" in ret:
            loss = loss + img2mse(ret["rgb0"], batch["target"])
            if use_depth and "target_depth" in batch:
                loss = loss + jnp.mean(jnp.abs(ret["depth0"] - batch["target_depth"]))

        sparsity = ret["sparsity_loss"].sum()
        if "sparsity_loss0" in ret:
            sparsity = sparsity + ret["sparsity_loss0"].sum()
        loss = loss + sparse_w * sparsity

        if use_hash:
            if packed:
                tv = total_variation_loss_packed(k_tv, state.hash_table, pcfg)
            else:
                tv = total_variation_loss_all_levels(
                    k_tv, state.hash_table,
                    hcfg.base_resolution, hcfg.finest_resolution,
                    hcfg.log2_hashmap_size,
                )
            loss = loss + tv_weight * tv

        return loss, (psnr, img_loss)

    return loss_fn


@dataclasses.dataclass
class Trainer:
    """Owns model state, optimizer state, and the compiled train step."""

    args: Any
    scene: Optional[Scene] = None
    key: Any = None

    def __post_init__(self):
        if self.key is None:
            self.key = jax.random.PRNGKey(0)
        args = self.args
        self.model_cfg = model_config_from_args(args)
        ndc = self.scene.ndc if self.scene is not None else False
        lindisp = args.lindisp if (self.scene is None or not self.scene.ndc) else False
        self.render_cfg = render_config_from_args(args, ndc=ndc, lindisp=lindisp)

        # --num_devices N (N>1): data-parallel mesh over the ray axis. The
        # batch gets a with_sharding_constraint inside the jitted step/block;
        # params stay replicated and XLA inserts the gradient psums over ICI
        # (GSPMD recipe — no hand-written collectives at this layer).
        self.mesh = None
        n_dev = getattr(args, "num_devices", 0) or 0
        if n_dev > 1:
            from hashnerf_tpu.parallel.mesh import make_mesh

            if n_dev > len(jax.devices()):
                raise ValueError(
                    f"--num_devices {n_dev} > available devices {len(jax.devices())}"
                )
            if args.N_rand % n_dev:
                raise ValueError(
                    f"--N_rand {args.N_rand} must be divisible by --num_devices {n_dev}"
                )
            self.mesh = make_mesh(n_dev)

        self.key, k_model = jax.random.split(self.key)
        self.state, self.query_fn = create_model(k_model, self.model_cfg)
        self.optimizer = make_optimizer(args, self.state)
        self.opt_state = self.optimizer.init(self.state)
        self.global_step = 0
        if self.mesh is not None:
            from hashnerf_tpu.parallel.mesh import replicate

            rep = replicate(self.mesh)
            self.state = jax.device_put(self.state, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

        if self.scene is not None:
            self.bbox = jnp.asarray(self.scene.bbox_array())
            self.near, self.far = self.scene.near, self.scene.far
        else:
            self.bbox = jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], jnp.float32)
            self.near, self.far = 2.0, 6.0

        # Annealed keep budget: "STEP:FRAC,..." — loose while the occupancy
        # grid stabilizes, tight once it has (each FRAC is a STATIC shape, so
        # each schedule segment is its own compiled block program).
        self.keep_schedule = None
        ks = getattr(args, "occ_keep_schedule", None)
        if ks and self.render_cfg.occupancy is not None:
            pairs = []
            for tok in str(ks).split(","):
                s, f = tok.split(":")
                pairs.append((int(s), float(f)))
            self.keep_schedule = sorted(pairs)

        self._train_step = self._build_train_step()

    def _keep_at(self, step: int) -> Tuple[float, Optional[int]]:
        """(keep_fraction at `step`, next schedule boundary > step or None)."""
        occ = self.render_cfg.occupancy
        base = occ.keep_fraction if occ is not None else 0.0
        if not self.keep_schedule:
            return base, None
        keep, nxt = base, None
        for b, f in self.keep_schedule:
            if step >= b:
                keep = f
            elif nxt is None:
                nxt = b
        return keep, nxt

    def _shard_rays_constraint(self, batch: Dict[str, jnp.ndarray]):
        """Inside-jit sharding annotation: every per-ray array split over the
        mesh's 'data' axis. No-op without a mesh."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("data"))
        return {
            k: jax.lax.with_sharding_constraint(v, sh) for k, v in batch.items()
        }

    # ------------------------------------------------------------------ #
    # The jitted step
    # ------------------------------------------------------------------ #
    def _build_train_step(self):
        optimizer = self.optimizer

        def build(with_tv: bool, keep: Optional[float] = None):
            loss_fn = make_loss_fn(
                self.args, self._render_cfg_for(keep), self.query_fn, self.bbox,
                self.model_cfg.hash_grid, with_tv=with_tv,
                hwf=self.scene.hwf if self.scene is not None else None,
            )

            @jax.jit
            def train_step(state, opt_state, batch, key, tv_weight, occ_grid=None):
                batch = self._shard_rays_constraint(batch)
                (loss, (psnr, img_loss)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state, batch, key, tv_weight, occ_grid)
                updates, opt_state = optimizer.update(grads, opt_state, state)
                state = optax.apply_updates(state, updates)
                return state, opt_state, {
                    "loss": loss, "psnr": psnr, "img_loss": img_loss
                }

            return train_step

        self._train_step_tv = build(True)
        self._train_step_no_tv = build(False)
        self._build_step_fn = build
        self._step_fn_cache = {}
        self._init_occupancy()
        return self._train_step_tv

    def _get_step_fn(self, with_tv: bool, keep: Optional[float]):
        if keep is None:
            return self._train_step_tv if with_tv else self._train_step_no_tv
        key = (with_tv, keep)
        fn = self._step_fn_cache.get(key)
        if fn is None:
            fn = self._step_fn_cache[key] = self._build_step_fn(with_tv, keep)
        return fn

    def _init_occupancy(self):
        """Occupancy grid state + jitted updater (opt-in via --use_occupancy)."""
        self.occ_grid = None
        occ_cfg = self.render_cfg.occupancy
        if occ_cfg is None:
            return
        from hashnerf_tpu.render.occupancy import init_occupancy_grid

        self.occ_grid = init_occupancy_grid(occ_cfg)
        # Culling additionally waits until the grid actually contains occupied
        # cells — activating on an all-empty grid (density not yet emerged)
        # would cull everything and stall training.
        self._occ_ready = False
        query_fn = self.query_fn
        bbox = self.bbox
        use_dirs = self.render_cfg.use_viewdirs
        fine = self.render_cfg.N_importance > 0
        R = occ_cfg.resolution

        def occ_update(grid, key, state):
            from hashnerf_tpu.render.occupancy import sample_update_cells

            k_cell, k_jit = jax.random.split(key)
            cells = sample_update_cells(grid, k_cell, occ_cfg)
            ijk = jnp.stack(
                [cells // (R * R), (cells // R) % R, cells % R], axis=-1
            ).astype(jnp.float32)
            u = jax.random.uniform(k_jit, (occ_cfg.n_update_samples, 3))
            rel = (ijk + u) / R
            pts = bbox[0] + rel * (bbox[1] - bbox[0])
            dirs = (
                jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pts.shape[0], 3))
                if use_dirs else None
            )
            raw = query_fn(state, pts[:, None, :], dirs, bbox, fine=fine)
            sigma = jax.nn.relu(raw[:, 0, 3])
            return (grid * occ_cfg.ema_decay).at[cells].max(sigma)

        self._occ_update_fn = occ_update  # traceable (used inside scanned blocks)
        self._occ_update = jax.jit(occ_update)

    def step(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, float]:
        """One optimization step. batch: rays_o/rays_d/near/far/target
        (+viewdirs, target_depth, target_grad)."""
        self.key, k = jax.random.split(self.key)
        # Warmup-only TV (reference run_nerf.py:637-638); the TV-free variant
        # compiles the regularizer away entirely.
        tv_w = self.args.tv_loss_weight if self.global_step <= 1000 else 0.0
        keep = None
        if self.keep_schedule and self.render_cfg.occupancy is not None:
            keep, _ = self._keep_at(self.global_step)
        step_fn = self._get_step_fn(tv_w > 0, keep)
        if "viewdirs" not in batch and self.render_cfg.use_viewdirs:
            d = batch["rays_d"]
            batch = dict(batch)
            batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        occ_cfg = self.render_cfg.occupancy
        occ_active = (
            occ_cfg is not None
            and self.global_step >= occ_cfg.warmup_steps
            and self._occ_ready
        )
        occ_arg = self.occ_grid if occ_active else None

        self.state, self.opt_state, metrics = step_fn(
            self.state, self.opt_state, batch, k, jnp.float32(tv_w), occ_arg
        )
        self.global_step += 1

        if occ_cfg is not None and self.global_step % occ_cfg.update_every == 0:
            self.key, ku = jax.random.split(self.key)
            self.occ_grid = self._occ_update(self.occ_grid, ku, self.state)
            if not self._occ_ready:
                # one scalar fetch per update until the field shows density
                self._occ_ready = float(jnp.max(self.occ_grid)) > 0.0
        return metrics

    # ------------------------------------------------------------------ #
    # Scanned multi-step training (K optimizer steps per XLA dispatch)
    # ------------------------------------------------------------------ #
    def _ensure_device_scene(self):
        """Scene arrays resident on device for on-device ray sampling."""
        if getattr(self, "_d_images", None) is not None:
            return
        sc = self.scene
        self._d_images = jnp.asarray(sc.images)
        self._d_poses = jnp.asarray(sc.poses[:, :3, :4])
        self._d_K = jnp.asarray(sc.K)
        self._d_i_train = jnp.asarray(np.asarray(sc.i_train), jnp.int32)
        self._block_cache = {}

    def _render_cfg_for(self, keep: Optional[float]) -> RenderConfig:
        """render_cfg with the occupancy keep budget overridden (annealed
        schedule); identity when keep is None or already matches."""
        occ = self.render_cfg.occupancy
        if keep is None or occ is None or keep == occ.keep_fraction:
            return self.render_cfg
        return dataclasses.replace(
            self.render_cfg,
            occupancy=dataclasses.replace(occ, keep_fraction=keep),
        )

    def _build_block(self, n_steps: int, with_tv: bool, occ_mode, precrop: bool,
                     keep: Optional[float] = None):
        """One jitted function = `n_steps` full optimization steps via
        lax.scan, with on-device per-image random-pixel ray sampling.

        Rationale: the per-step XLA program is small (1024 rays × 192
        samples), so at 1 dispatch/step the host→device round-trip dominates
        wall time. Scanning K steps amortizes dispatch to ~0 (the TPU-native
        equivalent of the reference's tight CUDA-stream loop).

        occ_mode: None (no occupancy), "update" (maintain grid, no culling
        yet — warmup), "cull" (maintain grid + budgeted top-k culling).
        keep: occupancy keep_fraction override (annealed schedule).
        """
        from hashnerf_tpu.ops.rays import get_rays_at

        args = self.args
        optimizer = self.optimizer
        render_cfg = self._render_cfg_for(keep)
        loss_fn = make_loss_fn(
            args, render_cfg, self.query_fn, self.bbox,
            self.model_cfg.hash_grid, with_tv=with_tv,
            hwf=self.scene.hwf if self.scene is not None else None,
        )
        # NOTE: images/poses are block ARGUMENTS, not closed-over device
        # arrays — a jitted closure over a concrete jnp array bakes it into
        # the HLO as a constant, and at full scale (100x800x800 images) the
        # resulting compile payload exceeds the remote-compile tunnel's
        # request limit (HTTP 413) before it even reaches XLA.
        Kmat, i_train = self._d_K, self._d_i_train
        H, W = self.scene.H, self.scene.W
        n_rand = args.N_rand
        near, far = self.near, self.far
        use_vdirs = self.render_cfg.use_viewdirs
        occ_cfg = render_cfg.occupancy

        if precrop:
            dH = int(H // 2 * args.precrop_frac)
            dW = int(W // 2 * args.precrop_frac)
            ys0, xs0 = H // 2 - dH, W // 2 - dW
            nH, nW = 2 * dH, 2 * dW
        else:
            ys0, xs0, nH, nW = 0, 0, H, W

        def sample_batch(key, images, poses):
            k_img, k_pix = jax.random.split(key)
            idx = i_train[jax.random.randint(k_img, (), 0, i_train.shape[0])]
            sel = jax.random.choice(k_pix, nH * nW, (n_rand,), replace=False)
            ys = ys0 + sel // nW
            xs = xs0 + sel % nW
            rays_o, rays_d = get_rays_at(Kmat, poses[idx], ys, xs)
            batch = {
                "rays_o": rays_o,
                "rays_d": rays_d,
                "target": images[idx][ys, xs],
                "near": jnp.full((n_rand,), near, jnp.float32),
                "far": jnp.full((n_rand,), far, jnp.float32),
            }
            if use_vdirs:
                batch["viewdirs"] = rays_d / jnp.linalg.norm(
                    rays_d, axis=-1, keepdims=True
                )
            return self._shard_rays_constraint(batch)

        def train_one(state, opt_state, key, tv_w, occ_grid, images, poses):
            k_batch, k_step = jax.random.split(key)
            batch = sample_batch(k_batch, images, poses)
            (loss, (psnr, img_loss)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state, batch, k_step, tv_w, occ_grid)
            updates, opt_state = optimizer.update(grads, opt_state, state)
            state = optax.apply_updates(state, updates)
            return state, opt_state, {
                "loss": loss, "psnr": psnr, "img_loss": img_loss
            }

        if occ_mode is None:

            @jax.jit
            def block(state, opt_state, occ_grid, key, tv_w, images, poses):
                def body(carry, _):
                    state, opt_state, key = carry
                    key, k = jax.random.split(key)
                    state, opt_state, m = train_one(
                        state, opt_state, k, tv_w, None, images, poses
                    )
                    return (state, opt_state, key), m

                (state, opt_state, key), ms = jax.lax.scan(
                    body, (state, opt_state, key), None, length=n_steps
                )
                return state, opt_state, occ_grid, jax.tree_util.tree_map(
                    lambda x: x[-1], ms
                )

            return block

        upd = occ_cfg.update_every
        n_seg, rem = divmod(n_steps, upd)
        assert rem == 0, "occupancy block size must be a multiple of update_every"
        cull = occ_mode == "cull"
        occ_update = self._occ_update_fn

        @jax.jit
        def block(state, opt_state, occ_grid, key, tv_w, images, poses):
            def seg(carry, _):
                state, opt_state, occ_grid, key = carry

                def body(c, _):
                    state, opt_state, key = c
                    key, k = jax.random.split(key)
                    state, opt_state, m = train_one(
                        state, opt_state, k, tv_w,
                        occ_grid if cull else None, images, poses,
                    )
                    return (state, opt_state, key), m

                (state, opt_state, key), ms = jax.lax.scan(
                    body, (state, opt_state, key), None, length=upd
                )
                key, ku = jax.random.split(key)
                occ_grid = occ_update(occ_grid, ku, state)
                return (state, opt_state, occ_grid, key), jax.tree_util.tree_map(
                    lambda x: x[-1], ms
                )

            (state, opt_state, occ_grid, key), ms = jax.lax.scan(
                seg, (state, opt_state, occ_grid, key), None, length=n_seg
            )
            return state, opt_state, occ_grid, jax.tree_util.tree_map(
                lambda x: x[-1], ms
            )

        return block

    def run_steps(self, n_steps: int, block_size: int = 0, precrop: bool = False):
        """Run `n_steps` optimization steps, batching them into scanned
        blocks of `block_size` (default: args.steps_per_dispatch, min 1)
        dispatched as single XLA programs. Splits at static boundaries (TV
        cutoff at iter 1000, occupancy warmup/readiness) so each block is
        shape- and flag-static. Returns the final step's metrics."""
        args = self.args
        self._ensure_device_scene()
        block_size = block_size or max(1, getattr(args, "steps_per_dispatch", 1))
        occ_cfg = self.render_cfg.occupancy
        metrics = None
        remaining = n_steps
        while remaining > 0:
            use_tv = self.global_step <= 1000 and args.tv_loss_weight > 0 and (
                args.i_embed == EMBED_HASH
            )
            # steps until the TV-off boundary (step counter is incremented
            # after each step, so step index global_step+1..; TV applies
            # while global_step <= 1000)
            k = remaining
            if use_tv:
                tv_left = 1001 - self.global_step
                if occ_cfg is not None:
                    # round the boundary UP to the occupancy update grid so
                    # the TV window never ends mid-interval (which would
                    # force per-step fallback programs — up to 2 extra XLA
                    # compiles for <=15 steps of work). Costs <=15 extra TV
                    # steps at the (tiny) warmup weight; documented in
                    # PARITY.md loop deviations.
                    upd = occ_cfg.update_every
                    tv_left = -(-tv_left // upd) * upd
                k = min(k, tv_left)

            if occ_cfg is None:
                occ_mode = None
            else:
                if not self._occ_ready and self.occ_grid is not None:
                    self._occ_ready = float(jnp.max(self.occ_grid)) > 0.0
                active = self.global_step >= occ_cfg.warmup_steps and self._occ_ready
                occ_mode = "cull" if active else "update"
                if not active and self.global_step < occ_cfg.warmup_steps:
                    # stop at the warmup boundary to re-check activation;
                    # past it (grid not ready yet) run full update-mode
                    # blocks — readiness is re-checked per block.
                    k = min(k, occ_cfg.warmup_steps - self.global_step)

            keep = None
            if occ_mode == "cull" and self.keep_schedule:
                keep, nxt = self._keep_at(self.global_step)
                if nxt is not None:
                    # stop at the next anneal boundary (static keep per block)
                    k = min(k, nxt - self.global_step)

            b = min(k, block_size)
            if occ_mode is not None:
                if occ_mode == "update":
                    # Unculled warmup steps are ~10x slower than culled ones;
                    # cap the block so a single XLA dispatch stays well under
                    # the TPU runtime's execution watchdog (~1-2 min kills
                    # the worker — the round-1 BENCH crash, VERDICT.md).
                    b = min(b, occ_cfg.update_every)
                b = (b // occ_cfg.update_every) * occ_cfg.update_every
            if b == 0:
                # sub-update_every remainder: fall back to single host steps
                for _ in range(min(k, occ_cfg.update_every if occ_cfg else 1)):
                    batch = self._host_sample(precrop)
                    metrics = self.step(batch)
                    remaining -= 1
                continue

            cache_key = (b, use_tv, occ_mode, precrop, keep)
            fn = self._block_cache.get(cache_key)
            if fn is None:
                fn = self._build_block(b, use_tv, occ_mode, precrop, keep=keep)
                self._block_cache[cache_key] = fn
            self.key, kb = jax.random.split(self.key)
            tv_w = jnp.float32(args.tv_loss_weight if use_tv else 0.0)
            occ_in = self.occ_grid if occ_mode is not None else None
            self.state, self.opt_state, occ_out, metrics = fn(
                self.state, self.opt_state, occ_in, kb, tv_w,
                self._d_images, self._d_poses,
            )
            if occ_mode is not None:
                self.occ_grid = occ_out
            self.global_step += b
            remaining -= b
        return metrics

    # ------------------------------------------------------------------ #
    # Scanned multi-step training over a flat ray POOL (st3d / batching
    # mode): batch k = pool[offset + k*N_rand : ...], sliced ON DEVICE
    # inside the scan — the reference's sequential pool consumption
    # (run_nerf.py:417-428) at one dispatch per block.
    # ------------------------------------------------------------------ #
    def _build_pool_block(self, n_steps: int, with_tv: bool, occ_mode,
                          pool_keys: tuple, keep: Optional[float] = None):
        """occ_mode: None / "update" / "cull" — same occupancy lifecycle as
        `_build_block` (the pool path previously hardcoded occ_grid=None,
        silently ignoring --use_occupancy for batching/st3d runs)."""
        args = self.args
        optimizer = self.optimizer
        render_cfg = self._render_cfg_for(keep)
        loss_fn = make_loss_fn(
            args, render_cfg, self.query_fn, self.bbox,
            self.model_cfg.hash_grid, with_tv=with_tv,
            hwf=self.scene.hwf if self.scene is not None else None,
        )
        n_rand = args.N_rand
        near, far = self.near, self.far
        use_vdirs = self.render_cfg.use_viewdirs
        occ_cfg = render_cfg.occupancy

        def train_one(state, opt_state, pool, offset, k_step, tv_w, occ_grid):
            batch = {
                name: jax.lax.dynamic_slice_in_dim(pool[name], offset, n_rand)
                for name in pool_keys
            }
            batch["near"] = jnp.full((n_rand,), near, jnp.float32)
            batch["far"] = jnp.full((n_rand,), far, jnp.float32)
            if use_vdirs:
                d = batch["rays_d"]
                batch["viewdirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            batch = self._shard_rays_constraint(batch)
            (loss, (psnr, img_loss)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state, batch, k_step, tv_w, occ_grid)
            updates, opt_state = optimizer.update(grads, opt_state, state)
            state = optax.apply_updates(state, updates)
            return state, opt_state, {
                "loss": loss, "psnr": psnr, "img_loss": img_loss
            }

        if occ_mode is None:

            @jax.jit
            def block(state, opt_state, occ_grid, pool, offset, key, tv_w):
                def body(carry, k_step):
                    state, opt_state, offset = carry
                    state, opt_state, m = train_one(
                        state, opt_state, pool, offset, k_step, tv_w, None
                    )
                    return (state, opt_state, offset + n_rand), m

                keys = jax.random.split(key, n_steps)
                (state, opt_state, offset), ms = jax.lax.scan(
                    body, (state, opt_state, offset), keys
                )
                return state, opt_state, occ_grid, jax.tree_util.tree_map(
                    lambda x: x[-1], ms
                )

            return block

        upd = occ_cfg.update_every
        n_seg, rem = divmod(n_steps, upd)
        assert rem == 0, "occupancy pool block must be a multiple of update_every"
        cull = occ_mode == "cull"
        occ_update = self._occ_update_fn

        @jax.jit
        def block(state, opt_state, occ_grid, pool, offset, key, tv_w):
            def seg(carry, _):
                state, opt_state, occ_grid, offset, key = carry

                def body(c, k_step):
                    state, opt_state, offset = c
                    state, opt_state, m = train_one(
                        state, opt_state, pool, offset, k_step, tv_w,
                        occ_grid if cull else None,
                    )
                    return (state, opt_state, offset + n_rand), m

                key, kb, ku = jax.random.split(key, 3)
                (state, opt_state, offset), ms = jax.lax.scan(
                    body, (state, opt_state, offset), jax.random.split(kb, upd)
                )
                occ_grid = occ_update(occ_grid, ku, state)
                return (state, opt_state, occ_grid, offset, key), jax.tree_util.tree_map(
                    lambda x: x[-1], ms
                )

            (state, opt_state, occ_grid, offset, key), ms = jax.lax.scan(
                seg, (state, opt_state, occ_grid, offset, key), None, length=n_seg
            )
            return state, opt_state, occ_grid, jax.tree_util.tree_map(
                lambda x: x[-1], ms
            )

        return block

    def run_steps_pool(self, pool: Dict[str, jnp.ndarray], offset: int,
                       n_steps: int, block_size: int = 0) -> Dict[str, float]:
        """Run `n_steps` steps consuming pool[offset:] sequentially (caller
        handles epoch reshuffle; offset+n_steps*N_rand must fit the pool).
        Returns the final step's metrics."""
        args = self.args
        block_size = block_size or max(1, getattr(args, "steps_per_dispatch", 1))
        if not hasattr(self, "_pool_block_cache"):
            self._pool_block_cache = {}
        metrics = None
        pool_keys = tuple(sorted(pool))
        occ_cfg = self.render_cfg.occupancy
        done = 0
        while done < n_steps:
            use_tv = self.global_step <= 1000 and args.tv_loss_weight > 0 and (
                args.i_embed == EMBED_HASH
            )
            k = n_steps - done
            if use_tv:
                tv_left = 1001 - self.global_step
                if occ_cfg is not None:
                    upd = occ_cfg.update_every
                    tv_left = -(-tv_left // upd) * upd  # see run_steps
                k = min(k, tv_left)

            if occ_cfg is None:
                occ_mode = None
            else:
                if not self._occ_ready and self.occ_grid is not None:
                    self._occ_ready = float(jnp.max(self.occ_grid)) > 0.0
                active = self.global_step >= occ_cfg.warmup_steps and self._occ_ready
                occ_mode = "cull" if active else "update"
                if not active and self.global_step < occ_cfg.warmup_steps:
                    k = min(k, occ_cfg.warmup_steps - self.global_step)

            keep = None
            if occ_mode == "cull" and self.keep_schedule:
                keep, nxt = self._keep_at(self.global_step)
                if nxt is not None:
                    k = min(k, nxt - self.global_step)

            b = min(k, block_size)
            if occ_mode is not None:
                if occ_mode == "update":
                    b = min(b, occ_cfg.update_every)
                b = (b // occ_cfg.update_every) * occ_cfg.update_every
                if b == 0:
                    # sub-update_every remainder: single jitted steps via the
                    # sliced batch (occupancy maintained by self.step)
                    for _ in range(min(k, occ_cfg.update_every)):
                        batch = {
                            name: jax.lax.dynamic_slice_in_dim(
                                pool[name],
                                offset + done * args.N_rand, args.N_rand,
                            )
                            for name in pool_keys
                        }
                        batch["near"] = jnp.full((args.N_rand,), self.near, jnp.float32)
                        batch["far"] = jnp.full((args.N_rand,), self.far, jnp.float32)
                        metrics = self.step(batch)
                        done += 1
                    continue

            cache_key = (b, use_tv, occ_mode, pool_keys, keep)
            fn = self._pool_block_cache.get(cache_key)
            if fn is None:
                fn = self._build_pool_block(b, use_tv, occ_mode, pool_keys,
                                            keep=keep)
                self._pool_block_cache[cache_key] = fn
            self.key, kb = jax.random.split(self.key)
            tv_w = jnp.float32(args.tv_loss_weight if use_tv else 0.0)
            occ_in = self.occ_grid if occ_mode is not None else None
            self.state, self.opt_state, occ_out, metrics = fn(
                self.state, self.opt_state, occ_in, pool,
                jnp.int32(offset + done * args.N_rand), kb, tv_w,
            )
            if occ_mode is not None:
                self.occ_grid = occ_out
            self.global_step += b
            done += b
        return metrics

    def _host_sample(self, precrop: bool):
        rng = getattr(self, "_np_rng", None)
        if rng is None:
            rng = self._np_rng = np.random.default_rng(0)
        img_i = int(rng.choice(self.scene.i_train))
        return self.sample_image(img_i, self.args.N_rand, precrop)

    # ------------------------------------------------------------------ #
    # Ray sampling (host-orchestrated, device-executed)
    # ------------------------------------------------------------------ #
    def build_ray_pool(self) -> jnp.ndarray:
        """Shuffled [N*H*W, 3, 3] (o, d, rgb) pool over train images
        (reference run_nerf.py:510-519), built by the native C++ data path
        (hashnerf_tpu/native/raypool.cpp) when available."""
        from hashnerf_tpu import native

        sc = self.scene
        pool = native.build_ray_pool(
            sc.poses[sc.i_train], sc.images[sc.i_train], sc.K, seed=0, shuffle=True
        )
        return jnp.asarray(pool)

    def sample_pool(self, pool: jnp.ndarray, i_batch: int, n_rand: int):
        batch = pool[i_batch : i_batch + n_rand]
        return {
            "rays_o": batch[:, 0],
            "rays_d": batch[:, 1],
            "target": batch[:, 2],
            "near": jnp.full((batch.shape[0],), self.near, jnp.float32),
            "far": jnp.full((batch.shape[0],), self.far, jnp.float32),
        }

    def sample_image(self, img_i: int, n_rand: int, precrop: bool):
        """Random pixels from one image (reference run_nerf.py:577-605)."""
        sc = self.scene
        H, W = sc.H, sc.W
        self.key, k = jax.random.split(self.key)
        target = jnp.asarray(sc.images[img_i])
        pose = jnp.asarray(sc.poses[img_i, :3, :4])
        batch = _sample_image_rays(
            target, pose, jnp.asarray(sc.K), H, W, n_rand, k, precrop,
            float(self.args.precrop_frac),
        )
        batch["near"] = jnp.full((n_rand,), self.near, jnp.float32)
        batch["far"] = jnp.full((n_rand,), self.far, jnp.float32)
        return batch

    # ------------------------------------------------------------------ #
    # Eval / rendering
    # ------------------------------------------------------------------ #
    # Train with budgeted culling but render eval/test images EXACTLY by
    # default: the fixed keep budget clips geometry on full-image ray grids
    # (measured -3.3 dB on otherwise identical training,
    # BENCH_QUALITY_abl_evalfull vs _packed1024). Culled eval is opt-in for
    # throughput (bench_quality QB_EVALCULL=1).
    eval_cull: bool = False

    @property
    def _eval_occ_grid(self):
        """Occupancy grid for eval-time culling (only once populated —
        --use_occupancy opts into the budgeted-culling semantics). Enabled
        by the legacy eval_cull switch (train budgets at eval) OR by
        --occ_keep_eval (dedicated loose eval budget, see
        RenderConfig.eval_mode)."""
        occ = self.render_cfg.occupancy
        if occ is None or not self._occ_ready:
            return None
        if self.eval_cull or occ.keep_fraction_eval is not None:
            return self.occ_grid
        return None

    def render_image(self, c2w, H=None, W=None, K=None, chunk=None):
        sc = self.scene
        H, W, K = H or sc.H, W or sc.W, (K if K is not None else sc.K)
        return render(
            self.state, self.query_fn, H, W, K, self.bbox,
            self.render_cfg.eval_mode(), chunk=chunk or self.args.chunk,
            c2w=jnp.asarray(c2w)[:3, :4], near=self.near, far=self.far,
            occ_grid=self._eval_occ_grid,
        )

    def render_test_path(self, poses, gt_imgs=None, savedir=None, render_factor=0):
        sc = self.scene
        return render_path(
            self.state, self.query_fn, poses, [sc.H, sc.W, sc.focal], sc.K,
            self.bbox, self.render_cfg, chunk=self.args.chunk,
            near=self.near, far=self.far, gt_imgs=gt_imgs,
            savedir=savedir, render_factor=render_factor,
            occ_grid=self._eval_occ_grid,
        )

    # ------------------------------------------------------------------ #
    # Checkpointing
    # ------------------------------------------------------------------ #
    def save(self, savepath: str):
        save_checkpoint(savepath, self.global_step, self.state, self.opt_state)

    def try_restore(self, savedir: str, ft_path: Optional[str] = None) -> bool:
        loaded = load_latest_checkpoint(
            savedir, self.state, self.opt_state, ft_path, mesh=self.mesh
        )
        if loaded is None:
            return False
        self.global_step, self.state, self.opt_state = loaded
        return True


@functools.partial(
    jax.jit, static_argnames=("H", "W", "n_rand", "precrop", "precrop_frac")
)
def _sample_image_rays(target, pose, K, H, W, n_rand, key, precrop, precrop_frac):
    """Pixel selection without replacement + ray generation, on device."""
    from hashnerf_tpu.ops.rays import get_rays

    rays_o, rays_d = get_rays(H, W, K, pose)
    if precrop:
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)
        ys = jnp.arange(H // 2 - dH, H // 2 + dH)
        xs = jnp.arange(W // 2 - dW, W // 2 + dW)
    else:
        ys = jnp.arange(H)
        xs = jnp.arange(W)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([yy.reshape(-1), xx.reshape(-1)], -1)
    sel = jax.random.choice(key, coords.shape[0], (n_rand,), replace=False)
    sc = coords[sel]
    return {
        "rays_o": rays_o[sc[:, 0], sc[:, 1]],
        "rays_d": rays_d[sc[:, 0], sc[:, 1]],
        "target": target[sc[:, 0], sc[:, 1]],
    }


def train_loop(args, scene: Scene, n_iters: Optional[int] = None, log_fn=print):
    """The standard training loop (reference run_nerf.py:503-721)."""
    trainer = Trainer(args, scene)

    basedir, expname = args.basedir, args.expname
    savepath = os.path.join(basedir, expname)
    os.makedirs(savepath, exist_ok=True)
    # --no_reload suppresses auto-resume entirely (reference
    # run_nerf_helpers.py:153: `if len(ckpts) > 0 and not args.no_reload`)
    if not args.no_reload:
        trainer.try_restore(savepath, args.ft_path)

    n_iters = n_iters or args.N_iters
    use_batching = not args.no_batching
    pool, pool_dict, i_batch = None, None, 0
    if use_batching:
        pool = trainer.build_ray_pool()

    loss_list, psnr_list, time_list = [], [], []
    start = trainer.global_step + 1
    time0 = time.time()
    np_rng = np.random.default_rng(0)
    spd = max(1, getattr(args, "steps_per_dispatch", 1))

    i = start
    while i <= n_iters:
        if use_batching and spd > 1:
            # scanned span over the device pool, stopping at periodic-event
            # and epoch boundaries
            if pool_dict is None:
                pool_dict = {
                    "rays_o": pool[:, 0], "rays_d": pool[:, 1],
                    "target": pool[:, 2],
                }
            end = n_iters
            for e in (args.i_print, args.i_weights, args.i_video, args.i_testset):
                if e and e > 0:
                    end = min(end, ((i - 1) // e + 1) * e)
            end = min(end, i + (pool.shape[0] - i_batch) // args.N_rand - 1)
            if end < i:
                trainer.key, k_perm = jax.random.split(trainer.key)
                pool = pool[jax.random.permutation(k_perm, pool.shape[0])]
                pool_dict, i_batch = None, 0
                continue
            metrics = trainer.run_steps_pool(
                pool_dict, i_batch, end - i + 1, block_size=spd
            )
            i_batch += (end - i + 1) * args.N_rand
            i = end
        elif use_batching or spd <= 1:
            if use_batching:
                batch = trainer.sample_pool(pool, i_batch, args.N_rand)
                i_batch += args.N_rand
                if i_batch >= pool.shape[0]:
                    trainer.key, k_perm = jax.random.split(trainer.key)
                    pool = pool[jax.random.permutation(k_perm, pool.shape[0])]
                    i_batch = 0
            else:
                img_i = int(np_rng.choice(scene.i_train))
                batch = trainer.sample_image(
                    img_i, args.N_rand, precrop=i < args.precrop_iters
                )
            metrics = trainer.step(batch)
        else:
            # Scanned span: fuse steps [i, end] into lax.scan blocks,
            # stopping at the next periodic-event / precrop boundary.
            end = n_iters
            for e in (args.i_print, args.i_weights, args.i_video, args.i_testset):
                if e and e > 0:
                    end = min(end, ((i - 1) // e + 1) * e)
            precrop = i < args.precrop_iters
            if precrop:
                end = min(end, args.precrop_iters - 1)
            metrics = trainer.run_steps(end - i + 1, block_size=spd, precrop=precrop)
            i = end

        if i % args.i_weights == 0:
            trainer.save(os.path.join(savepath, "{:06d}.ckpt".format(i)))
            log_fn(f"Saved checkpoints at {savepath}")

        if i % args.i_video == 0 and i > 0 and len(scene.render_poses) > 0:
            rgbs, depths, _ = trainer.render_test_path(scene.render_poses)
            from hashnerf_tpu.utils.io import save_video

            moviebase = os.path.join(savepath, "{}_spiral_{:06d}_".format(expname, i))
            save_video(moviebase + "rgb.mp4", rgbs)
            save_video(moviebase + "disp.mp4", depths / max(np.max(depths), 1e-8))

        if i % args.i_testset == 0 and i > 0 and len(scene.i_test) > 0:
            testsavedir = os.path.join(savepath, "testset_{:06d}".format(i))
            trainer.render_test_path(
                scene.poses[scene.i_test], gt_imgs=scene.images[scene.i_test],
                savedir=testsavedir,
            )
            log_fn(f"Saved test set to {testsavedir}")

        if i % args.i_print == 0:
            loss_v = float(metrics["loss"])
            psnr_v = float(metrics["psnr"])
            t = time.time() - time0
            log_fn(f"[TRAIN] Iter: {i} Loss: {loss_v}  PSNR: {psnr_v}")
            loss_list.append(loss_v)
            psnr_list.append(psnr_v)
            time_list.append(t)
            from hashnerf_tpu.utils.io import save_loss_history

            save_loss_history(savepath, loss_list, psnr_list, time_list)

        i += 1

    return trainer

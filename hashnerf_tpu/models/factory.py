"""Model/encoder factory: builds params + a pure network-query function.

Capability parity: /root/reference/run_nerf_helpers.py:51-200 (create_nerf),
:230-260 (get_embedder), :203-227 (run_network/batchify).

Differences by design (TPU-first):
  * One params pytree {hash_table?, coarse, fine?} — the hash table is shared
    by coarse and fine MLPs exactly as in the reference (a single embed_fn is
    captured by network_query_fn there).
  * No netchunk-style python chunking: the whole (rays x samples) point batch
    is one XLA program; memory is managed by jit + remat, not host loops.
  * Out-of-bbox points get sigma (channel 3) zeroed — the reference zeroes the
    LAST channel (run_nerf_helpers.py:225), which is the sigma channel for
    every configuration it actually runs; indexing channel 3 is the stated
    intent ("set sigma to 0 for invalid points") and stays correct for >4-ch
    outputs (NeRFGradient).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hashnerf_tpu.ops.hash_encoding import HashGridConfig, hash_encode, init_hash_table
from hashnerf_tpu.ops.positional import PositionalConfig, positional_encode
from hashnerf_tpu.ops.sh_encoding import sh_encode, sh_out_dim
from hashnerf_tpu.models.nerf import (
    NeRFConfig,
    NeRFSmallConfig,
    apply_nerf,
    apply_nerf_gradient,
    apply_nerf_small,
    init_nerf,
    init_nerf_gradient,
    init_nerf_small,
)

# Embedder ids (reference run_nerf.py:80-83): -1 identity, 0 positional,
# 1 hash grid, 2 spherical harmonics.
EMBED_IDENTITY = -1
EMBED_POSITIONAL = 0
EMBED_HASH = 1
EMBED_SH = 2


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    i_embed: int = EMBED_HASH
    i_embed_views: int = EMBED_SH
    multires: int = 10
    multires_views: int = 4
    use_viewdirs: bool = True
    use_gradient: bool = False
    N_importance: int = 0
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    sh_degree: int = 4
    # Single network for both render passes (Instant-NGP style): state.fine
    # stays None and the coarse params serve the fine query too.
    share_fine: bool = False
    hash_grid: HashGridConfig = dataclasses.field(default_factory=HashGridConfig)
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for MXU-friendly MLPs
    # Fast table-gradient path (multi-operand sort + Pallas aligned-window
    # MXU accumulation instead of XLA scatter-add, kernels/segment_scatter.py
    # -> kernels/pallas_segment_accum.py). None = auto: on for TPU.
    fast_hash_grad: Optional[bool] = None
    # Corner-packed table layout (ops/packed_grid.py): dense direct-indexed
    # coarse levels + block-hashed 27-vertex-slab fine levels — ONE row fetch
    # per (sample, level) instead of 8. Changes the parameter pytree
    # (hash_table becomes {"dense","fine"}); off = reference-exact layout.
    packed_layout: bool = False
    log2_blocks: int = -1  # packed fine rows/level; -1 = log2_hashmap_size-3

    @property
    def packed_grid(self) -> "PackedGridConfig":
        from hashnerf_tpu.ops.packed_grid import PackedGridConfig

        h = self.hash_grid
        if self.log2_blocks != -1 and self.log2_blocks <= 0:
            # an explicit 0 (or other non-positive value) is a config error,
            # not a request for the auto default (ADVICE r3 #5)
            raise ValueError(
                f"log2_blocks must be > 0 or -1 (auto); got {self.log2_blocks}"
            )
        b = self.log2_blocks if self.log2_blocks > 0 else h.log2_hashmap_size - 3
        return PackedGridConfig(
            n_levels=h.n_levels,
            n_features_per_level=h.n_features_per_level,
            log2_hashmap_size=h.log2_hashmap_size,
            base_resolution=h.base_resolution,
            finest_resolution=h.finest_resolution,
            log2_blocks=b,
        )

    @property
    def _compute_dtype(self):
        return None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)


class NGPState(NamedTuple):
    """All learnable state. hash_table is None unless i_embed == EMBED_HASH."""

    hash_table: Optional[jnp.ndarray]
    coarse: Any
    fine: Optional[Any]


def _point_encoder(cfg: ModelConfig) -> Tuple[Callable, int]:
    """Returns (encode(state, x, bbox) -> (feat, keep_mask), out_dim)."""
    if cfg.i_embed == EMBED_IDENTITY:
        return (lambda state, x, bb: (x, jnp.ones(x.shape[:-1], bool))), 3
    if cfg.i_embed == EMBED_POSITIONAL:
        pcfg = PositionalConfig(num_freqs=cfg.multires, max_freq_log2=cfg.multires - 1)
        return (
            lambda state, x, bb: (positional_encode(x, pcfg), jnp.ones(x.shape[:-1], bool))
        ), pcfg.out_dim
    if cfg.i_embed == EMBED_HASH:
        if cfg.packed_layout:
            from hashnerf_tpu.ops.packed_grid import packed_encode

            pcfg = cfg.packed_grid
            return (
                lambda state, x, bb: packed_encode(state.hash_table, x, bb[0], bb[1], pcfg)
            ), pcfg.out_dim
        hcfg = cfg.hash_grid
        fast = cfg.fast_hash_grad
        if fast is None:
            fast = jax.default_backend() == "tpu"
        if fast:
            from hashnerf_tpu.kernels.hash_encode_vjp import hash_encode_fast

            return (
                lambda state, x, bb: hash_encode_fast(state.hash_table, x, bb[0], bb[1], hcfg)
            ), hcfg.out_dim
        return (
            lambda state, x, bb: hash_encode(state.hash_table, x, bb[0], bb[1], hcfg)
        ), hcfg.out_dim
    if cfg.i_embed == EMBED_SH:
        deg = cfg.sh_degree
        return (
            lambda state, x, bb: (sh_encode(x, deg), jnp.ones(x.shape[:-1], bool))
        ), sh_out_dim(deg)
    raise ValueError(f"unknown i_embed {cfg.i_embed}")


def _view_encoder(cfg: ModelConfig) -> Tuple[Optional[Callable], int]:
    if not cfg.use_viewdirs:
        return None, 0
    i = cfg.i_embed_views
    if i == EMBED_IDENTITY:
        return (lambda d: d), 3
    if i == EMBED_POSITIONAL:
        pcfg = PositionalConfig(num_freqs=cfg.multires_views, max_freq_log2=cfg.multires_views - 1)
        return (lambda d: positional_encode(d, pcfg)), pcfg.out_dim
    if i == EMBED_SH:
        deg = cfg.sh_degree
        return (lambda d: sh_encode(d, deg)), sh_out_dim(deg)
    raise ValueError(f"unsupported i_embed_views {i}")


def make_encoders(cfg: ModelConfig):
    pt_enc, input_ch = _point_encoder(cfg)
    view_enc, input_ch_views = _view_encoder(cfg)
    return pt_enc, input_ch, view_enc, input_ch_views


def create_model(key: jax.Array, cfg: ModelConfig, pt_encoder: Optional[Callable] = None):
    """Build (state, query_fn).

    query_fn(state, pts (R, S, 3), viewdirs (R, 3) | None, bbox (2, 3), fine)
      -> raw (R, S, C).

    pt_encoder optionally overrides the point encoder (same signature
    (state, x, bbox) -> (feats, keep_mask)) — used by the table-sharded
    parallel mode to swap in the shard_map encoder.
    """
    pt_enc, input_ch, view_enc, input_ch_views = make_encoders(cfg)
    if pt_encoder is not None:
        pt_enc = pt_encoder

    k_table, k_coarse, k_fine = jax.random.split(key, 3)

    if cfg.i_embed == EMBED_HASH:
        mlp_cfg = NeRFSmallConfig(
            num_layers=2,
            hidden_dim=64,
            geo_feat_dim=15,
            num_layers_color=3,
            hidden_dim_color=64,
            input_ch=input_ch,
            input_ch_views=input_ch_views,
        )
        init_fn = lambda k: init_nerf_small(k, mlp_cfg)
        apply_fn = lambda p, x: apply_nerf_small(p, x, mlp_cfg, cfg._compute_dtype)
        fine_init_fn = init_fn
        fine_apply_fn = apply_fn
        if cfg.packed_layout:
            from hashnerf_tpu.ops.packed_grid import init_packed_tables

            table = init_packed_tables(k_table, cfg.packed_grid)
        else:
            table = init_hash_table(k_table, cfg.hash_grid)
    else:
        output_ch = 5 if cfg.N_importance > 0 else 4
        ncfg = NeRFConfig(
            D=cfg.netdepth,
            W=cfg.netwidth,
            input_ch=input_ch,
            input_ch_views=input_ch_views,
            output_ch=output_ch,
            use_viewdirs=cfg.use_viewdirs,
        )
        nfcfg = dataclasses.replace(ncfg, D=cfg.netdepth_fine, W=cfg.netwidth_fine)
        if cfg.use_gradient:
            init_fn = lambda k: init_nerf_gradient(k, ncfg)
            apply_fn = lambda p, x: apply_nerf_gradient(p, x, ncfg, cfg._compute_dtype)
            fine_init_fn = lambda k: init_nerf_gradient(k, nfcfg)
            fine_apply_fn = lambda p, x: apply_nerf_gradient(p, x, nfcfg, cfg._compute_dtype)
        else:
            init_fn = lambda k: init_nerf(k, ncfg)
            apply_fn = lambda p, x: apply_nerf(p, x, ncfg, cfg._compute_dtype)
            fine_init_fn = lambda k: init_nerf(k, nfcfg)
            fine_apply_fn = lambda p, x: apply_nerf(p, x, nfcfg, cfg._compute_dtype)
        table = None

    state = NGPState(
        hash_table=table,
        coarse=init_fn(k_coarse),
        fine=fine_init_fn(k_fine)
        if (cfg.N_importance > 0 and not cfg.share_fine)
        else None,
    )

    def query_fn(state: NGPState, pts, viewdirs, bbox, fine: bool = False):
        """Encode points (+views), run the MLP, zero sigma outside the bbox.

        Equivalent of run_network (run_nerf_helpers.py:212-227).
        """
        R, S = pts.shape[0], pts.shape[1]
        flat = pts.reshape(-1, 3)
        embedded, keep_mask = pt_enc(state, flat, bbox)
        if view_enc is not None and viewdirs is not None:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(-1, 3)
            embedded = jnp.concatenate([embedded, view_enc(dirs)], axis=-1)
        mlp_params = state.fine if (fine and state.fine is not None) else state.coarse
        mlp_apply = fine_apply_fn if (fine and state.fine is not None) else apply_fn
        raw = mlp_apply(mlp_params, embedded)
        # sigma -> 0 for clipped points
        sigma = jnp.where(keep_mask, raw[..., 3], 0.0)
        raw = raw.at[..., 3].set(sigma)
        return raw.reshape(R, S, raw.shape[-1])

    return state, query_fn

"""Checkpoint save/restore for {step, model state, optimizer state}.

Capability parity: reference run_nerf.py:663-680 (torch.save of global_step +
model/embedding/optimizer state dicts every i_weights iters) and
run_nerf_helpers.py:149-168 (auto-resume from latest, --ft_path pin).

Format: flax msgpack serialization of the jax pytrees — a single portable
file per step, `{iter:06d}.ckpt` — PLUS per-leaf sharding specs (orbax-style:
the PartitionSpec axis names of every NamedSharding-placed leaf are recorded
at save and re-placed onto the live mesh at restore). This makes the sharded
trainers (data-parallel `--num_devices`, table-sharded
parallel/table_sharded.py) round-trip: a restored table lands level-sharded
on 'model' again instead of replicated/host-resident. Single-host scope: the
save gathers fully-addressable arrays to host (np.asarray); a multi-host
deployment would swap this file's IO for orbax's per-host shard files while
keeping the same spec metadata.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _leaf_specs(tree) -> list:
    """Per-leaf PartitionSpec (as a plain tuple of axis names / None), in
    tree_flatten order; None for leaves without a NamedSharding."""
    specs = []
    for x in jax.tree_util.tree_leaves(tree):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding):
            specs.append(tuple(sh.spec))
        else:
            specs.append(None)
    return specs


def _place_tree(tree, specs: Optional[Sequence], mesh: Optional[Mesh]):
    """device_put every leaf onto `mesh` with its saved spec (axes missing
    from the mesh degrade to replicated on that dim). No-op without a mesh."""
    if mesh is None:
        return tree
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if specs is None:
        specs = [None] * len(leaves)
    out = []
    for x, spec in zip(leaves, specs):
        if spec is not None:
            sp = P(*[
                a if (a is None or a in mesh.axis_names) else None
                for a in spec
            ])
        else:
            sp = P()
        out.append(jax.device_put(x, NamedSharding(mesh, sp)))
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(path: str, global_step: int, state, opt_state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from flax import serialization

    payload = {
        "global_step": global_step,
        "state": serialization.to_bytes(_to_numpy_tree(state)),
        "opt_state": serialization.to_bytes(_to_numpy_tree(opt_state)),
        "state_specs": _leaf_specs(state),
        "opt_state_specs": _leaf_specs(opt_state),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(
    path: str, state_template, opt_state_template, mesh: Optional[Mesh] = None
):
    from flax import serialization

    with open(path, "rb") as f:
        payload = pickle.load(f)
    try:
        state = serialization.from_bytes(state_template, payload["state"])
        opt_state = serialization.from_bytes(
            opt_state_template, payload["opt_state"]
        )
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint {path} does not match the configured model "
            "structure — most commonly a --packed_layout/--log2_blocks or "
            "n_levels/n_features mismatch between the run that saved it and "
            f"this one ({e})"
        ) from e
    state = _place_tree(state, payload.get("state_specs"), mesh)
    opt_state = _place_tree(opt_state, payload.get("opt_state_specs"), mesh)
    return payload["global_step"], state, opt_state


def load_latest_checkpoint(
    savedir: str,
    state_template,
    opt_state_template,
    ft_path: Optional[str] = None,
    mesh: Optional[Mesh] = None,
) -> Optional[Tuple[int, Any, Any]]:
    """Find + load the latest .ckpt (or a pinned ft_path). Returns None if
    nothing to restore."""
    if ft_path is not None and ft_path != "None":
        ckpts = [ft_path]
    elif os.path.isdir(savedir):
        ckpts = [
            os.path.join(savedir, f)
            for f in sorted(os.listdir(savedir))
            if f.endswith(".ckpt")
        ]
    else:
        ckpts = []
    if not ckpts:
        return None
    print(f"Reloading from {ckpts[-1]}")
    return load_checkpoint(ckpts[-1], state_template, opt_state_template, mesh)

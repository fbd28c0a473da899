"""Checkpoint save/restore for {step, model state, optimizer state}.

Capability parity: reference run_nerf.py:663-680 (torch.save of global_step +
model/embedding/optimizer state dicts every i_weights iters) and
run_nerf_helpers.py:149-168 (auto-resume from latest, --ft_path pin).
Format: flax msgpack serialization of the jax pytrees — a single portable
file per step, `{iter:06d}.ckpt`.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, global_step: int, state, opt_state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from flax import serialization

    payload = {
        "global_step": global_step,
        "state": serialization.to_bytes(_to_numpy_tree(state)),
        "opt_state": serialization.to_bytes(_to_numpy_tree(opt_state)),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, state_template, opt_state_template):
    from flax import serialization

    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(state_template, payload["state"])
    opt_state = serialization.from_bytes(opt_state_template, payload["opt_state"])
    return payload["global_step"], state, opt_state


def load_latest_checkpoint(
    savedir: str, state_template, opt_state_template, ft_path: Optional[str] = None
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
    return load_checkpoint(ckpts[-1], state_template, opt_state_template)

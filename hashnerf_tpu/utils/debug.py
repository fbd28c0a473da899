"""Numerical guardrails.

Capability parity: the reference's DEBUG NaN/Inf scan over all returned maps
(run_nerf_helpers.py:570-573, gated by a module DEBUG flag). Here it is a
host-side check enabled by HASHNERF_DEBUG=1 (or explicitly), usable on any
pytree of arrays.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def debug_enabled() -> bool:
    return os.environ.get("HASHNERF_DEBUG", "0") not in ("0", "", "false")


def check_finite(tree: Any, where: str = "") -> bool:
    """Scan a pytree for NaN/Inf; prints offenders, returns True when clean."""
    clean = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        bad = ~np.isfinite(arr)
        if bad.any():
            clean = False
            name = jax.tree_util.keystr(path)
            print(
                f"! [Numerical Error] {where}{name} contains "
                f"{int(bad.sum())} nan/inf of {arr.size}"
            )
    return clean

"""Checkpoint / resume for MPC-stack state — aux-subsystem parity.

The reference has nothing to persist (SURVEY.md §5: deterministic in-place
transforms); this framework's long-running artifacts are controller setups
(condensed-QP factors), solver warm starts, and rollout snapshots. Saved as
a flat ``.npz`` of pytree leaves + a treedef path spec — dependency-free,
portable across hosts; `orbax` can layer on top for multi-host async saves
when running on pods.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(path: str, tree: Any) -> None:
    """Persist any pytree of arrays (controller, warm-start, trajectory)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, __treedef__=np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    ), **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree`; ``like`` supplies the
    treedef (structure must match what was saved)."""
    data = np.load(path, allow_pickle=False)
    _, treedef = jax.tree_util.tree_flatten(like)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    saved_def = bytes(data["__treedef__"]).decode()
    if saved_def != str(treedef):
        raise ValueError(
            "checkpoint treedef mismatch:\n saved: "
            f"{saved_def}\n expected: {treedef}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)

"""Checkpoint / resume for device-resident env and training state.

SURVEY.md §5.4: the functional core makes checkpointing trivial — the carry
pytree *is* the checkpoint. These helpers save/restore any pytree (EnvCarry,
PPOState, raw (qpos, qvel) snapshots) via orbax when available, falling back
to a numpy ``.npz`` of the flattened leaves.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np

__all__ = ["save_pytree", "restore_pytree"]


def save_pytree(path: str, tree: Any) -> str:
    """Save a pytree of arrays; returns the path written."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, tree, force=True)
        return path
    except Exception:
        # fallback: flatten to npz + pickled treedef
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(tree)
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            treedef=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        )
        return path if path.endswith(".npz") else path + ".npz"


def restore_pytree(path: str) -> Any:
    """Restore a pytree written by :func:`save_pytree`."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        checkpointer = ocp.PyTreeCheckpointer()
        return checkpointer.restore(path)
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path, allow_pickle=False)
    import jax

    treedef = pickle.loads(data["treedef"].tobytes())
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    return jax.tree_util.tree_unflatten(treedef, leaves)

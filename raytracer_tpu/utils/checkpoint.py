"""Pytree checkpointing: save/restore scenes, cameras, and fit state.

The reference persists nothing — no image export, no state (SURVEY.md §5).
The rebuild adds npz-based pytree checkpointing (self-contained, no extra
deps) used by the fit driver for resumable optimization, plus optional
orbax-backed checkpoints when available.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(path, tree) -> Path:
    """Save any pytree of arrays to ``.npz`` (structure stored alongside)."""
    path = Path(path)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    return path if path.suffix == ".npz" else path.with_suffix(path.suffix + ".npz")


def load_pytree(path, like):
    """Restore a pytree saved by ``save_pytree``; ``like`` provides structure.

    The treedef string in the file is validated against ``like``'s — loading
    into a mismatched structure fails loudly rather than silently reordering
    leaves.
    """
    data = np.load(Path(path), allow_pickle=False)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    stored = data["__treedef__"].tobytes().decode()
    if stored != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {stored}\n want:  {treedef}"
        )
    n = len(leaves_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)

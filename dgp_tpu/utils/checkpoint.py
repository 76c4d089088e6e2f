"""Checkpoint / resume for model parameter pytrees.

The reference has no save/load anywhere (SURVEY.md §5: long trainings run
uninterruptible). Here params are pure pytrees, so checkpointing is a flat
.npz of leaves; structure comes from a reference pytree at restore time.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, params) -> None:
    leaves = jax.tree_util.tree_leaves(params)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load(path: str, like):
    """Restore params saved by :func:`save` into the structure of ``like``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}"
        )
    new_leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"], dtype=np.asarray(leaf).dtype)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)

"""Hierarchy checkpoint/resume (SURVEY.md §5 "Checkpoint / resume").

AMG setup for ≥100M-DOF problems is expensive enough to cache
(BASELINE.json:11); a hierarchy is a pytree of device arrays with static
aux (formats, offsets, configs), so serialization is: host-fetch every leaf
(numpy) + pickle the treedef/aux, one file per hierarchy.  Solver state
(x, r, k) being plain arrays, the same helpers cover long-CG checkpointing.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Serialize any jax pytree (e.g. a Hierarchy) to `path`."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    host_leaves = [np.asarray(l) for l in leaves]
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": host_leaves}, f)


def load_pytree(path: str, dtype=None):
    """Load a pytree saved by save_pytree; leaves come back as jnp arrays
    (optionally cast float leaves to `dtype`)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = []
    for l in blob["leaves"]:
        arr = jnp.asarray(l)
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(blob["treedef"], leaves)


def save_hierarchy(path: str, hierarchy) -> None:
    save_pytree(path, hierarchy)


def load_hierarchy(path: str):
    return load_pytree(path)

"""Checkpoint / restore — first-class, replacing the reference's ad-hoc
text model dumps (fm_algo_abst.h:109-135, train_embed_algo.cpp:208-268;
PS checkpointing was a TODO at paramserver.h:309).

Format: one .npz with key-path-flattened leaves + a JSON sidecar carrying
tree structure and metadata. Works for params, optimizer state, and whole
TrainStates; sharded arrays are gathered to host on save and re-placed by
the caller's shardings on restore (pass `placer`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import numpy as np

import jax


def _flatten_with_paths(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = leaf
    return out


def save_checkpoint(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Write tree to `<path>.npz` + `<path>.json`."""
    flat = _flatten_with_paths(tree)
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    treedef = jax.tree_util.tree_structure(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(
            {
                "treedef": str(treedef),
                "keys": list(arrays.keys()),
                "metadata": metadata or {},
            },
            f,
        )


def load_checkpoint(
    path: str,
    like: Any,
    placer: Callable[[np.ndarray, Any], Any] | None = None,
) -> Any:
    """Restore into the structure of `like` (a template pytree).

    `placer(array, like_leaf)` lets callers device_put each leaf with its
    sharding; defaults to plain jnp conversion.
    """
    data = np.load(path + ".npz")
    flat_like = _flatten_with_paths(like)
    if set(flat_like.keys()) != set(data.files):
        missing = set(flat_like) - set(data.files)
        extra = set(data.files) - set(flat_like)
        raise ValueError(f"checkpoint mismatch: missing={missing} extra={extra}")
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    restored = []
    for path_elems, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_elems)
        arr = data[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint shape mismatch at {key}: "
                f"saved {tuple(arr.shape)} vs template {tuple(leaf.shape)}"
            )
        if placer is not None:
            restored.append(placer(arr, leaf))
        else:
            restored.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, restored)


def checkpoint_metadata(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)["metadata"]

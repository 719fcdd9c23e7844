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


# ---------------------------------------------------------------------------
# Sharded checkpointing: per-process shard files, no host gather.
#
# save_checkpoint gathers every leaf to one host (np.asarray) — fine for
# single-chip models, wrong for row-sharded vocab tables that are sharded
# precisely because they don't fit one host. These functions write only
# the ADDRESSABLE shards of each leaf per process (file
# `<path>.proc<k>.npz` + one shared `<path>.json` from process 0), and
# restore by re-placing saved slices onto the template's sharding —
# the capability the reference left as TODO (paramserver.h:309).


def _index_key(idx) -> str:
    """Stable string key for a global shard index (tuple of slices)."""
    parts = []
    for s in idx:
        parts.append(f"{'' if s.start is None else s.start}-"
                     f"{'' if s.stop is None else s.stop}")
    return ",".join(parts)


def save_checkpoint_sharded(path: str, tree: Any,
                            metadata: dict | None = None) -> None:
    """Write each process's addressable shards to `<path>.proc<k>.npz`.

    Every leaf key maps to one or more `key>>IDX` entries, IDX encoding
    the global slice the shard covers. Replicated leaves dedup to one
    entry. Works single-process (all shards addressable) and multi-host
    (each process writes only what it holds)."""
    flat = _flatten_with_paths(tree)
    proc = jax.process_index()
    arrays, shapes = {}, {}
    for key, leaf in flat.items():
        arr = jax.numpy.asarray(leaf) if not hasattr(leaf, "addressable_shards") else leaf
        shapes[key] = list(getattr(arr, "shape", ()))
        if hasattr(arr, "addressable_shards") and arr.addressable_shards:
            seen = set()
            for sh in arr.addressable_shards:
                k = _index_key(sh.index)
                if k in seen:
                    continue  # replicated copy on another local device
                seen.add(k)
                arrays[f"{key}>>{k}"] = np.asarray(sh.data)
        else:
            arrays[f"{key}>>"] = np.asarray(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(f"{path}.proc{proc}.npz", **arrays)
    if proc == 0:
        with open(path + ".json", "w") as f:
            json.dump(
                {
                    "sharded": True,
                    "keys": list(flat.keys()),
                    "shapes": shapes,
                    "metadata": metadata or {},
                },
                f,
            )


def load_checkpoint_sharded(path: str, like: Any) -> Any:
    """Restore into `like`'s structure AND shardings.

    Reads every `<path>.proc*.npz` visible on this host, indexes saved
    slices by (leaf, global-slice), then assembles each leaf with
    jax.make_array_from_single_device_arrays against the template leaf's
    sharding — each local device gets exactly the slice it owns, so no
    leaf is ever materialised unsharded."""
    import glob

    shard_files = sorted(glob.glob(path + ".proc*.npz"))
    if not shard_files:
        raise FileNotFoundError(f"no shard files at {path}.proc*.npz")
    slices: dict[str, dict[str, np.ndarray]] = {}
    for f in shard_files:
        data = np.load(f)
        for full_key in data.files:
            key, _, idx = full_key.partition(">>")
            slices.setdefault(key, {})[idx] = data[full_key]

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    restored = []
    for path_elems, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path_elems)
        if key not in slices:
            raise ValueError(f"checkpoint missing leaf {key}")
        saved = slices[key]
        shape = tuple(getattr(leaf, "shape", ()))
        sharding = getattr(leaf, "sharding", None)
        if (
            sharding is None
            or not hasattr(leaf, "addressable_shards")
            or isinstance(sharding, jax.sharding.SingleDeviceSharding)
        ):
            # plain/uncommitted leaf (e.g. an rng key created off-mesh):
            # restore uncommitted so jit can co-place it freely
            (arr,) = saved.values()
            restored.append(jax.numpy.asarray(arr))
            continue
        full = next(
            (v for v in saved.values() if tuple(v.shape) == shape), None
        )
        if full is not None and len(saved) == 1:
            restored.append(jax.device_put(full, sharding))
            continue
        idx_map = sharding.addressable_devices_indices_map(shape)
        pieces, devices = [], []
        for dev, idx in idx_map.items():
            k = _index_key(idx)
            if k in saved:
                piece = saved[k]
            elif full is not None:  # saved unsharded/differently, slice it
                piece = full[idx]
            else:
                raise ValueError(
                    f"shard {k} of {key} not found in {shard_files} "
                    f"(have {sorted(saved)})"
                )
            if tuple(piece.shape) != _slice_shape(idx, shape):
                raise ValueError(
                    f"shard shape mismatch at {key}[{k}]: saved "
                    f"{piece.shape} vs expected {_slice_shape(idx, shape)}")
            pieces.append(jax.device_put(piece, dev))
            devices.append(dev)
        restored.append(
            jax.make_array_from_single_device_arrays(shape, sharding, pieces)
        )
    return jax.tree_util.tree_unflatten(treedef, restored)


def _slice_shape(idx, shape):
    out = []
    for s, dim in zip(idx, shape):
        start = 0 if s.start is None else s.start
        stop = dim if s.stop is None else s.stop
        out.append(stop - start)
    return tuple(out)


def save_sparse_dump(path: str, params: dict, metadata: dict | None = None,
                     atol: float = 0.0) -> int:
    """Compact sparse-model dump on the reference's PS WIRE format
    (utils/wire.py: delta-VarUint sorted keys + fp16 values —
    buffer.h:113-173, paramserver.h:159-176 — applied as a FILE format).

    For vocab-scale FM-family params ({w0, w [V], v [V, K]}): only rows
    some entry of which exceeds `atol` are written (untrained rows of a
    10M-vocab master are exactly zero), each as key=row id + fp16 row
    payload. At 10M vocab with 260k trained rows and K=8 this is ~5 MB
    vs the 360 MB dense npz. fp16 is lossy by design — the same
    precision the reference shipped on every pull/push. Returns rows
    written."""
    import json as _json

    w = np.asarray(params["w"])
    v = np.asarray(params["v"])
    from ..utils import wire

    rows = np.concatenate([w[:, None], v], axis=1)      # [V, 1+K]
    live = np.nonzero(np.any(np.abs(rows) > atol, axis=1))[0]
    payload = wire.encode_sparse_update(
        live.astype(np.int64), rows[live].astype(np.float32))
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                exist_ok=True)
    with open(path + ".spz", "wb") as f:
        f.write(payload)
    with open(path + ".spz.json", "w") as f:
        _json.dump({"n_features": int(w.shape[0]),
                    "factor": int(v.shape[1]),
                    "w0": float(np.asarray(params.get("w0", 0.0))),
                    "rows": int(len(live)),
                    "metadata": metadata or {}}, f)
    return int(len(live))


def load_sparse_dump(path: str) -> tuple[dict, dict]:
    """Inverse of save_sparse_dump -> (params {w0,w,v}, metadata)."""
    import json as _json

    import jax.numpy as jnp

    from ..utils import wire

    with open(path + ".spz.json") as f:
        meta = _json.load(f)
    V, K = meta["n_features"], meta["factor"]
    with open(path + ".spz", "rb") as f:
        ids, values = wire.decode_sparse_update(f.read(), dim=1 + K)
    rows = np.zeros((V, 1 + K), np.float32)
    rows[np.asarray(ids)] = np.asarray(values, np.float32)
    params = {"w0": jnp.asarray(np.float32(meta["w0"])),
              "w": jnp.asarray(rows[:, 0]),
              "v": jnp.asarray(rows[:, 1:])}
    return params, meta.get("metadata", {})

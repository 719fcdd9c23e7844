"""Factorization Machine — TPU-native (reference: train_fm_algo.{h,cpp}).

logit = w0 + sum_j w[id_j] x_j + fm_interaction(V)   (sum-of-squares trick,
reference math at train_fm_algo.cpp:75-83). Trains with Adagrad + logistic
loss like the reference (gradientUpdater.h:128-155); here the whole step is
one jitted function and the gradient comes from autodiff of the masked
batch formulation rather than hand-accumulated per-row updates.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.losses import logistic_loss
from ..ops.interactions import fm_interaction, linear_term


@dataclasses.dataclass(frozen=True)
class FMConfig:
    n_features: int
    factor: int = 8
    init_std: float = 0.01
    l2: float = 0.0


def init(rng: jax.Array, cfg: FMConfig) -> dict:
    kw, kv = jax.random.split(rng)
    return {
        "w0": jnp.zeros(()),
        "w": jnp.zeros((cfg.n_features,)),
        "v": jax.random.normal(kv, (cfg.n_features, cfg.factor)) * cfg.init_std,
    }


def forward(params: dict, batch: dict, cfg: FMConfig | None = None, **_) -> jax.Array:
    xv = batch["vals"] * batch["mask"]
    ids = batch["ids"]
    return (
        params["w0"]
        + linear_term(params["w"], ids, xv)
        + fm_interaction(params["v"], ids, xv)
    )


def loss(params: dict, batch: dict, cfg: FMConfig, rng=None) -> jax.Array:
    logits = forward(params, batch, cfg)
    l = logistic_loss(logits, batch["labels"], batch.get("row_mask"))
    if cfg.l2:
        l = l + cfg.l2 * (jnp.sum(params["w"] ** 2) + jnp.sum(params["v"] ** 2))
    return l


def save_text_model(path: str, params: dict, threshold: float = 1e-7) -> int:
    """Text model dump in the reference's format (fm_algo_abst.h:109-135):
    one `fid w v0 v1 ...` line per feature with a non-negligible weight.
    Returns the number of features written."""
    import numpy as np

    w = np.asarray(params["w"])
    v = np.asarray(params["v"])
    keep = (np.abs(w) > threshold) | (np.abs(v).max(axis=1) > threshold)
    ids = np.nonzero(keep)[0]
    with open(path, "w") as f:
        f.write(f"{float(np.asarray(params['w0'])):.6f}\n")
        for i in ids:
            vec = " ".join(f"{x:.6f}" for x in v[i])
            f.write(f"{i} {w[i]:.6f} {vec}\n")
    return len(ids)


def load_text_model(path: str, cfg: FMConfig) -> dict:
    """Inverse of save_text_model."""
    import numpy as np

    w = np.zeros((cfg.n_features,), np.float32)
    v = np.zeros((cfg.n_features, cfg.factor), np.float32)
    with open(path) as f:
        w0 = float(f.readline())
        for line in f:
            parts = line.split()
            i = int(parts[0])
            w[i] = float(parts[1])
            v[i] = np.asarray(parts[2:], np.float32)
    return {"w0": jnp.asarray(w0), "w": jnp.asarray(w), "v": jnp.asarray(v)}

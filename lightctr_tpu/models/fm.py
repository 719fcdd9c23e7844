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


def save_text_model(path: str, params: dict) -> int:
    """Text model dump in the reference's EXACT saveModel format
    (fm_algo_abst.h:109-135): first line is space-separated `fid:W` pairs
    for every nonzero W, then one `fid:v0 v1 ... ` line per feature (all
    features). The reference FM has no global bias, so w0 is NOT written —
    callers holding a nonzero w0 should fold it elsewhere or use
    train/checkpoint.py for lossless round-trips. Returns the number of
    nonzero W entries written."""
    import numpy as np

    w = np.asarray(params["w"])
    v = np.asarray(params["v"])
    nz = np.nonzero(w != 0)[0]
    with open(path, "w") as f:
        f.write(" ".join(f"{i}:{w[i]:.9g}" for i in nz))
        f.write(" \n" if len(nz) else "\n")
        for i in range(v.shape[0]):
            f.write(f"{i}:" + " ".join(f"{x:.9g}" for x in v[i]) + " \n")
    return len(nz)


def load_text_model(path: str, cfg: FMConfig) -> dict:
    """Parse the reference saveModel format (fm_algo_abst.h:109-135) —
    interoperable with dumps produced by the reference binaries."""
    import numpy as np

    w = np.zeros((cfg.n_features,), np.float32)
    v = np.zeros((cfg.n_features, cfg.factor), np.float32)
    with open(path) as f:
        for pair in f.readline().split():
            fid, val = pair.split(":")
            w[int(fid)] = float(val)
        for line in f:
            line = line.strip()
            if not line:
                continue
            fid, vec = line.split(":", 1)
            v[int(fid)] = np.asarray(vec.split(), np.float32)[: cfg.factor]
    return {"w0": jnp.zeros(()), "w": jnp.asarray(w), "v": jnp.asarray(v)}

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

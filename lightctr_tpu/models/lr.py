"""Sparse logistic regression with FTRL — the online-learning baseline
(reference capability: FTRLUpdater gradientUpdater.h:235-278 applied to a
sparse linear model; the PS wide-part of distributed_algo_abst.h:176-216).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.losses import logistic_loss
from ..ops.interactions import linear_term


@dataclasses.dataclass(frozen=True)
class LRConfig:
    n_features: int
    l2: float = 0.0


def init(rng: jax.Array, cfg: LRConfig) -> dict:
    del rng
    return {"w0": jnp.zeros(()), "w": jnp.zeros((cfg.n_features,))}


def forward(params: dict, batch: dict, cfg: LRConfig | None = None, **_) -> jax.Array:
    xv = batch["vals"] * batch["mask"]
    return params["w0"] + linear_term(params["w"], batch["ids"], xv)


def loss(params: dict, batch: dict, cfg: LRConfig, rng=None) -> jax.Array:
    logits = forward(params, batch, cfg)
    l = logistic_loss(logits, batch["labels"], batch.get("row_mask"))
    if cfg.l2:
        l = l + cfg.l2 * jnp.sum(params["w"] ** 2)
    return l

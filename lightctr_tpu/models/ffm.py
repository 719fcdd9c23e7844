"""Field-aware Factorization Machine (reference: train_ffm_algo.{h,cpp}).

V is [n_features, n_fields, K] (per-field factors, fm_algo_abst.h:58-60 /
getV_field:149). The pairwise term uses the exact field-aggregation
rewrite in ops/interactions.ffm_interaction — O(B F^2 K) einsums on the
MXU instead of the reference's O(nnz^2) scalar pair loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.losses import logistic_loss
from ..ops.interactions import ffm_interaction, linear_term


@dataclasses.dataclass(frozen=True)
class FFMConfig:
    n_features: int
    n_fields: int
    factor: int = 4
    init_std: float = 0.01
    l2: float = 0.0


def init(rng: jax.Array, cfg: FFMConfig) -> dict:
    return {
        "w0": jnp.zeros(()),
        "w": jnp.zeros((cfg.n_features,)),
        "v": jax.random.normal(rng, (cfg.n_features, cfg.n_fields, cfg.factor))
        * cfg.init_std,
    }


def forward(params: dict, batch: dict, cfg: FFMConfig, **_) -> jax.Array:
    xv = batch["vals"] * batch["mask"]
    ids = batch["ids"]
    return (
        params["w0"]
        + linear_term(params["w"], ids, xv)
        + ffm_interaction(params["v"], ids, batch["fields"], xv, cfg.n_fields)
    )


def loss(params: dict, batch: dict, cfg: FFMConfig, rng=None) -> jax.Array:
    logits = forward(params, batch, cfg)
    l = logistic_loss(logits, batch["labels"], batch.get("row_mask"))
    if cfg.l2:
        l = l + cfg.l2 * (jnp.sum(params["w"] ** 2) + jnp.sum(params["v"] ** 2))
    return l

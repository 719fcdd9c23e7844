"""Neural FM — wide linear + bi-interaction pooling into an MLP tower
(reference: train_nfm_algo.{h,cpp}; pooling math at train_nfm_algo.cpp:78-101).

The reference runs this effectively single-threaded (train_nfm_algo.h:25);
here the full wide+deep forward/backward is one fused jitted step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.losses import logistic_loss
from ..nn.mlp import mlp_apply, mlp_init
from ..ops.interactions import bi_interaction_vector, linear_term


@dataclasses.dataclass(frozen=True)
class NFMConfig:
    n_features: int
    factor: int = 8
    hidden: tuple = (64,)
    activation: str = "relu"
    dropout: float = 0.0
    init_std: float = 0.01
    l2: float = 0.0


def init(rng: jax.Array, cfg: NFMConfig) -> dict:
    kv, km = jax.random.split(rng)
    sizes = [cfg.factor, *cfg.hidden, 1]
    return {
        "w0": jnp.zeros(()),
        "w": jnp.zeros((cfg.n_features,)),
        "v": jax.random.normal(kv, (cfg.n_features, cfg.factor)) * cfg.init_std,
        "mlp": mlp_init(km, sizes),
    }


def forward(
    params: dict,
    batch: dict,
    cfg: NFMConfig,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    xv = batch["vals"] * batch["mask"]
    ids = batch["ids"]
    wide = params["w0"] + linear_term(params["w"], ids, xv)
    pooled = bi_interaction_vector(params["v"], ids, xv)  # [B, K]
    deep = mlp_apply(
        params["mlp"],
        pooled,
        activation=cfg.activation,
        dropout_rate=cfg.dropout,
        dropout_rng=rng,
        train=train,
    )[:, 0]
    return wide + deep


def loss(params: dict, batch: dict, cfg: NFMConfig, rng=None) -> jax.Array:
    logits = forward(params, batch, cfg, train=True, rng=rng)
    l = logistic_loss(logits, batch["labels"], batch.get("row_mask"))
    if cfg.l2:
        l = l + cfg.l2 * (jnp.sum(params["w"] ** 2) + jnp.sum(params["v"] ** 2))
    return l

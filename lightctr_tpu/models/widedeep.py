"""Wide & Deep — the reference's distributed PS-mode model
(distributed_algo_abst.h:106-117, 176-280): sparse wide LR + per-field
embedding sum (dim 4) -> FC(F*K -> 50, tanh) -> FC(50 -> 1).

In the TPU build this is the flagship sharded-embedding model: the table
shards across the mesh's `model` axis (the DHT/ParamServer replacement),
the batch shards across `data`, and the gather + one-hot field-sum is a
single einsum that GSPMD turns into the all-to-all/all-gather exchange.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.losses import logistic_loss
from ..nn.mlp import mlp_apply, mlp_init
from ..ops.interactions import field_sum_embeddings, linear_term


@dataclasses.dataclass(frozen=True)
class WideDeepConfig:
    n_features: int
    n_fields: int
    embed_dim: int = 4
    hidden: tuple = (50,)
    activation: str = "tanh"
    dropout: float = 0.0
    init_std: float = 0.01
    l2: float = 0.0


def init(rng: jax.Array, cfg: WideDeepConfig) -> dict:
    ke, km = jax.random.split(rng)
    sizes = [cfg.n_fields * cfg.embed_dim, *cfg.hidden, 1]
    return {
        "w0": jnp.zeros(()),
        "w": jnp.zeros((cfg.n_features,)),
        "embed": jax.random.normal(ke, (cfg.n_features, cfg.embed_dim)) * cfg.init_std,
        "mlp": mlp_init(km, sizes),
    }


def forward(
    params: dict,
    batch: dict,
    cfg: WideDeepConfig,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    xv = batch["vals"] * batch["mask"]
    ids = batch["ids"]
    wide = params["w0"] + linear_term(params["w"], ids, xv)
    fieldsum = field_sum_embeddings(
        params["embed"], ids, batch["fields"], xv, cfg.n_fields
    )  # [B, F, K]
    deep_in = fieldsum.reshape(fieldsum.shape[0], -1)
    deep = mlp_apply(
        params["mlp"],
        deep_in,
        activation=cfg.activation,
        dropout_rate=cfg.dropout,
        dropout_rng=rng,
        train=train,
    )[:, 0]
    return wide + deep


def loss(params: dict, batch: dict, cfg: WideDeepConfig, rng=None) -> jax.Array:
    logits = forward(params, batch, cfg, train=True, rng=rng)
    l = logistic_loss(logits, batch["labels"], batch.get("row_mask"))
    if cfg.l2:
        l = l + cfg.l2 * (jnp.sum(params["w"] ** 2) + jnp.sum(params["embed"] ** 2))
    return l

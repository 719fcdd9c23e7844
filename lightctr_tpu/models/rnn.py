"""RNN classifier — LSTM over image rows + additive attention + FC softmax,
matching the reference's Train_RNN_Algo (train_rnn_algo.h:34-71: 28-step
LSTM over 28-pixel MNIST rows, attention pooling, softmax). The reference
forces this model single-threaded (dl_algo_abst.h:104-105); here the scan
is batched and jitted.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.attention import attention_apply, attention_init
from ..nn.losses import softmax_cross_entropy
from ..nn.lstm import lstm_apply, lstm_init
from ..nn.mlp import mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class RNNConfig:
    seq_len: int = 28
    input_dim: int = 28
    hidden_dim: int = 64
    attn_hidden: int = 32
    n_classes: int = 10


def init(rng: jax.Array, cfg: RNNConfig) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "lstm": lstm_init(k1, cfg.input_dim, cfg.hidden_dim),
        "attn": attention_init(k2, cfg.hidden_dim, cfg.attn_hidden),
        "mlp": mlp_init(k3, [cfg.hidden_dim, cfg.n_classes]),
    }


def forward(params: dict, batch: dict, cfg: RNNConfig, train: bool = False, rng=None):
    x = batch["x"].reshape(-1, cfg.seq_len, cfg.input_dim)
    outs, _ = lstm_apply(params["lstm"], x)
    context, _ = attention_apply(params["attn"], outs)
    return mlp_apply(params["mlp"], context)


def loss(params: dict, batch: dict, cfg: RNNConfig, rng=None):
    logits = forward(params, batch, cfg, train=True, rng=rng)
    onehot = jax.nn.one_hot(batch["y"], cfg.n_classes)
    return softmax_cross_entropy(logits, onehot, batch.get("row_mask"))


def accuracy(params: dict, batch: dict, cfg: RNNConfig):
    logits = forward(params, batch, cfg)
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == batch["y"]).astype(jnp.float32)
    w = batch.get("row_mask")
    if w is None:
        return jnp.mean(hit)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)

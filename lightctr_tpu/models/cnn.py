"""CNN classifier — LeNet-ish topology matching the reference's
Train_CNN_Algo network (train_cnn_algo.h:37-70): conv(5x5,6) -> maxpool2
-> conv(3x3,16, sparse 6->16 connection mask) -> conv(3x3,20) -> flatten
-> FC -> FC softmax. Input is the 28x28 dense MNIST-like data.

This is also the reference's Ring-AllReduce demo model; in the TPU build
the same model data-parallelises by sharding the batch (parallel/).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.conv import conv_apply, conv_init, max_pool
from ..nn.losses import softmax_cross_entropy
from ..nn.mlp import mlp_apply, mlp_init

# LeNet-style 6->16 sparse connectivity (reference cnn_dropout_mask,
# convLayer.h:18-25): each of 16 maps sees a subset of the 6 inputs.
_LENET_MASK_6_16 = np.array(
    [
        [1, 0, 0, 0, 1, 1], [1, 1, 0, 0, 0, 1], [1, 1, 1, 0, 0, 0],
        [0, 1, 1, 1, 0, 0], [0, 0, 1, 1, 1, 0], [0, 0, 0, 1, 1, 1],
        [1, 0, 0, 1, 1, 1], [1, 1, 0, 0, 1, 1], [1, 1, 1, 0, 0, 1],
        [1, 1, 1, 1, 0, 0], [0, 1, 1, 1, 1, 0], [0, 0, 1, 1, 1, 1],
        [1, 0, 1, 1, 0, 1], [1, 1, 0, 1, 1, 0], [0, 1, 1, 0, 1, 1],
        [1, 1, 1, 1, 1, 1],
    ],
    dtype=np.float32,
)


@dataclasses.dataclass(frozen=True)
class CNNConfig:
    image_size: int = 28
    n_classes: int = 10
    fc_hidden: int = 74
    use_connection_mask: bool = True


def init(rng: jax.Array, cfg: CNNConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    mask = _LENET_MASK_6_16 if cfg.use_connection_mask else None
    # spatial sizes: 28 -conv5-> 24 -pool2-> 12 -conv3-> 10 -conv3-> 8
    flat = 20 * 8 * 8
    return {
        "conv1": conv_init(k1, 1, 6, 5),
        "conv2": conv_init(k2, 6, 16, 3, connection_mask=mask),
        "conv3": conv_init(k3, 16, 20, 3),
        "mlp": mlp_init(k4, [flat, cfg.fc_hidden, cfg.n_classes]),
    }


def forward(params: dict, batch: dict, cfg: CNNConfig, train: bool = False, rng=None):
    x = batch["x"].reshape(-1, 1, cfg.image_size, cfg.image_size)
    x = jax.nn.relu(conv_apply(params["conv1"], x))
    x = max_pool(x, 2)
    x = jax.nn.relu(conv_apply(params["conv2"], x))
    x = jax.nn.relu(conv_apply(params["conv3"], x))
    x = x.reshape(x.shape[0], -1)
    return mlp_apply(params["mlp"], x, activation="relu")  # [B, n_classes] logits


def loss(params: dict, batch: dict, cfg: CNNConfig, rng=None):
    logits = forward(params, batch, cfg, train=True, rng=rng)
    onehot = jax.nn.one_hot(batch["y"], cfg.n_classes)
    return softmax_cross_entropy(logits, onehot, batch.get("row_mask"))


def accuracy(params: dict, batch: dict, cfg: CNNConfig):
    logits = forward(params, batch, cfg)
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == batch["y"]).astype(jnp.float32)
    w = batch.get("row_mask")
    if w is None:
        return jnp.mean(hit)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)

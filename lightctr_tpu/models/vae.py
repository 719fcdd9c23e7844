"""Variational autoencoder — FC encoder -> (mu, log sigma^2) ->
reparameterised sample -> FC decoder, MSE reconstruction + KL, matching
the reference's Train_VAE_Algo + Sample_Layer (train_vae_algo.h:42-100,
sampleLayer.h:16-134 — whose backward hand-adds the KL gradient; here the
KL term is just part of the differentiated loss).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.mlp import mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    input_dim: int = 784
    encoder_hidden: tuple = (100,)
    latent_dim: int = 10
    decoder_hidden: tuple = (100,)
    kl_weight: float = 1.0


def init(rng: jax.Array, cfg: VAEConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        # encoder outputs [mu | log sigma^2]
        "encoder": mlp_init(k1, [cfg.input_dim, *cfg.encoder_hidden, 2 * cfg.latent_dim]),
        "decoder": mlp_init(k2, [cfg.latent_dim, *cfg.decoder_hidden, cfg.input_dim]),
    }


def encode(params, x, cfg):
    h = mlp_apply(params["encoder"], x, activation="relu")
    mu, logvar = jnp.split(h, 2, axis=-1)
    return mu, logvar


def decode(params, z, cfg):
    return mlp_apply(params["decoder"], z, activation="relu", final_activation="sigmoid")


def forward(params: dict, batch: dict, cfg: VAEConfig, train: bool = False, rng=None):
    """Reconstruction (mean latent when not training)."""
    mu, logvar = encode(params, batch["x"], cfg)
    if train and rng is not None:
        eps = jax.random.normal(rng, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps
    else:
        z = mu
    return decode(params, z, cfg)


def loss(params: dict, batch: dict, cfg: VAEConfig, rng=None):
    x = batch["x"]
    mu, logvar = encode(params, x, cfg)
    eps = jax.random.normal(rng, mu.shape) if rng is not None else jnp.zeros_like(mu)
    z = mu + jnp.exp(0.5 * logvar) * eps
    recon = decode(params, z, cfg)
    w = batch.get("row_mask")
    per_recon = 0.5 * jnp.sum(jnp.square(recon - x), axis=-1)
    per_kl = -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar), axis=-1)
    per = per_recon + cfg.kl_weight * per_kl
    if w is None:
        return jnp.mean(per)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

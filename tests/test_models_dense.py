"""CNN / RNN / VAE on the reference's dense MNIST-like data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lightctr_tpu import optim
from lightctr_tpu.data import load_dense_csv, dense_batches
from lightctr_tpu.models import cnn, rnn, vae


@pytest.fixture(scope="module")
def mnist_small():
    x, y, k = load_dense_csv("/root/reference/data/train_dense.csv", max_rows=500)
    assert x.shape[1] == 784 and k == 10
    return x, y, k


def _fit_dense(model, cfg, x, y, tx, epochs, batch_size=100, seed=0):
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, cfg)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng, batch):
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(model.loss)(params, batch, cfg, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optim.apply_updates(params, updates), opt_state, rng, loss

    np_rng = np.random.default_rng(seed)
    losses = []
    for _ in range(epochs):
        for b in dense_batches(x, y, batch_size, rng=np_rng):
            b = {k2: jnp.asarray(v) for k2, v in b.items()}
            params, opt_state, rng, loss = step(params, opt_state, rng, b)
            losses.append(float(loss))
    return params, losses


def test_dense_loader(mnist_small):
    x, y, k = mnist_small
    assert 0.0 <= x.min() and x.max() <= 1.0
    assert set(np.unique(y)) <= set(range(10))


def test_cnn_learns(mnist_small):
    x, y, _ = mnist_small
    cfg = cnn.CNNConfig()
    params, losses = _fit_dense(cnn, cfg, x, y, optim.adam(1e-3), epochs=8)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    acc = float(cnn.accuracy(params, batch, cfg))
    assert acc > 0.8
    assert losses[-1] < losses[0] * 0.3


def test_rnn_learns(mnist_small):
    x, y, _ = mnist_small
    cfg = rnn.RNNConfig()
    params, losses = _fit_dense(rnn, cfg, x, y, optim.adam(2e-3), epochs=12)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    acc = float(rnn.accuracy(params, batch, cfg))
    assert acc > 0.7
    assert losses[-1] < losses[0] * 0.5


def test_vae_reconstructs(mnist_small):
    x, y, _ = mnist_small
    cfg = vae.VAEConfig(input_dim=784, encoder_hidden=(100,), latent_dim=10,
                        decoder_hidden=(100,), kl_weight=0.05)
    params, losses = _fit_dense(vae, cfg, x, y, optim.adam(2e-3), epochs=20)
    assert losses[-1] < losses[0] * 0.5
    recon = np.asarray(
        vae.forward(params, {"x": jnp.asarray(x[:50])}, cfg, train=False)
    )
    base = np.mean((x[:50] - x[:50].mean(axis=0)) ** 2)
    assert np.mean((recon - x[:50]) ** 2) < base  # better than mean image

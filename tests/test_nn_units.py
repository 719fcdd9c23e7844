"""Unit-level numerics for nn/ modules against independent references."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.nn.activations import (
    binary_sigmoid,
    identity,
    relu,
    sigmoid,
    softmax_t,
    softplus,
    tanh,
)
from lightctr_tpu.nn.attention import attention_apply, attention_init
from lightctr_tpu.nn.conv import conv_apply, conv_init, max_pool
from lightctr_tpu.nn.losses import logistic_loss, softmax_cross_entropy, square_loss
from lightctr_tpu.nn.lstm import lstm_apply, lstm_init
from lightctr_tpu.nn.mlp import mlp_apply, mlp_init


def test_activations_basic():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(identity(x)), [-2, 0, 3])
    np.testing.assert_allclose(np.asarray(relu(x)), [0, 0, 3])
    np.testing.assert_allclose(np.asarray(tanh(x)), np.tanh([-2, 0, 3]), rtol=1e-6)
    s = np.asarray(sigmoid(x))
    np.testing.assert_allclose(s, 1 / (1 + np.exp([2, 0, -3])), rtol=1e-6)
    # clamp at +-16 keeps extreme inputs finite and saturated
    np.testing.assert_allclose(np.asarray(sigmoid(jnp.asarray([1e6]))), [1.0], atol=1e-6)
    sp = np.asarray(softplus(x))
    np.testing.assert_allclose(sp, np.log1p(np.exp([-2, 0, 3])), rtol=1e-5)
    p = np.asarray(softmax_t(jnp.asarray([[1.0, 2.0, 3.0]]), temperature=2.0))
    e = np.exp(np.array([1, 2, 3]) / 2)
    np.testing.assert_allclose(p[0], e / e.sum(), rtol=1e-6)


def test_binary_sigmoid_straight_through():
    x = jnp.asarray([-1.0, 2.0])
    y = np.asarray(binary_sigmoid(x))
    np.testing.assert_allclose(y, [0.0, 1.0], atol=1e-6)
    # gradient flows via sigmoid surrogate (nonzero)
    g = np.asarray(jax.grad(lambda x: binary_sigmoid(x).sum())(x))
    assert np.all(g > 0)


def test_losses_reference_formulas():
    logits = jnp.asarray([0.5, -1.0])
    labels = jnp.asarray([1.0, 0.0])
    expect = np.mean(
        [np.log1p(np.exp(-0.5)), np.log1p(np.exp(-1.0))]
    )
    np.testing.assert_allclose(float(logistic_loss(logits, labels)), expect, rtol=1e-6)
    # gradient of stable BCE is sigmoid(z) - y
    g = np.asarray(jax.grad(lambda z: logistic_loss(z, labels) * 2)(logits))
    np.testing.assert_allclose(g, 1 / (1 + np.exp([-0.5, 1.0])) - [1, 0], rtol=1e-5)
    np.testing.assert_allclose(
        float(square_loss(jnp.asarray([2.0]), jnp.asarray([1.0]))), 0.5, rtol=1e-6
    )
    onehot = jnp.asarray([[0.0, 1.0]])
    ce = float(softmax_cross_entropy(jnp.asarray([[1.0, 3.0]]), onehot))
    np.testing.assert_allclose(ce, np.log(1 + np.exp(-2)), rtol=1e-5)


def test_lstm_shapes_and_memory():
    params = lstm_init(jax.random.PRNGKey(0), input_dim=4, hidden_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 4))
    outs, (h, c) = lstm_apply(params, x)
    assert outs.shape == (3, 10, 8)
    np.testing.assert_allclose(np.asarray(outs[:, -1]), np.asarray(h), rtol=1e-6)
    # zero input with zero state stays near zero at t=0 (biases: forget=1)
    outs0, _ = lstm_apply(params, jnp.zeros((1, 1, 4)))
    assert np.abs(np.asarray(outs0)).max() < 0.5


def test_attention_weights_sum_to_one_and_mask():
    params = attention_init(jax.random.PRNGKey(0), dim=6, hidden=4)
    seq = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    ctx, w = attention_apply(params, seq)
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, rtol=1e-5)
    mask = jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    _, wm = attention_apply(params, seq, mask)
    assert np.asarray(wm)[0, 2:].max() < 1e-6


def test_conv_matches_scipy_correlate():
    from scipy import signal

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 6, 6)).astype(np.float32)
    params = conv_init(jax.random.PRNGKey(0), 1, 1, 3)
    w = np.asarray(params["w"])[0, 0]
    got = np.asarray(conv_apply(params, jnp.asarray(x)))[0, 0]
    expect = signal.correlate2d(x[0, 0], w, mode="valid")
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_max_pool():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4))
    y = np.asarray(max_pool(x, 2))[0, 0]
    np.testing.assert_array_equal(y, [[5, 7], [13, 15]])


def test_mlp_dropout_train_vs_eval():
    params = mlp_init(jax.random.PRNGKey(0), [4, 16, 2])
    x = jnp.ones((8, 4))
    y_eval = mlp_apply(params, x, dropout_rate=0.5, train=False)
    y_eval2 = mlp_apply(params, x, dropout_rate=0.5, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_tr = mlp_apply(
        params, x, dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(1), train=True
    )
    assert not np.allclose(np.asarray(y_tr), np.asarray(y_eval))

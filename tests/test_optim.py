import jax.numpy as jnp
import numpy as np
import pytest

from lightctr_tpu import optim


def _run_steps(tx, grads_seq, w0):
    params = {"w": jnp.asarray(w0, jnp.float32)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        params = optim.apply_updates(params, updates)
    return np.asarray(params["w"])


def test_sgd_matches_scalar():
    w = _run_steps(optim.sgd(0.1), [[1.0], [2.0]], [0.0])
    assert w[0] == pytest.approx(-0.3)


def test_adagrad_matches_scalar_reference():
    # w -= lr*g/(sqrt(sum g^2)+eps): step1: 1/sqrt(1)=1; step2: 2/sqrt(5)
    w = _run_steps(optim.adagrad(0.1, eps=0.0), [[1.0], [2.0]], [0.0])
    assert w[0] == pytest.approx(-0.1 - 0.1 * 2 / np.sqrt(5), rel=1e-5)


def test_adam_bias_correction_first_step():
    # First Adam step with any gradient is ~ -lr * sign(g)
    w = _run_steps(optim.adam(0.01), [[0.5]], [0.0])
    assert w[0] == pytest.approx(-0.01, rel=1e-3)


def test_rmsprop_first_step():
    # nu = 0.1*g^2; step = lr*g/sqrt(nu) = lr*g/(g*sqrt(0.1))
    w = _run_steps(optim.rmsprop(0.01, decay=0.9, eps=0.0), [[3.0]], [0.0])
    assert w[0] == pytest.approx(-0.01 / np.sqrt(0.1), rel=1e-5)


def test_adadelta_runs_and_moves():
    w = _run_steps(optim.adadelta(), [[1.0]] * 10, [0.0])
    assert w[0] < 0.0


def test_ftrl_l1_zeroing_and_learning():
    # With huge lambda1 the weight stays exactly 0
    tx = optim.ftrl(alpha=0.1, lambda1=1e9)
    w = _run_steps(tx, [[1.0], [1.0]], [0.0])
    assert w[0] == 0.0
    # With lambda1=0 it moves against the gradient
    tx = optim.ftrl(alpha=0.1, lambda1=0.0, lambda2=0.0)
    w = _run_steps(tx, [[1.0], [1.0]], [0.0])
    assert w[0] < 0.0


def test_dcasgd_reduces_to_sgd_when_synchronous():
    # shadow == params each step -> compensation term is zero -> plain SGD
    tx = optim.dcasgd(0.1, variance=2.0)
    w = _run_steps(tx, [[1.0], [1.0]], [0.0])
    assert w[0] == pytest.approx(-0.2, rel=1e-6)


def test_clip_and_l2():
    tx = optim.chain(optim.clip_by_value(15.0), optim.sgd(1.0))
    w = _run_steps(tx, [[100.0]], [0.0])
    assert w[0] == -15.0
    tx = optim.chain(optim.add_decayed_l2(0.5), optim.sgd(1.0))
    params = {"w": jnp.asarray([2.0])}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([0.0])}, state, params)
    assert np.asarray(updates["w"])[0] == pytest.approx(-1.0)


def test_optimizers_converge_quadratic():
    # min 0.5*(w-3)^2 — every optimizer should approach w=3
    import jax

    def grad_fn(w):
        return w - 3.0

    for name, tx, steps in [
        ("sgd", optim.sgd(0.1), 200),
        ("momentum", optim.momentum(0.05), 200),
        ("adagrad", optim.adagrad(1.0), 300),
        ("rmsprop", optim.rmsprop(0.05), 300),
        ("adam", optim.adam(0.1), 300),
        ("adadelta", optim.adadelta(rho=0.9, learning_rate=10.0), 500),
        ("ftrl", optim.ftrl(alpha=1.0, lambda1=0.0, lambda2=0.0), 300),
    ]:
        params = {"w": jnp.zeros(())}
        state = tx.init(params)
        for _ in range(steps):
            g = {"w": grad_fn(params["w"])}
            updates, state = tx.update(g, state, params)
            params = optim.apply_updates(params, updates)
        assert abs(float(params["w"]) - 3.0) < 0.2, name

"""unique_fixed + sparse optimizers + sparse FM step tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.ops.unique import unique_fixed
from lightctr_tpu.optim.sparse import sparse_adagrad, sparse_adam, sparse_sgd
from lightctr_tpu.models import fm, fm_sparse
from lightctr_tpu.data import sparse_batches


def test_unique_fixed_basic():
    ids = jnp.asarray([[5, 3, 5, 7], [3, 3, 9, 0]], jnp.int32)
    valid = jnp.asarray([[1, 1, 1, 1], [1, 1, 1, 0]], jnp.float32)
    uids, index, n = unique_fixed(ids, valid, capacity=8)
    n = int(n)
    assert n == 4  # {3, 5, 7, 9}; the masked 0 is excluded
    u = np.asarray(uids)[:n]
    np.testing.assert_array_equal(np.sort(u), [3, 5, 7, 9])
    # remapping round-trips for valid slots
    back = np.asarray(uids)[np.asarray(index)]
    v = np.asarray(valid) > 0
    np.testing.assert_array_equal(back[v], np.asarray(ids)[v])


def test_unique_fixed_capacity_and_all_invalid():
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    uids, index, n = unique_fixed(ids, jnp.zeros((1, 4)), capacity=4)
    assert int(n) == 0
    uids, index, n = unique_fixed(ids, jnp.ones((1, 4)), capacity=2)
    assert int(n) == 4  # true count reported even beyond capacity


def test_sparse_adagrad_matches_dense_on_touched_rows():
    from lightctr_tpu import optim

    table = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)), jnp.float32)
    grads_full = jnp.zeros((10, 4)).at[jnp.asarray([2, 5])].set(1.5)

    # dense adagrad
    tx = optim.adagrad(0.1)
    opt = tx.init({"t": table})
    upd, _ = tx.update({"t": grads_full}, opt, {"t": table})
    dense_result = np.asarray(table + upd["t"])

    # sparse adagrad with uids=[2,5] (+ padding)
    init, update = sparse_adagrad(0.1)
    st = init(table)
    uids = jnp.asarray([2, 5, 0, 0], jnp.int32)
    grows = jnp.asarray([[1.5] * 4, [1.5] * 4, [9.0] * 4, [9.0] * 4], jnp.float32)
    new_table, st = update(table, st, uids, grows, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(new_table), dense_result, rtol=1e-5)
    # padding rows (garbage grads) must not touch row 0
    np.testing.assert_allclose(
        np.asarray(new_table)[0], np.asarray(table)[0], rtol=1e-6
    )


def test_sparse_adam_and_sgd_update_only_touched():
    table = jnp.ones((6, 2))
    for maker in (sparse_adam(0.1), sparse_sgd(0.1)):
        init, update = maker
        st = init(table)
        uids = jnp.asarray([1, 4, 0], jnp.int32)
        grows = jnp.asarray([[1.0, 1.0], [2.0, 2.0], [5.0, 5.0]], jnp.float32)
        t2, st = update(table, st, uids, grows, jnp.int32(2))
        t2 = np.asarray(t2)
        assert not np.allclose(t2[1], 1.0)
        assert not np.allclose(t2[4], 1.0)
        np.testing.assert_allclose(t2[[0, 2, 3, 5]], 1.0)


def test_sparse_fm_matches_dense_fm_trajectory(sparse_small):
    """Sparse-table FM must track the dense FM loss trajectory closely
    (identical math, sparse state application)."""
    cfg_d = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    from lightctr_tpu import optim
    from lightctr_tpu.train.loop import TrainState, make_train_step

    batches = list(sparse_batches(sparse_small, batch_size=128))[:6]

    rng = jax.random.PRNGKey(0)
    rng, ir = jax.random.split(rng)
    params = fm.init(ir, cfg_d)
    v0 = np.array(params["v"])  # copy before the donated dense steps delete it
    tx = optim.adagrad(0.1)
    st_d = TrainState(params, tx.init(params), rng)
    step_d = make_train_step(fm, cfg_d, tx)
    dense_losses = []
    for b in batches:
        st_d, l = step_d(st_d, b)
        dense_losses.append(float(l))

    cfg_s = fm_sparse.SparseFMConfig(
        n_features=sparse_small.n_features, factor=4, capacity=2048,
        optimizer="adagrad", learning_rate=0.1,
    )
    st_s = fm_sparse.init(ir, cfg_s)
    # align v init with dense params
    st_s = st_s._replace(v=jnp.asarray(v0))
    step_s = fm_sparse.make_train_step(cfg_s)
    sparse_losses = []
    for b in batches:
        st_s, l = step_s(st_s, b)
        sparse_losses.append(float(l))

    np.testing.assert_allclose(dense_losses, sparse_losses, rtol=2e-3)


def test_sparse_fm_learns(sparse_small):
    cfg = fm_sparse.SparseFMConfig(
        n_features=sparse_small.n_features, factor=8, capacity=2048,
        optimizer="adagrad", learning_rate=0.2,
    )
    state = fm_sparse.init(jax.random.PRNGKey(0), cfg)
    step = fm_sparse.make_train_step(cfg)
    for _ in range(8):
        for b in sparse_batches(sparse_small, batch_size=128):
            state, loss = step(state, b)
    from lightctr_tpu.utils.metrics import auc
    from lightctr_tpu.nn.activations import sigmoid

    scores, labels = [], []
    for b in sparse_batches(sparse_small, batch_size=128):
        s = np.asarray(sigmoid(fm_sparse.forward(state, b)))
        m = np.asarray(b["row_mask"]) > 0
        scores.append(s[m]); labels.append(np.asarray(b["labels"])[m])
    assert float(auc(np.concatenate(scores), np.concatenate(labels))) > 0.9

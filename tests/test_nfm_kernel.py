"""Kernel NFM vs dense-jnp NFM: same init -> matching loss trajectory."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu import optim
from lightctr_tpu.models import nfm, nfm_kernel, fm_kernel
from lightctr_tpu.train.loop import TrainState, make_train_step


def _toy_batch(seed=0, B=8, L=128, V=300):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :16] = rng.integers(0, 8, (B, 16))
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, labels


def test_kernel_nfm_matches_dense_nfm():
    ids, vals, mask, labels = _toy_batch()
    V, KF = 300, 4

    cfg_d = nfm.NFMConfig(n_features=V, factor=KF, hidden=(8,), dropout=0.0)
    params = nfm.init(jax.random.PRNGKey(0), cfg_d)
    v0 = np.array(params["v"])
    mlp0 = jax.tree_util.tree_map(np.array, params["mlp"])

    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.zeros_like(jnp.asarray(ids, jnp.int32)),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((ids.shape[0],), jnp.float32),
    }
    # dense path: adagrad on tables AND mlp (to mirror, we use adam on mlp
    # in the kernel path — so restrict comparison to the first step where
    # optimizer choice doesn't matter for the loss value)
    tx = optim.adagrad(0.05)
    st_d = TrainState(params, tx.init(params), jax.random.PRNGKey(1))
    step_d = make_train_step(nfm, cfg_d, tx)
    st_d, l0_dense = step_d(st_d, batch)
    _, l1_dense = step_d(st_d, batch)

    cfg_k = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=KF, hidden=(8,), learning_rate=0.05,
        interpret=True, exact=True,
    )
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    st_k = nfm_kernel.init(jax.random.PRNGKey(0), cfg_k, plan)
    rows = np.array(st_k.rows)
    uids = plan.uids[: plan.n_unique]
    rows[: plan.n_unique, 1 : 1 + KF] = v0[uids]
    rows[plan.n_rows_pad - 1] = 0.0
    st_k = st_k._replace(rows=jnp.asarray(rows),
                         mlp=jax.tree_util.tree_map(jnp.asarray, mlp0))
    step_k = nfm_kernel.make_train_step(cfg_k, plan)
    st_k, l0_kernel = step_k(st_k)
    _, l1_kernel = step_k(st_k)

    # identical params -> identical first loss
    np.testing.assert_allclose(float(l0_dense), float(l0_kernel), rtol=1e-4)
    # after one step the table updates must agree (same adagrad math);
    # mlp optimizers differ (adagrad vs adam), so allow slack on step-2 loss
    np.testing.assert_allclose(float(l1_dense), float(l1_kernel), rtol=0.3)


def test_kernel_nfm_learns():
    rng = np.random.default_rng(1)
    B, L, V = 64, 16, 100
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.float32)
    vals = np.ones((B, L), np.float32)
    labels = ((ids < 20).sum(axis=1) > 3).astype(np.float32)

    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=8, hidden=(16,), learning_rate=0.2,
        interpret=True, exact=True,
    )
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    st = nfm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = nfm_kernel.make_train_step(cfg, plan)
    losses = []
    for _ in range(15):
        st, loss = step(st)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]

    params = nfm_kernel.export_tables(st, plan, cfg)
    cfg_d = nfm.NFMConfig(n_features=V, factor=8, hidden=(16,))
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.zeros((B, L), jnp.int32),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((B,), jnp.float32),
    }
    logits = nfm.forward(params, batch, cfg_d)
    acc = float(jnp.mean(((logits > 0) == (jnp.asarray(labels) > 0.5)).astype(jnp.float32)))
    assert acc > 0.8

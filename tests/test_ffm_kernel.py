"""Fused-kernel FFM vs the dense-jnp FFM path: kernels must reproduce the
gather/scatter semantics exactly and the trainer must match the dense
trajectory (interpret mode on CPU; same code compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu import optim
from lightctr_tpu.models import ffm, ffm_kernel
from lightctr_tpu.ops.ffm_pallas import (
    dense_rank_gather,
    dense_rank_scatter_add,
    rank_lookup,
)
from lightctr_tpu.train.loop import TrainState, make_train_step


def test_dense_rank_gather_scatter_roundtrip():
    rng = np.random.default_rng(0)
    R, Dw, n = 1024, 128, 512
    table = rng.normal(size=(R, Dw)).astype(np.float32)
    ranks = rng.integers(0, R, (n,)).astype(np.int32)   # arbitrary order
    out = np.asarray(dense_rank_gather(
        jnp.asarray(table), jnp.asarray(ranks), interpret=True, exact=True))
    np.testing.assert_allclose(out, table[ranks], rtol=1e-6)

    g = rng.normal(size=(n, Dw)).astype(np.float32)
    scat = np.asarray(dense_rank_scatter_add(
        jnp.asarray(g), jnp.asarray(ranks), n_rows=R,
        interpret=True, exact=True))
    want = np.zeros((R, Dw), np.float32)
    np.add.at(want, ranks, g)
    np.testing.assert_allclose(scat, want, rtol=1e-5, atol=1e-5)


def test_rank_lookup_vjp_is_scatter():
    rng = np.random.default_rng(1)
    R, Dw, n = 512, 128, 512
    table = jnp.asarray(rng.normal(size=(R, Dw)).astype(np.float32))
    ranks = jnp.asarray(rng.integers(0, R, (n,)).astype(np.int32))

    def f(t):
        out = rank_lookup(t, ranks, True, True)
        return jnp.sum(out * out)

    g = np.asarray(jax.grad(f)(table))
    # reference grad: 2 * scatter_add of table[ranks]
    want = np.zeros((R, Dw), np.float32)
    np.add.at(want, np.asarray(ranks), 2 * np.asarray(table)[np.asarray(ranks)])
    np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)


def _toy_batch(seed=0, B=8, L=32, V=300, F=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :8] = rng.integers(0, 8, (B, 8))             # hot head, CTR-like
    fields = rng.integers(0, F, (B, L)).astype(np.int32)
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, fields, labels


def _mapped_table_init(params, plan, cfg):
    """Map a dense FFM param dict into the kernel's rank-space table."""
    F, Kf = cfg.n_fields, cfg.factor
    table = np.zeros((plan.n_rows_pad, cfg.row_width), np.float32)
    uids = plan.uids[: plan.n_unique]
    table[: plan.n_unique, 0] = np.asarray(params["w"])[uids]
    table[: plan.n_unique, 1 : 1 + F * Kf] = (
        np.asarray(params["v"])[uids].reshape(-1, F * Kf)
    )
    return jnp.asarray(table)


def test_kernel_ffm_logits_match_dense():
    ids, vals, mask, fields, labels = _toy_batch()
    V, F, Kf = 300, 6, 4
    cfg_d = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(0), cfg_d)
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.asarray(fields),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((ids.shape[0],), jnp.float32),
    }
    want = np.asarray(ffm.forward(params, batch, cfg_d))

    cfg_k = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, interpret=True, exact=True
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    st = ffm_kernel.init(jax.random.PRNGKey(0), cfg_k, plan)
    st = st._replace(table=_mapped_table_init(params, plan, cfg_k))
    got = np.asarray(ffm_kernel.predict_logits(st, plan, cfg_k))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kernel_ffm_matches_dense_trajectory():
    ids, vals, mask, fields, labels = _toy_batch(seed=2)
    V, F, Kf = 300, 6, 4
    cfg_d = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(0), cfg_d)
    # numpy copies: the dense step donates its params buffers
    params0 = {k: np.array(v) for k, v in params.items()}
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.asarray(fields),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((ids.shape[0],), jnp.float32),
    }
    tx = optim.adagrad(0.05)
    st_d = TrainState(params, tx.init(params), jax.random.PRNGKey(1))
    step_d = make_train_step(ffm, cfg_d, tx)
    dense_losses = []
    for _ in range(5):
        st_d, l = step_d(st_d, batch)
        dense_losses.append(float(l))

    cfg_k = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.05,
        interpret=True, exact=True,
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    st_k = ffm_kernel.init(jax.random.PRNGKey(0), cfg_k, plan)
    st_k = st_k._replace(table=_mapped_table_init(params0, plan, cfg_k))
    step_k = ffm_kernel.make_train_step(cfg_k, plan)
    kernel_losses = []
    for _ in range(5):
        st_k, l = step_k(st_k)
        kernel_losses.append(float(l))

    # exact mode: fp32-faithful — trajectories must agree tightly
    np.testing.assert_allclose(dense_losses, kernel_losses, rtol=2e-4)
    assert kernel_losses[-1] < kernel_losses[0]


def test_kernel_ffm_export_roundtrip():
    ids, vals, mask, fields, labels = _toy_batch(seed=3)
    V, F, Kf = 300, 6, 4
    cfg_k = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.2,
        interpret=True, exact=True,
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    st = ffm_kernel.init(jax.random.PRNGKey(0), cfg_k, plan)
    step = ffm_kernel.make_train_step(cfg_k, plan)
    for _ in range(10):
        st, loss = step(st)
    params = ffm_kernel.export_params(st, plan, cfg_k)
    cfg_d = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.asarray(fields),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((ids.shape[0],), jnp.float32),
    }
    logits = ffm.forward(params, batch, cfg_d)
    # exported params reproduce the kernel's own logits
    want = np.asarray(ffm_kernel.predict_logits(st, plan, cfg_k))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4, atol=1e-5)
    probs = np.asarray(jax.nn.sigmoid(logits))
    assert ((probs > 0.5).astype(np.float32) == labels).mean() >= 0.75

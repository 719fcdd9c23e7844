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


def test_mlp_optimizer_adagrad_matches_reference_semantics():
    """mlp_optimizer="adagrad" (the reference tower's per-layer Adagrad,
    fullyconnLayer.h:234 — the matched-optimizer option for the NFM
    head-to-head) must apply optim.adagrad to the tower: one step's MLP
    update == -lr * g / (sqrt(g^2) + eps), while the embedding rows stay
    identical to the adam-tower run (the row optimizer is unchanged)."""
    ids, vals, mask, labels = _toy_batch(seed=3)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)

    def one_step(mlp_optimizer):
        cfg = nfm_kernel.KernelNFMConfig(
            n_features=300, factor=4, hidden=(8,), learning_rate=0.1,
            mlp_learning_rate=0.05, mlp_optimizer=mlp_optimizer,
            interpret=True, exact=True, xmat=True)
        st = nfm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        st2, loss = nfm_kernel.make_train_step(cfg, plan)(st)
        return st, st2, float(loss)

    st_a0, st_a1, loss_a = one_step("adam")
    st_g0, st_g1, loss_g = one_step("adagrad")

    # same init, same forward -> same first loss; same row update
    assert loss_a == loss_g
    np.testing.assert_array_equal(np.asarray(st_a1.rows),
                                  np.asarray(st_g1.rows))

    # adagrad tower semantics: delta == -lr*g/(sqrt(g*g)+eps) with the
    # gradient recovered from the adagrad state's accumulator
    accum = st_g1.mlp_opt.accum
    flat_new, _ = jax.tree_util.tree_flatten(st_g1.mlp)
    flat_old, _ = jax.tree_util.tree_flatten(st_g0.mlp)
    flat_acc, _ = jax.tree_util.tree_flatten(accum)
    checked = 0
    for new, old, acc in zip(flat_new, flat_old, flat_acc):
        g = np.sqrt(np.asarray(acc))              # first step: acc = g^2
        # delta = -lr*g/(sqrt(g^2)+eps): its sign IS sign(new-old)
        expect = np.asarray(old) + 0.05 * np.sign(
            np.asarray(new) - np.asarray(old)) * g / (g + 1e-7)
        np.testing.assert_allclose(np.asarray(new), expect,
                                   rtol=1e-5, atol=1e-7)
        checked += 1
    assert checked >= 4

    # and the two towers genuinely diverge (adam != adagrad)
    assert not np.allclose(np.asarray(flat_new[0]),
                           np.asarray(jax.tree_util.tree_flatten(st_a1.mlp)[0][0]))


def test_mlp_optimizer_unknown_raises():
    import pytest

    ids, vals, mask, labels = _toy_batch(seed=4)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=300, factor=4, hidden=(8,), mlp_optimizer="sgdx",
        interpret=True, exact=True)
    with pytest.raises(ValueError, match="mlp_optimizer"):
        nfm_kernel.init(jax.random.PRNGKey(0), cfg, plan)


def test_nfm_packed_and_partitioned_match_unpacked():
    """The packed [V, 32] NFM master and the range-partitioned master
    reproduce the unpacked streaming trajectory exactly (shared
    _packed_rank_core_nfm; same contract as the FM production path,
    tests/test_fm_partitioned.py)."""
    V, capacity, b_pad = 900, 2048, 128
    batches, uid_sets = [], []
    for seed in range(3):
        ids, vals, mask, labels = _toy_batch(seed=seed, B=8, L=64, V=V)
        b = fm_kernel.plan_batch_on_device(
            jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(mask),
            jnp.asarray(labels), jnp.ones((ids.shape[0],), jnp.float32),
            capacity=capacity, b_pad=b_pad)
        batches.append(b)
        uid_sets.append((np.asarray(b["uids"]), int(b["n_unique"])))

    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=4, hidden=(8,), learning_rate=0.1,
        interpret=True, exact=True)

    state_u = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_u = nfm_kernel.make_streaming_train_step(cfg, capacity, b_pad)
    traj_u = []
    for b in batches:
        state_u, loss = step_u(state_u, b)
        traj_u.append(float(loss))

    state_p = nfm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    step_p = nfm_kernel.make_streaming_train_step_packed(cfg, capacity,
                                                         b_pad)
    traj_p = []
    for b in batches:
        state_p, loss = step_p(state_p, b)
        traj_p.append(float(loss))
    np.testing.assert_allclose(traj_p, traj_u, rtol=1e-6)

    bounds = (64, 300, V)
    caps = tuple(
        max(fm_kernel.partition_caps_for(u, n, bounds, multiple=64)[p]
            for u, n in uid_sets)
        for p in range(len(bounds)))
    state_q = nfm_kernel.partition_streaming_state(
        nfm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    step_q = nfm_kernel.make_streaming_train_step_partitioned(
        cfg, capacity, b_pad, bounds, caps)
    traj_q = []
    for b in batches:
        (state_q, loss), ovf = step_q(state_q, b)
        assert not bool(ovf)
        traj_q.append(float(loss))
    np.testing.assert_allclose(traj_q, traj_u, rtol=1e-6)

    # master tables agree row-for-row after de-partitioning
    merged = nfm_kernel.departition_streaming_state(state_q)
    np.testing.assert_allclose(np.asarray(merged.packed),
                               np.asarray(state_p.packed), rtol=1e-6)

    # overflow flag fires loudly when a partition cap is too small
    tiny_caps = tuple(64 for _ in bounds)
    step_t = nfm_kernel.make_streaming_train_step_partitioned(
        cfg, capacity, b_pad, bounds, tiny_caps)
    state_t = nfm_kernel.partition_streaming_state(
        nfm_kernel.streaming_init_packed(jax.random.PRNGKey(1), cfg),
        bounds)
    (_, _), ovf = step_t(state_t, batches[0])
    assert bool(ovf)


def test_nfm_fused_partitioned_matches_fused():
    """The one-dispatch NFM partitioned step (device planner traced in)
    reproduces the fused packed-master trajectory."""
    V, capacity, b_pad = 4096, 2048, 128
    bounds = (256, 1024, V)
    caps = (256, 768, 2048)
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=4, hidden=(8,), learning_rate=0.1,
        interpret=True, exact=True)
    step_f = nfm_kernel.make_streaming_train_step_fused(cfg, capacity,
                                                        b_pad)
    step_q = nfm_kernel.make_streaming_train_step_fused_partitioned(
        cfg, capacity, b_pad, bounds, caps)
    st_f = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    st_q = nfm_kernel.partition_streaming_state(
        nfm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    for i in range(3):
        ids, vals, mask, labels = _toy_batch(seed=30 + i, B=8, L=64, V=V)
        args = (jnp.asarray(ids, jnp.int32), jnp.asarray(vals),
                jnp.asarray(mask), jnp.asarray(labels),
                jnp.ones((8,), jnp.float32))
        st_f, lf = step_f(st_f, *args)
        (st_q, lq), ov = step_q(st_q, *args)
        assert not bool(ov)
        np.testing.assert_allclose(float(lq), float(lf), rtol=1e-6)
    merged = nfm_kernel.unpack_streaming_state(
        nfm_kernel.departition_streaming_state(st_q))
    np.testing.assert_allclose(np.asarray(merged.table),
                               np.asarray(st_f.table),
                               rtol=1e-5, atol=5e-6)


def test_engine_nfm_partitioned_matches_default(monkeypatch):
    """train_nfm_kernel(partitioned=True) reproduces the default
    streaming engine's loss trajectory (same shuffling; epoch-scan
    forced off so both stream per batch)."""
    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.train import kernel_engine

    monkeypatch.setattr(kernel_engine, "EPOCH_SCAN_MAX_POSITIONS", 0)

    rng = np.random.default_rng(1)
    n, L, V = 256, 32, 70_000
    ids = np.where(
        rng.random((n, L)) < 0.5,
        rng.integers(0, 64, (n, L)),
        rng.integers(0, V, (n, L)),
    ).astype(np.int32)
    mask = (rng.random((n, L)) > 0.1).astype(np.float32)
    ds = SparseDataset(
        ids=ids, vals=np.ones((n, L), np.float32),
        fields=np.zeros((n, L), np.int32), mask=mask,
        labels=rng.integers(0, 2, (n,)).astype(np.float32),
        nnz=mask.sum(1).astype(np.int32), n_features=V, n_fields=1)

    kw = dict(factor=4, hidden=(8,), learning_rate=0.1, l2=1e-4,
              epochs=2, batch_size=64, seed=0, exact=True, log=None)
    params_d, losses_d = kernel_engine.train_nfm_kernel(ds, **kw)
    params_q, losses_q = kernel_engine.train_nfm_kernel(
        ds, partitioned=True, **kw)
    np.testing.assert_allclose(losses_q, losses_d, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params_q["v"]),
                               np.asarray(params_d["v"]),
                               rtol=1e-5, atol=5e-6)


def test_nfm_fused_partitioned_binary_matches_general():
    """The ids+labels-only binary NFM step reproduces the general fused
    partitioned trajectory on all-ones batches."""
    V, capacity, b_pad = 4096, 2048, 128
    bounds = (256, 1024, V)
    caps = (256, 768, 2048)
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=4, hidden=(8,), learning_rate=0.1, l2=1e-4,
        interpret=True, exact=True)
    step_g = nfm_kernel.make_streaming_train_step_fused_partitioned(
        cfg, capacity, b_pad, bounds, caps)
    step_b = nfm_kernel.make_streaming_train_step_fused_partitioned_binary(
        cfg, capacity, b_pad, bounds, caps)
    st_g = nfm_kernel.partition_streaming_state(
        nfm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    st_b = nfm_kernel.partition_streaming_state(
        nfm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    rng = np.random.default_rng(9)
    for i in range(3):
        ids = rng.integers(0, V, (8, 64)).astype(np.int32)
        labels = rng.integers(0, 2, (8,)).astype(np.float32)
        ones = np.ones(ids.shape, np.float32)
        (st_g, lg), ovg = step_g(
            st_g, jnp.asarray(ids), jnp.asarray(ones), jnp.asarray(ones),
            jnp.asarray(labels), jnp.ones((8,), jnp.float32))
        (st_b, lb), ovb = step_b(st_b, jnp.asarray(ids),
                                 jnp.asarray(labels))
        assert not bool(ovg) and not bool(ovb)
        np.testing.assert_allclose(float(lb), float(lg), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(nfm_kernel.departition_streaming_state(st_b).packed),
        np.asarray(nfm_kernel.departition_streaming_state(st_g).packed),
        rtol=1e-6)


def test_engine_nfm_binary_gate_fires(monkeypatch):
    """train_nfm_kernel(partitioned=True) auto-selects the binary wire
    on an all-ones fixed-L dataset with full batches."""
    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.train import kernel_engine

    monkeypatch.setattr(kernel_engine, "EPOCH_SCAN_MAX_POSITIONS", 0)
    rng = np.random.default_rng(7)
    n, L, V = 128, 32, 70_000
    ids = rng.integers(0, V, (n, L)).astype(np.int32)
    ds = SparseDataset(
        ids=ids, vals=np.ones((n, L), np.float32),
        fields=np.zeros((n, L), np.int32),
        mask=np.ones((n, L), np.float32),
        labels=rng.integers(0, 2, (n,)).astype(np.float32),
        nnz=np.full((n,), L, np.int32), n_features=V, n_fields=1)

    calls = []
    orig = kernel_engine.nfm_kernel.make_streaming_train_step_fused_partitioned_binary

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(
        kernel_engine.nfm_kernel,
        "make_streaming_train_step_fused_partitioned_binary", spy)
    _, losses = kernel_engine.train_nfm_kernel(
        ds, factor=4, hidden=(8,), learning_rate=0.1, epochs=2,
        batch_size=64, seed=0, exact=True, log=None, partitioned=True)
    assert calls, "binary gate did not fire"
    assert losses[-1] < losses[0]

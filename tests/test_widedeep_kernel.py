"""Streaming W&D production engine: flat-agg math vs the dense model,
packed vs partitioned trajectories, fused one-dispatch equality."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import ffm_kernel, widedeep, widedeep_kernel


def _toy(seed=0, B=16, L=24, V=900, F=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    return {
        "ids": ids,
        "vals": rng.random((B, L)).astype(np.float32),
        "fields": (ids % F).astype(np.int64),
        "mask": (rng.random((B, L)) > 0.15).astype(np.float32),
        "labels": rng.integers(0, 2, (B,)).astype(np.float32),
        "row_mask": np.ones((B,), np.float32),
    }


def _transplant(params, cfg):
    table = jnp.zeros((cfg.n_features, 16))
    table = table.at[:, 0].set(params["w"])
    table = table.at[:, 1 : 1 + cfg.embed_dim].set(params["embed"])
    tx = widedeep_kernel._mlp_tx(cfg)
    return widedeep_kernel.StreamingWDStatePacked(
        w0=jnp.asarray(params["w0"]),
        w0_accum=jnp.zeros(()),
        packed=jnp.concatenate(
            [table, jnp.zeros((cfg.n_features, 16))], axis=1),
        mlp=params["mlp"],
        mlp_opt=tx.init(params["mlp"]),
    )


def _plan(batch, capacity):
    return ffm_kernel.plan_batch_on_device(
        jnp.asarray(batch["ids"].astype(np.int32)),
        jnp.asarray(batch["vals"]), jnp.asarray(batch["mask"]),
        jnp.asarray(batch["fields"].astype(np.int32)),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["row_mask"]),
        capacity=capacity)


def test_wd_step_loss_matches_dense_forward():
    """One packed step at lr=0 reports exactly the dense model's
    logistic loss on transplanted params — pins the flat-agg forward
    (S = C @ [w|v]) to models/widedeep.forward."""
    V, F, B = 900, 6, 16
    batch = _toy(V=V, F=F, B=B)
    wcfg = widedeep.WideDeepConfig(n_features=V, n_fields=F, embed_dim=4,
                                   hidden=(8,))
    params = widedeep.init(jax.random.PRNGKey(0), wcfg)
    params["w"] = jnp.asarray(
        np.random.default_rng(1).normal(size=(V,)).astype(np.float32) * .1)

    z = widedeep.forward(params, {k: jnp.asarray(v)
                                  for k, v in batch.items()}, wcfg)
    y = batch["labels"]
    per = (np.maximum(np.asarray(z), 0) - np.asarray(z) * y
           + np.log1p(np.exp(-np.abs(np.asarray(z)))))
    loss_dense = float(per.mean())

    cfg = widedeep_kernel.KernelWDConfig(
        n_features=V, n_fields=F, embed_dim=4, hidden=(8,),
        interpret=True, exact=True)
    state = _transplant(params, cfg)
    capacity = 512
    step = widedeep_kernel.make_streaming_train_step_packed(cfg, capacity)
    _, loss = step(state, _plan(batch, capacity),
                   jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(float(loss), loss_dense, rtol=1e-5)


def test_wd_packed_and_partitioned_match():
    """Partitioned trajectories == packed (shared _rank_core_wd), the
    overflow flag fires on undersized caps, and export round-trips."""
    V, F, capacity = 2048, 6, 512
    bounds = (128, 512, V)
    caps = (128, 256, 512)
    cfg = widedeep_kernel.KernelWDConfig(
        n_features=V, n_fields=F, embed_dim=4, hidden=(8,),
        learning_rate=0.1, l2=1e-4, interpret=True, exact=True)
    batches = [_toy(seed=s, V=V, F=F) for s in range(3)]

    st_p = widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(0),
                                                 cfg)
    step_p = widedeep_kernel.make_streaming_train_step_packed(cfg,
                                                              capacity)
    traj_p = []
    for b in batches:
        st_p, loss = step_p(st_p, _plan(b, capacity))
        traj_p.append(float(loss))
    assert traj_p[-1] < traj_p[0]       # it learns

    st_q = widedeep_kernel.partition_streaming_state(
        widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    step_q = widedeep_kernel.make_streaming_train_step_partitioned(
        cfg, capacity, bounds, caps)
    traj_q = []
    for b in batches:
        (st_q, loss), ovf = step_q(st_q, _plan(b, capacity))
        assert not bool(ovf)
        traj_q.append(float(loss))
    np.testing.assert_allclose(traj_q, traj_p, rtol=1e-6)
    merged = widedeep_kernel.departition_streaming_state(st_q)
    # cross-program reduction-order ulps through Adagrad's 1/sqrt (the
    # partitioned pull rebuilds rank rows via dynamic slices)
    np.testing.assert_allclose(np.asarray(merged.packed),
                               np.asarray(st_p.packed),
                               rtol=1e-5, atol=1e-7)

    params = widedeep_kernel.export_streaming_params(merged, cfg)
    assert params["embed"].shape == (V, 4)

    tiny = widedeep_kernel.make_streaming_train_step_partitioned(
        cfg, capacity, bounds, (64, 64, 64))
    st_t = widedeep_kernel.partition_streaming_state(
        widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(1), cfg),
        bounds)
    (_, _), ovf = tiny(st_t, _plan(batches[0], capacity))
    assert bool(ovf)


def test_wd_fused_matches_separate():
    V, F, capacity = 2048, 6, 512
    cfg = widedeep_kernel.KernelWDConfig(
        n_features=V, n_fields=F, embed_dim=4, hidden=(8,),
        learning_rate=0.1, interpret=True, exact=True)
    st_s = widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(0),
                                                 cfg)
    st_f = widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(0),
                                                 cfg)
    step_s = widedeep_kernel.make_streaming_train_step_packed(cfg,
                                                              capacity)
    step_f = widedeep_kernel.make_streaming_train_step_fused(cfg,
                                                             capacity)
    for s in range(3):
        b = _toy(seed=10 + s, V=V, F=F)
        st_s, ls = step_s(st_s, _plan(b, capacity))
        st_f, lf = step_f(
            st_f, jnp.asarray(b["ids"].astype(np.int32)),
            jnp.asarray(b["vals"]), jnp.asarray(b["mask"]),
            jnp.asarray(b["fields"].astype(np.int32)),
            jnp.asarray(b["labels"]), jnp.asarray(b["row_mask"]))
        np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6)


def test_engine_widedeep_kernel_partitioned_matches_default(monkeypatch):
    """train_widedeep_kernel streams, learns, and partitioned=True
    reproduces the default trajectory (same shuffling, per-batch path)."""
    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.train import kernel_engine

    monkeypatch.setattr(kernel_engine, "EPOCH_SCAN_MAX_POSITIONS", 0)

    rng = np.random.default_rng(4)
    n, L, V, F = 256, 32, 70_000, 5
    ids = np.where(
        rng.random((n, L)) < 0.5,
        rng.integers(0, 64, (n, L)),
        rng.integers(0, V, (n, L)),
    ).astype(np.int32)
    mask = (rng.random((n, L)) > 0.1).astype(np.float32)
    ds = SparseDataset(
        ids=ids, vals=np.ones((n, L), np.float32),
        fields=(ids % F).astype(np.int32), mask=mask,
        labels=rng.integers(0, 2, (n,)).astype(np.float32),
        nnz=mask.sum(1).astype(np.int32), n_features=V, n_fields=F)

    kw = dict(embed_dim=4, hidden=(8,), learning_rate=0.1, l2=1e-4,
              epochs=2, batch_size=64, seed=0, exact=True, log=None)
    params_d, losses_d = kernel_engine.train_widedeep_kernel(ds, **kw)
    assert losses_d[-1] < losses_d[0]
    assert params_d["embed"].shape == (V, 4)
    params_q, losses_q = kernel_engine.train_widedeep_kernel(
        ds, partitioned=True, **kw)
    np.testing.assert_allclose(losses_q, losses_d, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params_q["embed"]),
                               np.asarray(params_d["embed"]),
                               rtol=1e-5, atol=5e-6)

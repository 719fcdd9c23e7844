"""Streaming (vocab-space master table) fused-kernel FFM trainer.

The streaming step must reproduce the full-batch kernel trainer's loss
trajectory when fed the same batch every step from the same initial rows
— the pull/push cycle is then semantically a no-op relative to resident
rank-space state (on the touched rows; see the L2 note on
make_streaming_train_step).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import ffm, ffm_kernel


def _toy_batch(seed=0, B=8, L=32, V=300, F=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :8] = rng.integers(0, 8, (B, 8))             # hot head, CTR-like
    fields = rng.integers(0, F, (B, L)).astype(np.int32)
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, fields, labels


def test_streaming_ffm_matches_fullbatch_trajectory():
    ids, vals, mask, fields, labels = _toy_batch(seed=3)
    V, F, Kf = 300, 6, 4
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.1, l2=1e-4,
        interpret=True, exact=True,
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    capacity = plan.n_rows_pad

    st_fb = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    # vocab-space master seeded with the SAME touched-row values
    table_v = np.zeros((V, cfg.row_width), np.float32)
    accum_v = np.zeros((V, cfg.row_width), np.float32)
    uids = plan.uids[: plan.n_unique]
    table_v[uids] = np.asarray(st_fb.table)[: plan.n_unique]
    st_s = ffm_kernel.StreamingFFMState(
        w0=jnp.zeros(()), w0_accum=jnp.zeros(()),
        table=jnp.asarray(table_v), accum=jnp.asarray(accum_v),
    )

    step_fb = ffm_kernel.make_train_step(cfg, plan)
    step_s = ffm_kernel.make_streaming_train_step(cfg, capacity)
    arrays = ffm_kernel.plan_to_arrays(plan, capacity)

    losses_fb, losses_s = [], []
    for _ in range(8):
        st_fb, l_fb = step_fb(st_fb)
        st_s, l_s = step_s(st_s, arrays)
        losses_fb.append(float(l_fb))
        losses_s.append(float(l_s))

    np.testing.assert_allclose(losses_s, losses_fb, rtol=1e-5)
    assert losses_s[-1] < losses_s[0]

    # touched vocab rows equal the full-batch rank rows
    t_s = np.asarray(st_s.table)[uids]
    t_fb = np.asarray(st_fb.table)[: plan.n_unique]
    np.testing.assert_allclose(t_s, t_fb, rtol=1e-5, atol=1e-6)


def test_streaming_ffm_minibatch_trains_and_exports():
    """Different minibatches through one compiled step; exported params
    score via models/ffm.forward."""
    V, F, Kf, B = 300, 6, 4, 8
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.2,
        interpret=True, exact=True,
    )
    capacity = 512
    state = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step = ffm_kernel.make_streaming_train_step(cfg, capacity)

    batches = [_toy_batch(seed=s, B=B, V=V, F=F) for s in range(4)]
    losses = []
    for epoch in range(8):
        for ids, vals, mask, fields, labels in batches:
            plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels,
                                         n_rows_pad=capacity)
            state, loss = step(state, ffm_kernel.plan_to_arrays(plan, capacity))
            losses.append(float(loss))
    assert losses[-1] < 0.8 * losses[0]

    params = ffm_kernel.export_streaming_params(state, cfg)
    ids, vals, mask, fields, labels = batches[0]
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.asarray(fields),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((B,), jnp.float32),
    }
    fcfg = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    logits = ffm.forward(params, batch, fcfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_streaming_ffm_rank_field_matches_per_position():
    """fields_partition=True (rank-field self-term with the rank->field
    map built in-graph) must reproduce the per-position agg streaming
    trajectory on partitioned-field data, across distinct minibatches."""
    V, F, Kf, B = 300, 6, 4, 8
    capacity = 512
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True, agg=True,
    )
    batches = []
    for s in range(3):
        ids, vals, mask, _, labels = _toy_batch(seed=s, B=B, V=V, F=F)
        batches.append((ids, vals, mask, (ids % F).astype(np.int32),
                        labels))

    trajs, finals = {}, {}
    for fp in (False, True):
        state = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        step = ffm_kernel.make_streaming_train_step(cfg, capacity,
                                                    fields_partition=fp)
        losses = []
        for epoch in range(4):
            for ids, vals, mask, fields, labels in batches:
                plan = ffm_kernel.plan_batch(ids, vals, mask, fields,
                                             labels, n_rows_pad=capacity)
                assert plan.rank_field is not None
                state, loss = step(
                    state, ffm_kernel.plan_to_arrays(plan, capacity)
                )
                losses.append(float(loss))
        trajs[fp] = losses
        finals[fp] = np.asarray(state.table)
    np.testing.assert_allclose(trajs[True], trajs[False], rtol=1e-5)
    np.testing.assert_allclose(finals[True], finals[False],
                               rtol=1e-4, atol=1e-6)


def test_sharded_streaming_ffm_matches_single_device():
    """Model-axis-sharded streaming FFM == single-device streaming FFM
    on the 8-virtual-device mesh (the PS-scale FFM capability)."""
    from lightctr_tpu.parallel.mesh import make_mesh
    from lightctr_tpu.parallel.sharded_kernel import (
        make_sharded_streaming_ffm_step,
        shard_streaming_ffm_state,
    )

    V, F, Kf, B = 512, 6, 4, 8          # V divisible by the 8-way axis
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True,
    )
    capacity = 512
    state_1 = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_1 = ffm_kernel.make_streaming_train_step(cfg, capacity)

    mesh = make_mesh(data=1, model=8)
    state_8 = shard_streaming_ffm_state(
        ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    step_8 = make_sharded_streaming_ffm_step(cfg, capacity, mesh)

    batches = [_toy_batch(seed=s, B=B, V=V, F=F) for s in range(3)]
    losses_1, losses_8 = [], []
    for epoch in range(4):
        for ids, vals, mask, fields, labels in batches:
            plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels,
                                         n_rows_pad=capacity)
            arrays = ffm_kernel.plan_to_arrays(plan, capacity)
            state_1, l1 = step_1(state_1, arrays)
            state_8, l8 = step_8(state_8, arrays)
            losses_1.append(float(l1))
            losses_8.append(float(l8))

    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
    assert losses_8[-1] < losses_8[0]
    t1 = np.asarray(state_1.table)
    t8 = np.asarray(jax.device_get(state_8.table))
    np.testing.assert_allclose(t8, t1, rtol=1e-4, atol=1e-6)


def test_fused_streaming_ffm_matches_host_planned():
    """make_streaming_train_step_fused (device planner traced into the
    step, one dispatch per raw [B, L] batch) must reproduce the
    host-planned streaming trajectory exactly, across distinct
    minibatches and for both self-term engines."""
    V, F, Kf, B = 300, 6, 4, 8
    capacity = 512
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True, agg=True,
    )
    batches = []
    for s in range(3):
        ids, vals, mask, _, labels = _toy_batch(seed=s, B=B, V=V, F=F)
        # partitioned fields so fields_partition=True is exercisable too
        batches.append((ids, vals, mask, (ids % F).astype(np.int32),
                        labels))
    row_mask = np.ones((B,), np.float32)

    for fp in (False, True):
        st_h = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        st_f = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        step_h = ffm_kernel.make_streaming_train_step(
            cfg, capacity, fields_partition=fp)
        step_f = ffm_kernel.make_streaming_train_step_fused(
            cfg, capacity, fields_partition=fp)
        losses_h, losses_f = [], []
        for epoch in range(3):
            for ids, vals, mask, fields, labels in batches:
                plan = ffm_kernel.plan_batch(ids, vals, mask, fields,
                                             labels, n_rows_pad=capacity)
                st_h, lh = step_h(
                    st_h, ffm_kernel.plan_to_arrays(plan, capacity))
                st_f, lf = step_f(
                    st_f,
                    jnp.asarray(ids.astype(np.int32)), jnp.asarray(vals),
                    jnp.asarray(mask), jnp.asarray(fields),
                    jnp.asarray(labels), jnp.asarray(row_mask),
                )
                losses_h.append(float(lh))
                losses_f.append(float(lf))
        np.testing.assert_allclose(losses_f, losses_h, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st_f.table), np.asarray(st_h.table),
            rtol=1e-4, atol=1e-6,
        )


def test_device_planner_matches_host_plan():
    """plan_batch_on_device == plan_batch + plan_to_arrays field by field
    (including partial row_mask and invalid positions)."""
    ids, vals, mask, fields, labels = _toy_batch(seed=7)
    B = ids.shape[0]
    row_mask = np.ones((B,), np.float32)
    row_mask[-2:] = 0.0
    mask = mask * row_mask[:, None]
    capacity = 512
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels,
                                 row_mask=row_mask, n_rows_pad=capacity)
    host = ffm_kernel.plan_to_arrays(plan, capacity)
    dev = ffm_kernel.plan_batch_on_device(
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(vals),
        jnp.asarray(mask), jnp.asarray(fields), jnp.asarray(labels),
        jnp.asarray(row_mask), capacity=capacity,
    )
    assert int(dev["n_unique"]) == int(host["n_unique"])
    np.testing.assert_array_equal(np.asarray(dev["uids"]),
                                  np.asarray(host["uids"]))
    np.testing.assert_array_equal(np.asarray(dev["ranks"]),
                                  np.asarray(host["ranks"]))
    np.testing.assert_allclose(np.asarray(dev["xv"]),
                               np.asarray(host["xv"]))

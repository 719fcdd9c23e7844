"""Count-matrix FFM engine (cfg.agg=True) vs the one-hot sweep engine.

The agg engine factorises the position->rank gather through
C[(row, field), rank] (ffm_kernel.count_matrix) so the field-aggregation
tensor is a single matmul S = C @ table; it must reproduce the sweep
engine's losses and trajectories to fp32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

import dataclasses

from lightctr_tpu.models import ffm_kernel


def _toy_batch(seed=0, B=16, L=32, V=300, F=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = rng.random((B, L)).astype(np.float32)  # non-unit x values
    fields = rng.integers(0, F, (B, L)).astype(np.int32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, fields, labels


def test_agg_trajectory_matches_sweep():
    ids, vals, mask, fields, labels = _toy_batch()
    V, F, Kf = 300, 6, 4
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)

    trajs = {}
    for agg in (False, True):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=V, n_fields=F, factor=Kf, learning_rate=0.1,
            l2=1e-4, interpret=True, exact=True, agg=agg,
        )
        st = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = ffm_kernel.make_train_step(cfg, plan)
        traj = []
        for _ in range(4):
            st, loss = step(st)
            traj.append(float(loss))
        trajs[agg] = (traj, np.asarray(st.table))

    np.testing.assert_allclose(trajs[True][0], trajs[False][0], rtol=2e-5)
    np.testing.assert_allclose(trajs[True][1], trajs[False][1],
                               rtol=1e-4, atol=1e-6)


def test_agg_streaming_matches_sweep():
    V, F, Kf = 300, 6, 4
    capacity = 512
    batches = []
    for seed in range(3):
        ids, vals, mask, fields, labels = _toy_batch(seed=seed)
        plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels,
                                     n_rows_pad=capacity)
        batches.append(ffm_kernel.plan_to_arrays(plan, capacity))

    trajs = {}
    for agg in (False, True):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=V, n_fields=F, factor=Kf, learning_rate=0.1,
            interpret=True, exact=True, agg=agg,
        )
        state = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        step = ffm_kernel.make_streaming_train_step(cfg, capacity)
        traj = []
        for b in batches:
            state, loss = step(state, b)
            traj.append(float(loss))
        trajs[agg] = traj
    np.testing.assert_allclose(trajs[True], trajs[False], rtol=2e-5)


def test_count_matrix_values():
    ids, vals, mask, fields, labels = _toy_batch(seed=3, B=4, L=8, V=40, F=3)
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    B, L = vals.shape
    F = 3
    C = np.asarray(ffm_kernel.count_matrix(
        plan.ranks, plan.fields, plan.xv, plan.n_rows_pad, F, jnp.float32))
    want = np.zeros_like(C)
    ranks = np.asarray(plan.ranks)[: B * L].reshape(B, L)
    xv = np.asarray(plan.xv)
    for b in range(B):
        for l in range(L):
            want[b * F + fields[b, l], ranks[b, l]] += xv[b, l]
    np.testing.assert_allclose(C, want, rtol=1e-6)


def test_multi_step_threads_consts():
    """make_multi_step must thread the agg engine's plan-constant count
    matrix (_stepfn/_consts) through the jit boundary as a runtime
    argument and reproduce the per-step python loop exactly — the scan
    wrapper is the product path (cli train --engine kernel --model ffm)."""
    from lightctr_tpu.models.fm_kernel import make_multi_step

    ids, vals, mask, fields, labels = _toy_batch(seed=5)
    V, F, Kf = 300, 6, 4
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.1,
        l2=1e-4, interpret=True, exact=True, agg=True,
    )
    step = ffm_kernel.make_train_step(cfg, plan)
    assert step._consts is not None  # the agg engine carries C

    st = ffm_kernel.init(jax.random.PRNGKey(1), cfg, plan)
    want = []
    s = st
    for _ in range(5):
        s, loss = step(s)
        want.append(float(loss))

    run = make_multi_step(step, 5)
    s2, losses = run(st)
    np.testing.assert_allclose(np.asarray(losses), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.table), np.asarray(s.table),
                               rtol=1e-6, atol=1e-8)


def test_agg_ambiguous_field_fallback():
    """A feature id occurring under TWO different fields disables the
    rank-field self-term (plan.rank_field None) and falls back to the
    per-position path — trajectories must still match the sweep."""
    ids, vals, mask, fields, labels = _toy_batch(seed=7)
    fields = fields.copy()
    # force uid ids[0,0] to appear under two distinct fields
    ids[0, 1] = ids[0, 0]
    mask[0, :2] = 1.0
    fields[0, 0], fields[0, 1] = 0, 1
    V, F, Kf = 300, 6, 4
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    assert plan.rank_field is None

    trajs = {}
    for agg in (False, True):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=V, n_fields=F, factor=Kf, learning_rate=0.1,
            l2=1e-4, interpret=True, exact=True, agg=agg,
        )
        st = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = ffm_kernel.make_train_step(cfg, plan)
        traj = []
        for _ in range(4):
            st, loss = step(st)
            traj.append(float(loss))
        trajs[agg] = traj
    np.testing.assert_allclose(trajs[True], trajs[False], rtol=2e-5)


def test_agg_rank_field_matches_sweep_on_partitioned_fields():
    """Standard libffm structure (each feature id belongs to exactly one
    field): plan.rank_field is defined and the rank-granular self-term
    (_logits_from_counts_rf) must reproduce the sweep trajectory."""
    ids, vals, mask, _, labels = _toy_batch(seed=8)
    V, F, Kf = 300, 6, 4
    fields = (ids % F).astype(np.int32)   # ids partition into fields
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    assert plan.rank_field is not None

    trajs = {}
    for agg in (False, True):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=V, n_fields=F, factor=Kf, learning_rate=0.1,
            l2=1e-4, interpret=True, exact=True, agg=agg,
        )
        st = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = ffm_kernel.make_train_step(cfg, plan)
        traj = []
        for _ in range(5):
            st, loss = step(st)
            traj.append(float(loss))
        trajs[agg] = traj
    np.testing.assert_allclose(trajs[True], trajs[False], rtol=2e-5)

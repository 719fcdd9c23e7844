"""Grouped field-blocked count-matrix FFM engine (models/ffm_kernel.py
plan_batch_grouped / make_train_step_grouped).

Equivalence target: the flat agg engine (itself tested equal to the
dense one-hot sweep and ops/interactions.ffm_interaction). The grouped
layout permutes fields by descending unique count and partitions them
into per-size blocks, so equivalence needs an init TRANSPLANT: the
grouped table is seeded with the flat plan's per-uid rows, with the V
column blocks re-indexed into permuted-field space.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import ffm_kernel


def _toy_batch(seed=0, B=32, L=16, V=300, F=6, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # zipf-ish ids so per-field unique counts differ wildly
        ids = np.minimum(rng.zipf(1.3, (B, L)) - 1, V - 1).astype(np.int64)
    else:
        ids = rng.integers(0, V, (B, L)).astype(np.int64)
    fields = (ids % F).astype(np.int32)     # ids partition into fields
    mask = (rng.random((B, L)) > 0.25).astype(np.float32)
    vals = rng.uniform(0.5, 1.5, (B, L)).astype(np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, fields, labels


def _transplant(flat_state, flat_plan, gplan, cfg):
    """Grouped state carrying the flat state's per-uid rows, V column
    blocks permuted old-field -> new-field, restricted to the ACTIVE
    width (pad slots zero)."""
    F, Kf = cfg.n_fields, cfg.factor
    A = gplan.n_active
    Dwa = ffm_kernel.grouped_row_width(cfg, gplan)
    table_f = np.asarray(flat_state.table)
    table_g = np.zeros((gplan.n_rows_total, Dwa), np.float32)
    uid_to_rank = {int(u): r for r, u in
                   enumerate(flat_plan.uids[: flat_plan.n_unique])}
    csort = gplan.cnts[gplan.inv_perm]
    for gi, (s, e, r, off) in enumerate(zip(gplan.f_start, gplan.f_end,
                                            gplan.r_g, gplan.row_offset)):
        for fl in range(e - s):
            for i in range(int(csort[s + fl])):
                uid = int(gplan.uids_grp[gi][fl, i])
                src = table_f[uid_to_rank[uid]]
                row = np.zeros((Dwa,), np.float32)
                row[0] = src[0]
                v_old = src[1 : 1 + F * Kf].reshape(F, Kf)
                row[1 : 1 + A * Kf] = v_old[gplan.inv_perm[:A]].reshape(-1)
                table_g[off + fl * r + i] = row
    return ffm_kernel.KernelFFMState(
        w0=flat_state.w0,
        w0_accum=flat_state.w0_accum,
        table=jnp.asarray(table_g),
        accum=jnp.zeros((gplan.n_rows_total, Dwa)),
    )


def test_grouped_matches_flat_agg_trajectory():
    ids, vals, mask, fields, labels = _toy_batch(seed=5, skew=True)
    V, F, Kf = 300, 6, 4
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.1, l2=1e-4,
        interpret=True, exact=True, agg=True,
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    gplan = ffm_kernel.plan_batch_grouped(ids, vals, mask, fields, labels,
                                          n_fields=F, slot_pad=8,
                                          max_groups=3)
    assert gplan is not None
    assert int(gplan.cnts.sum()) == plan.n_unique
    assert len(gplan.f_start) <= 3
    # grouped rows never exceed the one-block layout's F * r_max
    assert gplan.n_rows_total <= gplan.n_fields * max(gplan.r_g)

    st_f = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    st_g = _transplant(st_f, plan, gplan, cfg)

    step_f = ffm_kernel.make_train_step(cfg, plan)
    step_g = ffm_kernel.make_train_step_grouped(cfg, gplan)

    losses_f, losses_g = [], []
    for _ in range(6):
        st_f, lf = step_f(st_f)
        st_g, lg = step_g(st_g)
        losses_f.append(float(lf))
        losses_g.append(float(lg))
    np.testing.assert_allclose(losses_g, losses_f, rtol=1e-5)

    # exported full-vocab params match too (de-permuted V axis)
    p_f = ffm_kernel.export_params(st_f, plan, cfg)
    p_g = ffm_kernel.export_params_grouped(st_g, gplan, cfg)
    np.testing.assert_allclose(float(p_g["w0"]), float(p_f["w0"]),
                               rtol=1e-6)
    # atol 1e-6: the per-group einsums change float association order
    # (measured max |diff| 3.8e-7 after 6 Adagrad steps)
    np.testing.assert_allclose(np.asarray(p_g["w"]), np.asarray(p_f["w"]),
                               rtol=1e-5, atol=1e-6)
    # partner-field blocks: equal on ACTIVE fields; blocks for fields
    # never observed in the plan receive no gradient in either engine —
    # the flat engine leaves init noise there, the active-width grouped
    # table doesn't carry them at all and exports zeros
    vf, vg = np.asarray(p_f["v"]), np.asarray(p_g["v"])
    act = gplan.inv_perm[: gplan.n_active]
    np.testing.assert_allclose(vg[:, act], vf[:, act],
                               rtol=1e-5, atol=1e-6)
    inact = gplan.inv_perm[gplan.n_active:]
    assert (vg[:, inact] == 0).all()


def test_grouped_matches_blocked_single_group():
    """max_groups=1 degenerates to the one-block layout (same rows), and
    the trajectories agree from the same transplanted init."""
    ids, vals, mask, fields, labels = _toy_batch(seed=9)
    F = 6
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=300, n_fields=F, factor=4, learning_rate=0.1, l2=0.0,
        interpret=True, exact=True, agg=True,
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    gplan = ffm_kernel.plan_batch_grouped(ids, vals, mask, fields, labels,
                                          n_fields=F, slot_pad=8,
                                          max_groups=1)
    assert len(gplan.f_start) == 1
    st_f = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    st_g = _transplant(st_f, plan, gplan, cfg)
    step_f = ffm_kernel.make_train_step(cfg, plan)
    step_g = ffm_kernel.make_train_step_grouped(cfg, gplan)
    for _ in range(4):
        st_f, lf = step_f(st_f)
        st_g, lg = step_g(st_g)
        np.testing.assert_allclose(float(lg), float(lf), rtol=1e-5)


def test_grouped_partition_dp():
    """The DP picks the row-minimal contiguous grouping."""
    csort = np.array([1000, 900, 100, 90, 10, 10, 10])
    bounds, r_g = ffm_kernel._group_partition(csort, max_groups=3, pad=8)
    # optimal: [1000, 900 | 100, 90 | 10s] = 2*1000 + 2*104 + 3*16
    assert bounds == [0, 2, 4, 7]
    assert r_g == [1000, 104, 16]
    # single group forced
    bounds1, r1 = ffm_kernel._group_partition(csort, max_groups=1, pad=8)
    assert bounds1 == [0, 7] and r1 == [1000]


def test_grouped_multi_step_threads_consts():
    """make_multi_step must thread the per-group count matrices through
    the jit boundary (the _stepfn/_consts protocol)."""
    from lightctr_tpu.models.fm_kernel import make_multi_step

    ids, vals, mask, fields, labels = _toy_batch(seed=6, skew=True)
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=300, n_fields=6, factor=4, learning_rate=0.1, l2=1e-4,
        interpret=True, exact=True, agg=True,
    )
    gplan = ffm_kernel.plan_batch_grouped(ids, vals, mask, fields, labels,
                                          n_fields=6, slot_pad=8)
    st = ffm_kernel.init_grouped(jax.random.PRNGKey(1), cfg, gplan)
    step = ffm_kernel.make_train_step_grouped(cfg, gplan)
    assert step._consts is not None

    want = []
    s = st
    for _ in range(5):
        s, loss = step(s)
        want.append(float(loss))
    s2, losses = make_multi_step(step, 5)(st)
    np.testing.assert_allclose(np.asarray(losses), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.table), np.asarray(s.table),
                               rtol=1e-6, atol=1e-8)


def test_grouped_plan_rejects_ambiguous_fields():
    ids, vals, mask, fields, labels = _toy_batch(seed=7)
    fields = fields.copy()
    ids[0, 1] = ids[0, 0]
    mask[0, :2] = 1.0
    fields[0, 0], fields[0, 1] = 0, 1     # same id under two fields
    gplan = ffm_kernel.plan_batch_grouped(ids, vals, mask, fields, labels,
                                          n_fields=6)
    assert gplan is None


def test_grouped_empty_fields_get_no_rows():
    """Fields with no observed ids contribute zero table rows, and the
    model still trains/export covers the full field axis."""
    ids, vals, mask, fields, labels = _toy_batch(seed=8)
    F = 10                                # fields 6..9 never occur
    gplan = ffm_kernel.plan_batch_grouped(ids, vals, mask, fields, labels,
                                          n_fields=F, slot_pad=8)
    assert gplan.n_active <= 6
    active_rows = sum((e - s) * r for s, e, r in
                      zip(gplan.f_start, gplan.f_end, gplan.r_g))
    assert gplan.n_rows_total == active_rows
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=300, n_fields=F, factor=2, learning_rate=0.1,
        interpret=True, exact=True, agg=True,
    )
    st = ffm_kernel.init_grouped(jax.random.PRNGKey(0), cfg, gplan)
    step = ffm_kernel.make_train_step_grouped(cfg, gplan)
    losses = []
    for _ in range(6):
        st, loss = step(st)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    p = ffm_kernel.export_params_grouped(st, gplan, cfg)
    assert np.asarray(p["v"]).shape == (300, F, 2)


def test_engine_routes_grouped_and_scores():
    """train_ffm_kernel takes the grouped path on partitioned-field data
    and its exported params score through models/ffm.forward."""
    from lightctr_tpu.models import ffm
    from lightctr_tpu.train.kernel_engine import train_ffm_kernel

    ids, vals, mask, fields, labels = _toy_batch(seed=8, B=64, skew=True)

    class DS:
        def __len__(self):
            return len(self.labels)

    ds = DS()
    ds.ids, ds.vals, ds.mask, ds.fields, ds.labels = (
        ids, vals, mask, fields, labels
    )
    ds.n_features, ds.n_fields = 300, 6
    params, losses = train_ffm_kernel(ds, factor=4, learning_rate=0.1,
                                      l2=1e-4, epochs=8, log=None)
    assert losses[-1] < losses[0]
    batch = {
        "ids": jnp.asarray(ids.astype(np.int32)),
        "vals": jnp.asarray(vals),
        "fields": jnp.asarray(fields),
        "mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "row_mask": jnp.ones((ids.shape[0],), jnp.float32),
    }
    fcfg = ffm.FFMConfig(n_features=300, n_fields=6, factor=4)
    logits = ffm.forward(params, batch, fcfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_engine_over_budget_falls_back_to_sweep(monkeypatch):
    """When the grouped working set exceeds the memory gate, the engine
    must fall back to a non-grouped engine and still train: on TPU the
    dense Pallas sweep (agg=False — the flat count-matrix engine's
    C [B*F, R] is strictly larger, so 'falling back' to it would use
    MORE HBM); off-TPU the flat XLA engine (the sweep would run
    interpret-mode Pallas, and the budget guards HBM, not host RAM)."""
    from lightctr_tpu.train import kernel_engine

    ids, vals, mask, fields, labels = _toy_batch(seed=3, B=16, L=8, V=64)

    class DS:
        def __len__(self):
            return len(self.labels)

    ds = DS()
    ds.ids, ds.vals, ds.mask, ds.fields, ds.labels = (
        ids, vals, mask, fields, labels
    )
    ds.n_features, ds.n_fields = 64, 6
    monkeypatch.setattr(kernel_engine, "FFM_BLOCKED_MAX_BYTES", 1)
    params, losses = kernel_engine.train_ffm_kernel(
        ds, factor=2, learning_rate=0.1, epochs=3, log=None
    )
    assert np.isfinite(losses).all()
    assert np.asarray(params["v"]).shape == (64, 6, 2)


def test_engine_data_mesh_falls_back_unsharded(monkeypatch):
    """--mesh Nx1 FFM with failed grouped preconditions (here: ambiguous
    fields) must train UNSHARDED instead of raising a self-contradicting
    error."""
    from lightctr_tpu.parallel.mesh import make_mesh
    from lightctr_tpu.train.kernel_engine import train_ffm_kernel

    ids, vals, mask, fields, labels = _toy_batch(seed=4, B=32)
    fields = fields.copy()
    ids[0, 1] = ids[0, 0]
    mask[0, :2] = 1.0
    fields[0, 0], fields[0, 1] = 0, 1     # same id under two fields

    class DS:
        def __len__(self):
            return len(self.labels)

    ds = DS()
    ds.ids, ds.vals, ds.mask, ds.fields, ds.labels = (
        ids, vals, mask, fields, labels
    )
    ds.n_features, ds.n_fields = 300, 6
    mesh = make_mesh(data=8, model=1)
    params, losses = train_ffm_kernel(ds, factor=2, learning_rate=0.1,
                                      epochs=3, log=None, mesh=mesh)
    assert np.isfinite(losses).all()
    assert np.asarray(params["v"]).shape == (300, 6, 2)


def test_group_partition_octave_mode():
    """octave=True quantises capacities AND group boundaries to
    slot_pad*2^k count-octaves — the stability property the serving
    layout reuse builds on."""
    import numpy as np

    from lightctr_tpu.models import ffm_kernel

    rng = np.random.default_rng(2)
    B, L, V, F = 64, 16, 5000, 8
    ids = (rng.integers(0, V // F, (B, L)) * F
           + rng.integers(0, F, (B, L))).astype(np.int64)
    # force id -> field consistency (id % F is the field)
    fields = (ids % F).astype(np.int64)
    plan = ffm_kernel.plan_batch_grouped(
        ids, np.ones((B, L), np.float32), np.ones((B, L), np.float32),
        fields, np.zeros((B,), np.float32), slot_pad=16, n_fields=F,
        octave=True)
    assert plan is not None
    for r in plan.r_g:
        k = r // 16
        assert k >= 1 and k & (k - 1) == 0, f"capacity {r} is not 16*2^k"
    # capacities cover the true counts; groups are non-empty
    csort = np.sort(plan.cnts)[::-1][: plan.n_active]
    for s, e, r in zip(plan.f_start, plan.f_end, plan.r_g):
        assert e > s, "empty group segment"
        assert csort[s:e].max() <= r

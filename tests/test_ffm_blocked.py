"""Field-blocked count-matrix FFM engine (models/ffm_kernel.py
plan_batch_blocked / make_train_step_blocked).

Equivalence target: the flat agg engine (itself tested equal to the
dense one-hot sweep and ops/interactions.ffm_interaction). The blocked
layout permutes ranks into (field, slot) blocks, so equivalence needs an
init TRANSPLANT: the blocked table is seeded with the flat plan's
per-uid rows.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import ffm_kernel


def _toy_batch(seed=0, B=32, L=16, V=300, F=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    fields = (ids % F).astype(np.int32)     # ids partition into fields
    mask = (rng.random((B, L)) > 0.25).astype(np.float32)
    vals = rng.uniform(0.5, 1.5, (B, L)).astype(np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, fields, labels


def _transplant(flat_state, flat_plan, bplan, cfg):
    """Blocked state carrying the flat state's per-uid rows (pad slots
    zero, like the flat plan's zeroed padding rank)."""
    table_f = np.asarray(flat_state.table)
    R_blk = bplan.n_fields * bplan.r_max
    table_b = np.zeros((R_blk, cfg.row_width), np.float32)
    uid_to_rank = {int(u): r for r, u in
                   enumerate(flat_plan.uids[: flat_plan.n_unique])}
    for f in range(bplan.n_fields):
        for i in range(int(bplan.cnts[f])):
            uid = int(bplan.uids_blk[f, i])
            table_b[f * bplan.r_max + i] = table_f[uid_to_rank[uid]]
    return ffm_kernel.KernelFFMState(
        w0=flat_state.w0,
        w0_accum=flat_state.w0_accum,
        table=jnp.asarray(table_b),
        accum=jnp.zeros((R_blk, cfg.row_width)),
    )


def test_blocked_matches_flat_agg_trajectory():
    ids, vals, mask, fields, labels = _toy_batch(seed=5)
    V, F, Kf = 300, 6, 4
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=Kf, learning_rate=0.1, l2=1e-4,
        interpret=True, exact=True, agg=True,
    )
    plan = ffm_kernel.plan_batch(ids, vals, mask, fields, labels)
    bplan = ffm_kernel.plan_batch_blocked(ids, vals, mask, fields, labels,
                                          n_fields=F)
    assert bplan is not None
    # every (field, slot) uid appears in the flat plan and vice versa
    assert int(bplan.cnts.sum()) == plan.n_unique

    st_f = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    st_b = _transplant(st_f, plan, bplan, cfg)

    step_f = ffm_kernel.make_train_step(cfg, plan)
    step_b = ffm_kernel.make_train_step_blocked(cfg, bplan)

    losses_f, losses_b = [], []
    for _ in range(6):
        st_f, lf = step_f(st_f)
        st_b, lb = step_b(st_b)
        losses_f.append(float(lf))
        losses_b.append(float(lb))
    np.testing.assert_allclose(losses_b, losses_f, rtol=1e-5)

    # exported full-vocab params match too
    p_f = ffm_kernel.export_params(st_f, plan, cfg)
    p_b = ffm_kernel.export_params_blocked(st_b, bplan, cfg)
    np.testing.assert_allclose(float(p_b["w0"]), float(p_f["w0"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_b["w"]), np.asarray(p_f["w"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_b["v"]), np.asarray(p_f["v"]),
                               rtol=1e-5, atol=1e-7)


def test_blocked_multi_step_threads_consts():
    """make_multi_step must thread the blocked count matrices through the
    jit boundary (the _stepfn/_consts protocol)."""
    from lightctr_tpu.models.fm_kernel import make_multi_step

    ids, vals, mask, fields, labels = _toy_batch(seed=6)
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=300, n_fields=6, factor=4, learning_rate=0.1, l2=1e-4,
        interpret=True, exact=True, agg=True,
    )
    bplan = ffm_kernel.plan_batch_blocked(ids, vals, mask, fields, labels,
                                          n_fields=6)
    st = ffm_kernel.init_blocked(jax.random.PRNGKey(1), cfg, bplan)
    step = ffm_kernel.make_train_step_blocked(cfg, bplan)
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


def test_blocked_plan_rejects_ambiguous_fields():
    ids, vals, mask, fields, labels = _toy_batch(seed=7)
    fields = fields.copy()
    ids[0, 1] = ids[0, 0]
    mask[0, :2] = 1.0
    fields[0, 0], fields[0, 1] = 0, 1     # same id under two fields
    bplan = ffm_kernel.plan_batch_blocked(ids, vals, mask, fields, labels,
                                          n_fields=6)
    assert bplan is None


def test_engine_routes_blocked_and_scores(tmp_path):
    """train_ffm_kernel takes the blocked path on partitioned-field data
    and its exported params score through models/ffm.forward."""
    from lightctr_tpu.models import ffm
    from lightctr_tpu.train.kernel_engine import train_ffm_kernel

    ids, vals, mask, fields, labels = _toy_batch(seed=8, B=64)

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

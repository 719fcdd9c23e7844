"""Model-axis-sharded streaming kernel FM (parallel/sharded_kernel.py)
must reproduce the single-device streaming trajectory exactly — the PS
capability test on the 8-virtual-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.data import sparse_batches
from lightctr_tpu.models import fm_kernel
from lightctr_tpu.ops.embedding_pallas import TILE
from lightctr_tpu.parallel.mesh import make_mesh
from lightctr_tpu.parallel.sharded_kernel import (
    make_dp_sharded_streaming_step,
    make_sharded_streaming_step,
    shard_plan,
    shard_streaming_state,
)


def test_sharded_streaming_matches_single_device(sparse_small):
    ds = sparse_small
    V = 1024          # rounded vocab, divisible by the 8-way model axis
    B = 128
    capacity = 4 * TILE
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.25, l2=1e-4,
        interpret=True, exact=True,
    )

    # identical init on both paths
    state_1 = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    table0 = np.array(state_1.table)

    step_1 = fm_kernel.make_streaming_train_step(cfg, capacity, 128)

    mesh = make_mesh(data=1, model=8)
    state_8 = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    step_8 = make_sharded_streaming_step(cfg, capacity, 128, mesh)

    losses_1, losses_8 = [], []
    for epoch in range(5):
        for b in sparse_batches(ds, B):
            arrays = fm_kernel.plan_batch_on_device(
                jnp.asarray(b["ids"], jnp.int32), jnp.asarray(b["vals"]),
                jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
                jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=128,
            )
            state_1, l1 = step_1(state_1, arrays)
            state_8, l8 = step_8(state_8, arrays)
            losses_1.append(float(l1))
            losses_8.append(float(l8))

    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
    assert losses_8[-1] < 0.5 * losses_8[0]

    # final master tables agree row-for-row (gather the sharded one)
    t1 = np.asarray(state_1.table)
    t8 = np.asarray(jax.device_get(state_8.table))
    np.testing.assert_allclose(t8, t1, rtol=1e-4, atol=1e-6)
    # and training actually changed the table
    assert np.abs(t1 - table0).max() > 1e-3


def test_dp_sharded_streaming_matches_single_device(sparse_small):
    """2-D (data x model) position-sharded step == single-device streaming
    trajectory: one global rank space, partial rowsum/grad psums over
    `data`, owned-row Adagrad over `model`."""
    ds = sparse_small
    V, B, capacity, b_pad = 1024, 128, 4 * TILE, 128
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.25, l2=1e-4,
        interpret=True, exact=True,
    )

    state_1 = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_1 = fm_kernel.make_streaming_train_step(cfg, capacity, b_pad)

    mesh = make_mesh(data=2, model=4)
    state_m = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    step_m = make_dp_sharded_streaming_step(cfg, capacity, b_pad, mesh)

    losses_1, losses_m = [], []
    for epoch in range(3):
        for b in sparse_batches(ds, B):
            arrays = fm_kernel.plan_batch_on_device(
                jnp.asarray(b["ids"], jnp.int32), jnp.asarray(b["vals"]),
                jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
                jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=b_pad,
                n_pad_multiple=mesh.shape["data"] * TILE,
            )
            state_1, l1 = step_1(state_1, arrays)
            state_m, lm = step_m(state_m, shard_plan(arrays, mesh))
            losses_1.append(float(l1))
            losses_m.append(float(lm))

    # First step is bitwise-fresh state, so it must match tightly; later
    # steps accumulate fp32 reduction-order drift (the data-axis psum sums
    # partial rowsums/grads in a different order than the single-device
    # scatter) which Adagrad's sqrt amplifies chaotically — hence the
    # looser trajectory tolerance. Per-step numerics are pinned at 1e-5 by
    # test_dp_sharded_streaming_data_major_mesh.
    np.testing.assert_allclose(losses_m[0], losses_1[0], rtol=1e-6)
    np.testing.assert_allclose(losses_m, losses_1, rtol=1e-3)
    assert losses_m[-1] < 0.7 * losses_m[0]
    t1 = np.asarray(state_1.table)
    tm = np.asarray(jax.device_get(state_m.table))
    np.testing.assert_allclose(tm, t1, rtol=5e-3, atol=1e-4)


def test_dp_sharded_streaming_data_major_mesh(sparse_small):
    """data=4 x model=2: one step runs and the loss matches 1-device."""
    ds = sparse_small
    V, B, capacity, b_pad = 1024, 128, 4 * TILE, 128
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.25, interpret=True, exact=True,
    )
    mesh = make_mesh(data=4, model=2)
    b0 = next(iter(sparse_batches(ds, B)))
    arrays = fm_kernel.plan_batch_on_device(
        jnp.asarray(b0["ids"], jnp.int32), jnp.asarray(b0["vals"]),
        jnp.asarray(b0["mask"]), jnp.asarray(b0["labels"]),
        jnp.asarray(b0["row_mask"]), capacity=capacity, b_pad=b_pad,
        n_pad_multiple=mesh.shape["data"] * TILE,
    )
    state_1 = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    _, l1 = fm_kernel.make_streaming_train_step(cfg, capacity, b_pad)(
        state_1, arrays
    )
    state_m = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    _, lm = make_dp_sharded_streaming_step(cfg, capacity, b_pad, mesh)(
        state_m, arrays
    )
    np.testing.assert_allclose(float(lm), float(l1), rtol=1e-5)


def test_sharded_streaming_uses_all_shards(sparse_small):
    """Every shard's rows must receive updates when ids span the vocab."""
    ds = sparse_small
    V, B, capacity = 1024, 128, 4 * TILE
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.25, interpret=True, exact=True,
    )
    mesh = make_mesh(data=1, model=8)
    state = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(1), cfg), mesh
    )
    table0 = np.asarray(jax.device_get(state.table))
    step = make_sharded_streaming_step(cfg, capacity, 128, mesh)

    # spread ids across the whole [0, V) range so every shard owns some
    rng = np.random.default_rng(0)
    b0 = next(iter(sparse_batches(ds, B)))
    ids = rng.integers(0, V, b0["ids"].shape).astype(np.int32)
    arrays = fm_kernel.plan_batch_on_device(
        jnp.asarray(ids), jnp.asarray(b0["vals"]), jnp.asarray(b0["mask"]),
        jnp.asarray(b0["labels"]), jnp.asarray(b0["row_mask"]),
        capacity=capacity, b_pad=128,
    )
    state, _ = step(state, arrays)
    t1 = np.asarray(jax.device_get(state.table))
    per_shard = np.abs(t1 - table0).reshape(8, V // 8, -1).max(axis=(1, 2))
    assert (per_shard > 0).all(), per_shard


def test_sharded_streaming_nfm_matches_single_device(sparse_small):
    """Model-axis-sharded streaming NFM == single-device streaming NFM
    (table pull/push sharded; MLP tower replicated + kept in lockstep)."""
    from lightctr_tpu.models import nfm_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_sharded_streaming_nfm_step,
        shard_streaming_nfm_state,
    )

    ds = sparse_small
    V, B, capacity, b_pad = 1024, 128, 4 * TILE, 128
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=4, hidden=(8,), learning_rate=0.25,
        mlp_learning_rate=1e-3, l2=1e-4, interpret=True, exact=True,
    )

    state_1 = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_1 = nfm_kernel.make_streaming_train_step(cfg, capacity, b_pad)

    mesh = make_mesh(data=1, model=8)
    state_8 = shard_streaming_nfm_state(
        nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    step_8 = make_sharded_streaming_nfm_step(cfg, capacity, b_pad, mesh)

    losses_1, losses_8 = [], []
    for epoch in range(3):
        for b in sparse_batches(ds, B):
            arrays = fm_kernel.plan_batch_on_device(
                jnp.asarray(b["ids"], jnp.int32), jnp.asarray(b["vals"]),
                jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
                jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=b_pad,
            )
            state_1, l1 = step_1(state_1, arrays)
            state_8, l8 = step_8(state_8, arrays)
            losses_1.append(float(l1))
            losses_8.append(float(l8))

    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
    assert losses_8[-1] < 0.7 * losses_8[0]
    t1 = np.asarray(state_1.table)
    t8 = np.asarray(jax.device_get(state_8.table))
    np.testing.assert_allclose(t8, t1, rtol=1e-4, atol=1e-6)
    # MLP replicas advanced identically on every shard
    import jax as _jax
    _jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        jax.device_get(state_8.mlp), state_1.mlp,
    )


def test_sharded_streaming_ffm_matches_single_device():
    """Model-axis-sharded streaming FFM == single-device streaming FFM,
    for BOTH engines (one-hot sweep and count-matrix agg). Capability:
    the reference FFM under its PS cluster (train_ffm_algo.cpp:51-116 +
    paramserver.h:122-300) — the FFM table is (1 + F*K)-wide per row,
    the heaviest of the kernel family."""
    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_sharded_streaming_ffm_step,
        shard_streaming_ffm_state,
    )

    rng = np.random.default_rng(4)
    V, F, Kf, B, L = 1024, 6, 4, 32, 12
    capacity = 512
    mesh = make_mesh(data=1, model=8)

    for agg, fp in ((False, False), (True, False), (True, True)):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=V, n_fields=F, factor=Kf, learning_rate=0.2,
            l2=1e-4, interpret=True, exact=True, agg=agg,
        )
        state_1 = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        state_8 = shard_streaming_ffm_state(
            ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
        )
        step_1 = ffm_kernel.make_streaming_train_step(
            cfg, capacity, fields_partition=fp
        )
        step_8 = make_sharded_streaming_ffm_step(
            cfg, capacity, mesh, fields_partition=fp
        )

        losses_1, losses_8 = [], []
        for i in range(6):
            ids = rng.integers(0, V, (B, L)).astype(np.int64)
            plan = ffm_kernel.plan_batch(
                ids, np.ones((B, L), np.float32), np.ones((B, L), np.float32),
                (ids % F).astype(np.int32),
                ((ids < 200).sum(axis=1) > 3).astype(np.float32),
                n_rows_pad=capacity,
            )
            arrays = ffm_kernel.plan_to_arrays(plan, capacity)
            state_1, l1 = step_1(state_1, arrays)
            state_8, l8 = step_8(state_8, arrays)
            losses_1.append(float(l1))
            losses_8.append(float(l8))

        np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
        t1 = np.asarray(state_1.table)
        t8 = np.asarray(jax.device_get(state_8.table))
        np.testing.assert_allclose(t8, t1, rtol=1e-4, atol=1e-6)


def test_xmat_sharded_matches_single_device(sparse_small):
    """Data-sharded full-batch xmat step == single-device xmat step (the
    headline full-batch trainer scaled over `data` — the reference's
    Ring-AllReduce regime on its full-batch FM). Also exercises the
    make_multi_step consts threading for the sharded step."""
    from lightctr_tpu.parallel.sharded_kernel import (
        make_xmat_sharded_train_step,
    )

    ds = sparse_small
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=4, learning_rate=0.25, l2=1e-4,
        interpret=True, exact=True, xmat=True,
    )
    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels
    )
    mesh = make_mesh(data=8, model=1)

    state_1 = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    state_8 = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step_1 = fm_kernel.make_train_step(cfg, plan)
    step_8 = make_xmat_sharded_train_step(cfg, plan, mesh)

    losses_1, losses_8 = [], []
    for _ in range(5):
        state_1, l1 = step_1(state_1)
        state_8, l8 = step_8(state_8)
        losses_1.append(float(l1))
        losses_8.append(float(l8))
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
    # rows: psum reduces in a different order than the single-device sum;
    # Adagrad's 1/sqrt(accum) amplifies the ulp differences over 5 steps
    np.testing.assert_allclose(np.asarray(jax.device_get(state_8.rows)),
                               np.asarray(state_1.rows),
                               rtol=1e-3, atol=1e-5)

    # scan wrapper threads the sharded count matrices as runtime args
    run = fm_kernel.make_multi_step(step_8, 3)
    state_8b = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    _, losses = run(state_8b)
    np.testing.assert_allclose(np.asarray(losses), losses_8[:3], rtol=1e-5)


def test_grouped_ffm_sharded_matches_single_device(sparse_small):
    """Data-sharded grouped FFM step == single-device grouped step (the
    FFM headline full-batch trainer scaled over `data`), incl. the
    make_multi_step consts threading."""
    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_grouped_sharded_ffm_step,
    )

    ds = sparse_small
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=ds.n_features, n_fields=ds.n_fields, factor=2,
        learning_rate=0.2, l2=1e-4, interpret=True, exact=True, agg=True,
    )
    gplan = ffm_kernel.plan_batch_grouped(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels,
        n_fields=ds.n_fields, slot_pad=8,
    )
    assert gplan is not None
    mesh = make_mesh(data=8, model=1)

    state_1 = ffm_kernel.init_grouped(jax.random.PRNGKey(0), cfg, gplan)
    state_8 = ffm_kernel.init_grouped(jax.random.PRNGKey(0), cfg, gplan)
    step_1 = ffm_kernel.make_train_step_grouped(cfg, gplan)
    step_8 = make_grouped_sharded_ffm_step(cfg, gplan, mesh)

    losses_1, losses_8 = [], []
    for _ in range(5):
        state_1, l1 = step_1(state_1)
        state_8, l8 = step_8(state_8)
        losses_1.append(float(l1))
        losses_8.append(float(l8))
    # rtol 1e-4: psum reduce order + the FFM pairwise square amplify ulp
    # differences through Adagrad faster than the FM xmat case
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax.device_get(state_8.table)),
                               np.asarray(state_1.table),
                               rtol=1e-3, atol=1e-5)

    run = fm_kernel.make_multi_step(step_8, 3)
    state_8b = ffm_kernel.init_grouped(jax.random.PRNGKey(0), cfg, gplan)
    _, losses = run(state_8b)
    np.testing.assert_allclose(np.asarray(losses), losses_8[:3], rtol=1e-4)


def test_engine_data_mesh_full_batch_fm(sparse_small):
    """train_fm_kernel with a data-only mesh + full batch routes to the
    xmat data-sharded step and reproduces the unsharded engine's losses
    (the CLI `--engine kernel --mesh 8x1` product path)."""
    from lightctr_tpu.train.kernel_engine import train_fm_kernel

    ds = sparse_small
    kw = dict(factor=4, learning_rate=0.1, l2=1e-4, epochs=4,
              batch_size=len(ds), log=None)
    params_1, losses_1 = train_fm_kernel(ds, **kw)
    mesh = make_mesh(data=8, model=1)
    params_8, losses_8 = train_fm_kernel(ds, mesh=mesh, **kw)
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(params_8["w"]),
                               np.asarray(params_1["w"]),
                               rtol=1e-3, atol=1e-5)


def test_engine_data_mesh_full_batch_ffm(sparse_small):
    """train_ffm_kernel with a data-only mesh routes to the grouped
    data-sharded step and reproduces the unsharded grouped engine's
    losses (the CLI `--engine kernel --mesh 8x1` product path)."""
    from lightctr_tpu.train.kernel_engine import train_ffm_kernel

    ds = sparse_small
    kw = dict(factor=2, learning_rate=0.1, l2=1e-4, epochs=4, log=None)
    params_1, losses_1 = train_ffm_kernel(ds, **kw)
    mesh = make_mesh(data=8, model=1)
    params_8, losses_8 = train_ffm_kernel(ds, mesh=mesh, **kw)
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(params_8["w"]),
                               np.asarray(params_1["w"]),
                               rtol=1e-3, atol=1e-5)


def test_dp_sharded_streaming_nfm_matches_single_device(sparse_small):
    """2-D (data x model) streaming NFM == single-device trajectory:
    positions sharded over `data`, vocab table over `model`, MLP tower
    replicated in lockstep (VERDICT r2 #6)."""
    from lightctr_tpu.models import nfm_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_dp_sharded_streaming_nfm_step,
        shard_plan,
        shard_streaming_nfm_state,
    )

    ds = sparse_small
    V, B, capacity, b_pad = 1024, 128, 4 * TILE, 128
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=4, hidden=(8,), learning_rate=0.25,
        mlp_learning_rate=1e-3, l2=1e-4, interpret=True, exact=True,
    )
    state_1 = nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_1 = nfm_kernel.make_streaming_train_step(cfg, capacity, b_pad)

    mesh = make_mesh(data=2, model=4)
    state_m = shard_streaming_nfm_state(
        nfm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
    )
    step_m = make_dp_sharded_streaming_nfm_step(cfg, capacity, b_pad, mesh)

    losses_1, losses_m = [], []
    for epoch in range(3):
        for b in sparse_batches(ds, B):
            arrays = fm_kernel.plan_batch_on_device(
                jnp.asarray(b["ids"], jnp.int32), jnp.asarray(b["vals"]),
                jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
                jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=b_pad,
                n_pad_multiple=mesh.shape["data"] * TILE,
            )
            state_1, l1 = step_1(state_1, arrays)
            state_m, lm = step_m(state_m, shard_plan(arrays, mesh))
            losses_1.append(float(l1))
            losses_m.append(float(lm))

    # same tolerance rationale as test_dp_sharded_streaming_matches_*:
    # the data psum's reduction order drifts from the single-device
    # scatter at fp32, which Adagrad amplifies over steps
    np.testing.assert_allclose(losses_m[0], losses_1[0], rtol=1e-6)
    np.testing.assert_allclose(losses_m, losses_1, rtol=1e-3)
    assert losses_m[-1] < 0.7 * losses_m[0]
    t1 = np.asarray(state_1.table)
    tm = np.asarray(jax.device_get(state_m.table))
    np.testing.assert_allclose(tm, t1, rtol=5e-3, atol=1e-4)


def test_dp_sharded_streaming_ffm_matches_single_device():
    """2-D (data x model) streaming FFM == single-device trajectory for
    both engines: the heaviest table of the family shards over `model`
    while the batch shards over `data` (VERDICT r2 #6 — the reference PS
    combined data-parallel workers with sharded tables,
    distributed_algo_abst.h:176-280)."""
    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_dp_sharded_streaming_ffm_step,
        shard_streaming_ffm_state,
    )

    rng = np.random.default_rng(4)
    # B*L/data must be a TILE(512) multiple for the non-agg sweep engine
    V, F, Kf, B, L = 1024, 6, 4, 64, 16
    capacity = 1024
    mesh = make_mesh(data=2, model=4)

    for agg, fp in ((False, False), (True, False), (True, True)):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=V, n_fields=F, factor=Kf, learning_rate=0.2,
            l2=1e-4, interpret=True, exact=True, agg=agg,
        )
        state_1 = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        state_m = shard_streaming_ffm_state(
            ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), mesh
        )
        step_1 = ffm_kernel.make_streaming_train_step(
            cfg, capacity, fields_partition=fp
        )
        step_m = make_dp_sharded_streaming_ffm_step(
            cfg, capacity, mesh, fields_partition=fp
        )

        losses_1, losses_m = [], []
        for i in range(6):
            ids = rng.integers(0, V, (B, L)).astype(np.int64)
            plan = ffm_kernel.plan_batch(
                ids, np.ones((B, L), np.float32), np.ones((B, L), np.float32),
                (ids % F).astype(np.int32),
                ((ids < 200).sum(axis=1) > 3).astype(np.float32),
                n_rows_pad=capacity,
            )
            arrays = ffm_kernel.plan_to_arrays(plan, capacity)
            state_1, l1 = step_1(state_1, arrays)
            state_m, lm = step_m(state_m, arrays)
            losses_1.append(float(l1))
            losses_m.append(float(lm))

        np.testing.assert_allclose(losses_m[0], losses_1[0], rtol=1e-6)
        np.testing.assert_allclose(losses_m, losses_1, rtol=1e-3)
        t1 = np.asarray(state_1.table)
        tm = np.asarray(jax.device_get(state_m.table))
        np.testing.assert_allclose(tm, t1, rtol=5e-3, atol=1e-4)


def test_sharded_streaming_wd_matches_single_device(sparse_small):
    """Model-axis-sharded streaming W&D == single-device packed W&D
    (packed master sharded; flat-agg core + tower replicated)."""
    from lightctr_tpu.models import ffm_kernel, widedeep_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_sharded_streaming_wd_step,
        shard_streaming_wd_state,
    )

    ds = sparse_small
    V, B, F, capacity = 1024, 128, 5, 512
    cfg = widedeep_kernel.KernelWDConfig(
        n_features=V, n_fields=F, embed_dim=4, hidden=(8,),
        learning_rate=0.25, mlp_learning_rate=1e-3, l2=1e-4,
        interpret=True, exact=True,
    )

    state_1 = widedeep_kernel.streaming_init_packed(
        jax.random.PRNGKey(0), cfg)
    step_1 = widedeep_kernel.make_streaming_train_step_packed(cfg,
                                                              capacity)
    mesh = make_mesh(data=1, model=8)
    state_8 = shard_streaming_wd_state(
        widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        mesh)
    step_8 = make_sharded_streaming_wd_step(cfg, capacity, mesh)

    losses_1, losses_8 = [], []
    for epoch in range(3):
        for b in sparse_batches(ds, B):
            ids = np.asarray(b["ids"]) % V
            arrays = ffm_kernel.plan_batch_on_device(
                jnp.asarray(ids, jnp.int32), jnp.asarray(b["vals"]),
                jnp.asarray(b["mask"]),
                jnp.asarray(np.asarray(b["fields"]) % F, jnp.int32),
                jnp.asarray(b["labels"]), jnp.asarray(b["row_mask"]),
                capacity=capacity,
            )
            state_1, l1 = step_1(state_1, arrays)
            state_8, l8 = step_8(state_8, arrays)
            losses_1.append(float(l1))
            losses_8.append(float(l8))

    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
    assert losses_8[-1] < 0.8 * losses_8[0]
    p1 = np.asarray(state_1.packed)
    p8 = np.asarray(jax.device_get(state_8.packed))
    np.testing.assert_allclose(p8, p1, rtol=1e-4, atol=1e-6)


def test_sharded_wd_honors_mlp_optimizer(sparse_small):
    """Regression (r5 review): the sharded twins must build the tower
    optimizer from cfg.mlp_optimizer — an adagrad config previously hit
    the hardcoded Adam update with adagrad opt-state and crashed."""
    from lightctr_tpu.models import ffm_kernel, widedeep_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_sharded_streaming_wd_step,
        shard_streaming_wd_state,
    )

    V, F, capacity = 1024, 5, 512
    cfg = widedeep_kernel.KernelWDConfig(
        n_features=V, n_fields=F, embed_dim=4, hidden=(8,),
        mlp_optimizer="adagrad", interpret=True, exact=True)
    mesh = make_mesh(data=1, model=8)
    state = shard_streaming_wd_state(
        widedeep_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        mesh)
    step = make_sharded_streaming_wd_step(cfg, capacity, mesh)
    b = next(iter(sparse_batches(sparse_small, 128)))
    arrays = ffm_kernel.plan_batch_on_device(
        jnp.asarray(np.asarray(b["ids"]) % V, jnp.int32),
        jnp.asarray(b["vals"]), jnp.asarray(b["mask"]),
        jnp.asarray(np.asarray(b["fields"]) % F, jnp.int32),
        jnp.asarray(b["labels"]), jnp.asarray(b["row_mask"]),
        capacity=capacity)
    state, loss = step(state, arrays)
    assert np.isfinite(float(loss))

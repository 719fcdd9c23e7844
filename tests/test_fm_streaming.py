"""Streaming (per-batch-plan) fused-kernel FM trainer."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.data import sparse_batches
from lightctr_tpu.models import fm, fm_kernel
from lightctr_tpu.ops.embedding_pallas import TILE


def test_streaming_kernel_fm_trains(sparse_small):
    ds = sparse_small
    B = 128
    capacity = 4 * TILE  # >= max unique per batch (+TILE)
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=4, learning_rate=0.25,
        interpret=True, exact=True,
    )
    state = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step = None
    losses = []
    for epoch in range(6):
        for b in sparse_batches(ds, B):
            plan = fm_kernel.plan_batch(
                np.asarray(b["ids"], np.int64), np.asarray(b["vals"]),
                np.asarray(b["mask"]), np.asarray(b["labels"]),
                row_mask=np.asarray(b["row_mask"]), n_rows_pad=capacity,
            )
            arrays = fm_kernel.plan_to_arrays(plan, capacity)
            if step is None:
                step = fm_kernel.make_streaming_train_step(
                    cfg, capacity, plan.b_pad
                )
            state, loss = step(state, arrays)
            losses.append(float(loss))
    assert losses[-1] < 0.4 * losses[0]

    # scoring with the master table via the dense FM formulation
    params = {
        "w0": state.w0,
        "w": state.table[:, 0],
        "v": state.table[:, 1 : 1 + cfg.factor],
    }
    fcfg = fm.FMConfig(n_features=ds.n_features, factor=4)
    batch = next(iter(sparse_batches(ds, 512)))
    logits = fm.forward(params, batch, fcfg)
    acc = float(jnp.mean(
        ((logits > 0) == (jnp.asarray(batch["labels"]) > 0.5)).astype(jnp.float32)
    ))
    assert acc > 0.85


def test_device_plan_matches_host_plan(sparse_small):
    """plan_batch_on_device (jit, VERDICT r1 #4) must reproduce the host
    planner's arrays exactly — same stable sort keys, same rank labels."""
    ds = sparse_small
    capacity = 4 * TILE
    b = next(iter(sparse_batches(ds, 128)))
    host_plan = fm_kernel.plan_batch(
        np.asarray(b["ids"], np.int64), np.asarray(b["vals"]),
        np.asarray(b["mask"]), np.asarray(b["labels"]),
        row_mask=np.asarray(b["row_mask"]), n_rows_pad=capacity,
    )
    host = fm_kernel.plan_to_arrays(host_plan, capacity)
    dev = fm_kernel.plan_batch_on_device(
        jnp.asarray(b["ids"], jnp.int32), jnp.asarray(b["vals"]),
        jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
        jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=host_plan.b_pad,
    )
    assert int(dev["n_unique"]) == int(host["n_unique"])
    nu = int(dev["n_unique"])
    np.testing.assert_array_equal(
        np.asarray(dev["uids"])[:nu], np.asarray(host["uids"])[:nu])
    for key in ("ranks_sorted", "rowid_sorted", "tile_base",
                "labels_padded", "row_mask_padded"):
        np.testing.assert_array_equal(
            np.asarray(dev[key]), np.asarray(host[key]), err_msg=key)
    np.testing.assert_allclose(
        np.asarray(dev["xv_sorted"]), np.asarray(host["xv_sorted"]))

    # and the streaming step produces the identical loss from either plan
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=4, interpret=True, exact=True
    )
    # the step donates its input state: use two identically-seeded states
    step = fm_kernel.make_streaming_train_step(cfg, capacity, host_plan.b_pad)
    _, loss_h = step(fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), host)
    _, loss_d = step(fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg), dev)
    np.testing.assert_allclose(float(loss_h), float(loss_d), rtol=1e-6)


def test_kernel_engine_fm_streaming_end_to_end(sparse_small):
    """train/kernel_engine: raw dataset in, dense-format params out, with
    device-side plans on the prefetch thread (the CLI --engine kernel path)."""
    from lightctr_tpu.train.kernel_engine import train_fm_kernel

    params, losses = train_fm_kernel(
        sparse_small, factor=4, learning_rate=0.25, epochs=6,
        batch_size=128, seed=0, exact=True, log=None,
    )
    assert losses[-1] < 0.5 * losses[0]
    fcfg = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    batch = next(iter(sparse_batches(sparse_small, 512)))
    logits = fm.forward(params, batch, fcfg)
    acc = float(jnp.mean(
        ((logits > 0) == (jnp.asarray(batch["labels"]) > 0.5)).astype(jnp.float32)
    ))
    assert acc > 0.85


def test_kernel_engine_nfm_streaming(sparse_small):
    from lightctr_tpu.models import nfm
    from lightctr_tpu.train.kernel_engine import train_nfm_kernel

    params, losses = train_nfm_kernel(
        sparse_small, factor=4, hidden=(16,), learning_rate=0.25,
        epochs=6, batch_size=128, seed=0, exact=True, log=None,
    )
    assert losses[-1] < 0.6 * losses[0]
    ncfg = nfm.NFMConfig(n_features=sparse_small.n_features, factor=4,
                         hidden=(16,))
    batch = next(iter(sparse_batches(sparse_small, 512)))
    logits = nfm.forward(params, batch, ncfg)
    acc = float(jnp.mean(
        ((logits > 0) == (jnp.asarray(batch["labels"]) > 0.5)).astype(jnp.float32)
    ))
    assert acc > 0.8


def test_streaming_first_loss_matches_dense(sparse_small):
    """With identical init, the streaming kernel step's first-batch loss
    equals the dense jnp loss on that batch."""
    ds = sparse_small
    capacity = 4 * TILE
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=4, interpret=True, exact=True
    )
    state = fm_kernel.streaming_init(jax.random.PRNGKey(3), cfg)
    b = next(iter(sparse_batches(ds, 128)))
    plan = fm_kernel.plan_batch(
        np.asarray(b["ids"], np.int64), np.asarray(b["vals"]),
        np.asarray(b["mask"]), np.asarray(b["labels"]),
        row_mask=np.asarray(b["row_mask"]), n_rows_pad=capacity,
    )
    arrays = fm_kernel.plan_to_arrays(plan, capacity)
    step = fm_kernel.make_streaming_train_step(cfg, capacity, plan.b_pad)
    # snapshot init params first — the step donates (deletes) its input
    params = {
        "w0": jnp.array(state.w0),
        "w": jnp.array(state.table[:, 0]),
        "v": jnp.array(state.table[:, 1 : 1 + cfg.factor]),
    }
    _, loss = step(state, arrays)
    fcfg = fm.FMConfig(n_features=ds.n_features, factor=4)
    expect = float(fm.loss(params, b, fcfg))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)


def test_packed_streaming_matches_unpacked(sparse_small):
    """The packed [V, 32] layout (one gather + one scatter-set per step)
    must reproduce the unpacked streaming trajectory exactly — same math,
    different master-table memory layout."""
    ds = sparse_small
    B, capacity, b_pad = 128, 4 * TILE, 128
    cfg = fm_kernel.KernelFMConfig(
        n_features=1024, factor=4, learning_rate=0.25, l2=1e-4,
        interpret=True, exact=True,
    )
    # independent identically-seeded states: both steps donate, and
    # pack_streaming_state shares the w0 buffers with its argument
    state_u = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    state_p = fm_kernel.pack_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    )
    step_u = fm_kernel.make_streaming_train_step(cfg, capacity, b_pad)
    step_p = fm_kernel.make_streaming_train_step_packed(cfg, capacity, b_pad)

    losses_u, losses_p = [], []
    for epoch in range(4):
        for b in sparse_batches(ds, B):
            arrays = fm_kernel.plan_batch_on_device(
                jnp.asarray(b["ids"], jnp.int32), jnp.asarray(b["vals"]),
                jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
                jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=b_pad,
            )
            state_u, lu = step_u(state_u, arrays)
            state_p, lp = step_p(state_p, arrays)
            losses_u.append(float(lu))
            losses_p.append(float(lp))

    np.testing.assert_allclose(losses_p, losses_u, rtol=1e-6)
    assert losses_p[-1] < 0.5 * losses_p[0]
    back = fm_kernel.unpack_streaming_state(state_p)
    np.testing.assert_allclose(np.asarray(back.table),
                               np.asarray(state_u.table), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(back.accum),
                               np.asarray(state_u.accum), rtol=1e-6, atol=1e-8)


def test_fused_streaming_matches_plan_plus_step(sparse_small):
    """make_streaming_train_step_fused (plan traced INTO the packed step:
    one dispatch per raw [B, L] batch) must reproduce the separate
    plan_batch_on_device + packed-step trajectory exactly."""
    ds = sparse_small
    B, capacity, b_pad = 128, 4 * TILE, 128
    cfg = fm_kernel.KernelFMConfig(
        n_features=1024, factor=4, learning_rate=0.25, l2=1e-4,
        interpret=True, exact=True,
    )
    state_p = fm_kernel.pack_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    )
    state_f = fm_kernel.pack_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    )
    step_p = fm_kernel.make_streaming_train_step_packed(cfg, capacity, b_pad)
    step_f = fm_kernel.make_streaming_train_step_fused(cfg, capacity, b_pad)

    losses_p, losses_f = [], []
    for epoch in range(3):
        for b in sparse_batches(ds, B):
            ids = jnp.asarray(b["ids"], jnp.int32)
            vals = jnp.asarray(b["vals"])
            mask = jnp.asarray(b["mask"])
            labels = jnp.asarray(b["labels"])
            rmask = jnp.asarray(b["row_mask"])
            arrays = fm_kernel.plan_batch_on_device(
                ids, vals, mask, labels, rmask,
                capacity=capacity, b_pad=b_pad,
            )
            state_p, lp = step_p(state_p, arrays)
            state_f, lf = step_f(state_f, ids, vals, mask, labels, rmask)
            losses_p.append(float(lp))
            losses_f.append(float(lf))

    np.testing.assert_allclose(losses_f, losses_p, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state_f.packed),
                               np.asarray(state_p.packed),
                               rtol=1e-6, atol=1e-8)


def test_epoch_scan_matches_sequential_fused_steps(sparse_small):
    """make_streaming_epoch_scan (K independently-planned batches folded
    into ONE lax.scan dispatch — VERDICT r4 #4's K-batch pipelining, NOT
    the rejected union super-batch) must reproduce K sequential fused
    steps bit-for-bit: each sub-step plans/pulls/pushes its own batch, so
    per-step optimizer and exchange work stay batch-sized."""
    ds = sparse_small
    B, capacity, b_pad = 128, 4 * TILE, 128
    cfg = fm_kernel.KernelFMConfig(
        n_features=1024, factor=4, learning_rate=0.25, l2=1e-4,
        interpret=True, exact=True,
    )
    step_f = fm_kernel.make_streaming_train_step_fused(cfg, capacity, b_pad)
    scan_run = fm_kernel.make_streaming_epoch_scan(step_f)

    batches = list(sparse_batches(ds, B))[:4]
    stacked = tuple(
        jnp.stack([jnp.asarray(b[k], jnp.int32 if k == "ids" else None)
                   for b in batches])
        for k in ("ids", "vals", "mask", "labels", "row_mask")
    )

    state_seq = fm_kernel.pack_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg))
    losses_seq = []
    for b in batches:
        state_seq, l = step_f(
            state_seq, jnp.asarray(b["ids"], jnp.int32),
            jnp.asarray(b["vals"]), jnp.asarray(b["mask"]),
            jnp.asarray(b["labels"]), jnp.asarray(b["row_mask"]))
        losses_seq.append(float(l))

    state_scan = fm_kernel.pack_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg))
    state_scan, losses_scan = scan_run(state_scan, *stacked)

    np.testing.assert_array_equal(np.asarray(losses_scan),
                                  np.asarray(losses_seq, np.float32))
    np.testing.assert_array_equal(np.asarray(state_scan.packed),
                                  np.asarray(state_seq.packed))

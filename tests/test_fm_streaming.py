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
    _, loss = step(state, arrays)

    params = {
        "w0": state.w0,
        "w": state.table[:, 0],
        "v": state.table[:, 1 : 1 + cfg.factor],
    }
    fcfg = fm.FMConfig(n_features=ds.n_features, factor=4)
    expect = float(fm.loss(params, b, fcfg))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)

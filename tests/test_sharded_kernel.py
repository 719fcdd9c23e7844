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
    make_sharded_streaming_step,
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

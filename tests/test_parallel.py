"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightctr_tpu import optim
from lightctr_tpu.data import sparse_batches
from lightctr_tpu.models import widedeep, fm
from lightctr_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    partition_batch,
    psum_compressed,
)
from lightctr_tpu.parallel.sharding import init_sharded_state, param_specs
from lightctr_tpu.parallel.collectives import make_compressed_dp_grad_fn
from jax.sharding import PartitionSpec as P


def test_mesh_has_8_devices():
    mesh = make_mesh(data=4, model=2)
    assert mesh.devices.shape == (4, 2)


def test_param_specs_shards_big_tables():
    params = {
        "w": jnp.zeros((100_000,)),
        "embed": jnp.zeros((100_000, 4)),
        "mlp": [{"w": jnp.zeros((64, 1)), "b": jnp.zeros((1,))}],
    }
    specs = param_specs(params)
    assert specs["w"] == P("model")
    assert specs["embed"] == P("model", None)
    assert specs["mlp"][0]["w"] == P()


def test_sharded_widedeep_step_runs_and_matches_single(sparse_small):
    """The full sharded train step must produce the same loss trajectory as
    the unsharded one (sync DP == single-worker math, unlike the
    reference's async PS mode)."""
    cfg = widedeep.WideDeepConfig(
        n_features=sparse_small.n_features,
        n_fields=sparse_small.n_fields,
        embed_dim=4,
        hidden=(16,),
    )
    tx = optim.adagrad(0.1)
    batches = list(sparse_batches(sparse_small, batch_size=64))[:4]

    # single-device reference
    from lightctr_tpu.train.loop import make_train_step, TrainState

    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    params = widedeep.init(init_rng, cfg)
    state1 = TrainState(params, tx.init(params), rng)
    step1 = make_train_step(widedeep, cfg, tx)
    losses1 = []
    for b in batches:
        state1, l = step1(state1, b)
        losses1.append(float(l))

    # sharded: 4-way data x 2-way model
    mesh = make_mesh(data=4, model=2)
    state2 = init_sharded_state(widedeep, cfg, tx, mesh, seed=0, shard_threshold=64)
    step2 = make_sharded_train_step(widedeep, cfg, tx, mesh, shard_threshold=64)
    losses2 = []
    for b in batches:
        state2, l = step2(state2, partition_batch(b, mesh))
        losses2.append(float(l))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-4)


def test_psum_compressed_bf16_and_int8():
    mesh = make_mesh(data=8, model=1)

    def run(wire):
        def f(x):
            return psum_compressed(x, "data", wire)

        x = jnp.arange(8.0).reshape(8, 1) + 1.0  # shard i holds value i+1
        return jax.jit(
            jax.shard_map(
                f, mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False
            )
        )(x)

    exact = float(sum(range(1, 9)))

    def scalar(x):
        return float(np.asarray(x).ravel()[0])

    assert scalar(run(None)) == exact
    assert abs(scalar(run(jnp.bfloat16)) - exact) < 0.5
    assert abs(scalar(run(jnp.int8)) - exact) / exact < 0.02


def test_compressed_dp_grad_matches_plain(sparse_small):
    cfg = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    params = fm.init(jax.random.PRNGKey(1), cfg)
    batch = next(iter(sparse_batches(sparse_small, batch_size=64)))

    def loss_fn(p, b):
        return fm.loss(p, b, cfg)

    plain_loss, plain_grads = jax.value_and_grad(loss_fn)(params, batch)

    mesh = make_mesh(data=8, model=1)
    fn = make_compressed_dp_grad_fn(loss_fn, mesh, wire_dtype=jnp.bfloat16)
    loss2, grads2 = jax.jit(fn)(params, batch)
    # per-shard mean-of-means == global mean only when shards are equal
    # size and the loss is a masked mean; our row_mask weighting makes the
    # means differ slightly across shards, so compare loosely.
    assert abs(float(loss2) - float(plain_loss)) < 0.05
    gp = np.asarray(plain_grads["v"])
    g2 = np.asarray(grads2["v"])
    denom = np.abs(gp).max() + 1e-9
    assert np.abs(gp - g2).max() / denom < 0.05

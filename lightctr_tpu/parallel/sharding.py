"""Parameter/batch sharding — the GSPMD replacement of the reference's
distribution strategies (SURVEY.md §5.8 mapping):

  ParamServer sharded KV (paramserver.h)   -> embedding tables row-sharded
      over the `model` mesh axis; the batch gather becomes an XLA
      all-gather/all-to-all inserted by GSPMD, and optimizer state shards
      co-locate with the table rows (the server-side-update equivalent).
  Ring-AllReduce (ring_collect.h)          -> batch sharded over `data`;
      grad psum is inserted by XLA over ICI.
  ConsistentHash DHT routing               -> contiguous row sharding;
      no explicit routing table is needed because XLA partitions the
      gather by row range.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import optim
from ..train.loop import TrainState


# Rows above this count get sharded over the `model` axis; small dense
# tower weights are replicated (they ride the psum path instead).
DEFAULT_SHARD_THRESHOLD = 8192


def round_up_vocab(n_features: int, multiple: int = 1024) -> int:
    """Pad a vocabulary so embedding tables divide evenly across any model
    axis (and tile nicely: 1024 = 8 sublanes x 128 lanes). Padded rows are
    never indexed — ids stay < the true vocab size."""
    return ((n_features + multiple - 1) // multiple) * multiple


def param_specs(params: Any, shard_threshold: int = DEFAULT_SHARD_THRESHOLD):
    """PartitionSpec pytree: big leading-dim leaves row-shard over `model`."""

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] >= shard_threshold:
            return P("model", *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map(spec, params)


def partition_params(params: Any, mesh: Mesh, shard_threshold: int = DEFAULT_SHARD_THRESHOLD):
    """Place a params pytree onto the mesh with row-sharded tables."""
    specs = param_specs(params, shard_threshold)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_specs(batch: dict):
    """Batches shard their leading (batch) dim over `data`."""
    return {k: P("data", *([None] * (v.ndim - 1))) for k, v in batch.items()}


def partition_batch(batch: dict, mesh: Mesh):
    n_data = mesh.shape["data"]
    for k, v in batch.items():
        if jnp.shape(v)[0] % n_data:
            raise ValueError(
                f"batch dim {jnp.shape(v)[0]} of '{k}' not divisible by the "
                f"data axis ({n_data}); pick a batch size that is a multiple "
                f"of the mesh's data dimension"
            )
    return {
        k: jax.device_put(v, NamedSharding(mesh, P("data", *([None] * (jnp.ndim(v) - 1)))))
        for k, v in batch.items()
    }


# shard_dataset_batch is the host->device entry point used by train loops.
shard_dataset_batch = partition_batch


def make_sharded_train_step(
    model, cfg, tx, mesh: Mesh, shard_threshold: int = DEFAULT_SHARD_THRESHOLD
) -> Callable:
    """Jitted SPMD train step with explicit output shardings.

    Params/opt-state keep their table sharding across steps — pinned via
    jit out_shardings (NOT inherited from the inputs), so one XLA layout
    decision cannot silently replicate a vocab-sized table mid-step. XLA
    inserts the all-to-all for the embedding gather and the psum for the
    data-parallel gradient reduction.
    """
    rng0 = jax.random.PRNGKey(0)
    abstract_params = jax.eval_shape(lambda r: model.init(r, cfg), rng0)
    p_specs = param_specs(abstract_params, shard_threshold)
    o_specs = param_specs(jax.eval_shape(tx.init, abstract_params),
                          shard_threshold)
    as_sh = lambda s: NamedSharding(mesh, s)
    state_shardings = TrainState(
        jax.tree_util.tree_map(as_sh, p_specs),
        jax.tree_util.tree_map(as_sh, o_specs),
        as_sh(P()),
    )

    def step(state: TrainState, batch: dict):
        rng, sub = jax.random.split(state.rng)
        loss_val, grads = jax.value_and_grad(model.loss)(state.params, batch, cfg, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optim.apply_updates(state.params, updates)
        return TrainState(params, opt_state, rng), loss_val

    return jax.jit(step, donate_argnums=(0,),
                   out_shardings=(state_shardings, as_sh(P())))


def init_sharded_state(model, cfg, tx, mesh: Mesh, seed: int = 0,
                       shard_threshold: int = DEFAULT_SHARD_THRESHOLD) -> TrainState:
    """Initialise params directly on the mesh (jit with out_shardings so big
    tables never materialise replicated on one host)."""
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)

    abstract = jax.eval_shape(lambda r: model.init(r, cfg), init_rng)
    specs = param_specs(abstract, shard_threshold)
    out_shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)

    params = jax.jit(
        lambda r: model.init(r, cfg), out_shardings=out_shardings
    )(init_rng)

    opt_abstract = jax.eval_shape(tx.init, params)
    opt_specs = param_specs(opt_abstract, shard_threshold)
    opt_shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), opt_specs)
    opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
    return TrainState(params, opt_state, rng)

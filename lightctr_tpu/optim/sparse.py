"""Sparse (rows-only) optimizer updates for embedding tables.

The TPU replacement of the reference ParamServer's server-side sparse
updates (paramserver.h:252-300: the PS applies SGD/Adagrad only to pushed
keys). A dense optimizer touches every table row each step —
O(vocab * K) HBM traffic; at production vocab (10^8 rows) that is GBs per
step. These updaters touch only the unique rows present in the batch:
gather state rows, update, scatter back. State lives sharded with the
table (parallel/sharding.py co-locates it, replacing DHT shard locality).

Contract (differs from dense GradientTransformations):
    state = init(table)
    table, state = update(table, state, uids, grad_rows, n_unique)
where grad_rows[i] is the summed gradient for table[uids[i]]; rows at or
beyond n_unique are padding. Padding rows are redirected to an
out-of-bounds index and scattered with mode='drop', so they can never
race with a real row's update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _safe(uids: jax.Array, n_unique: jax.Array, n_rows: int):
    """(mask [U,1], redirected ids [U]) — padding ids become out-of-bounds
    and get dropped by scatter."""
    pos = jnp.arange(uids.shape[0])
    mask = (pos < n_unique).astype(jnp.float32)[:, None]
    safe_uids = jnp.where(pos < n_unique, uids, n_rows)
    return mask, safe_uids


class SparseAdagradState(NamedTuple):
    accum: jax.Array


def sparse_adagrad(learning_rate: float, eps: float = 1e-7):
    def init(table):
        return SparseAdagradState(accum=jnp.zeros_like(table))

    def update(table, state, uids, grad_rows, n_unique):
        m, su = _safe(uids, n_unique, table.shape[0])
        g = grad_rows * m
        acc_rows = state.accum[uids] + g * g
        step = learning_rate * g / (jnp.sqrt(acc_rows) + eps)
        accum = state.accum.at[su].set(acc_rows, mode="drop")
        table = table.at[su].add(-step, mode="drop")
        return table, SparseAdagradState(accum=accum)

    return init, update


class SparseAdamState(NamedTuple):
    count: jax.Array
    mu: jax.Array
    nu: jax.Array


def sparse_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Row-sparse 'lazy' Adam: moments decay only for touched rows — the
    standard large-embedding-table practice."""

    def init(table):
        return SparseAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(table),
            nu=jnp.zeros_like(table),
        )

    def update(table, state, uids, grad_rows, n_unique):
        m, su = _safe(uids, n_unique, table.shape[0])
        g = grad_rows * m
        count = state.count + 1
        mu_rows = b1 * state.mu[uids] + (1 - b1) * g
        nu_rows = b2 * state.nu[uids] + (1 - b2) * g * g
        c1 = 1.0 - jnp.power(jnp.float32(b1), count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(jnp.float32(b2), count.astype(jnp.float32))
        step = learning_rate * (mu_rows / c1) / (jnp.sqrt(nu_rows / c2) + eps)
        mu = state.mu.at[su].set(mu_rows, mode="drop")
        nu = state.nu.at[su].set(nu_rows, mode="drop")
        table = table.at[su].add(-step, mode="drop")
        return table, SparseAdamState(count=count, mu=mu, nu=nu)

    return init, update


class SparseSGDState(NamedTuple):
    pass


def sparse_sgd(learning_rate: float):
    def init(table):
        return SparseSGDState()

    def update(table, state, uids, grad_rows, n_unique):
        m, su = _safe(uids, n_unique, table.shape[0])
        table = table.at[su].add(-learning_rate * grad_rows * m, mode="drop")
        return table, SparseSGDState()

    return init, update


SPARSE_OPTIMIZERS = {
    "sgd": sparse_sgd,
    "adagrad": sparse_adagrad,
    "adam": sparse_adam,
}

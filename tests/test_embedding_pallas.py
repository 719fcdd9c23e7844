"""Blocked one-hot gather/scatter kernels vs XLA reference (interpret mode
on CPU; the same code compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightctr_tpu.ops.embedding_pallas import (
    TILE,
    blocked_gather,
    blocked_scatter_add,
    plan_sorted_layout,
    sorted_lookup,
)


@pytest.fixture(scope="module")
def layout():
    rng = np.random.default_rng(0)
    B, L = 8, 128            # n = 1024 positions = 2 tiles
    V = 5000
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    # skew: make some ids very hot (like CTR data)
    ids[:, :32] = rng.integers(0, 8, (B, 32))
    valid = rng.random((B, L)) > 0.1
    plan = plan_sorted_layout(ids, valid)
    return ids, valid, plan


def test_plan_roundtrip(layout):
    ids, valid, plan = layout
    flat = ids.reshape(-1)
    v = valid.reshape(-1)
    # uids[ranks] recovers ids for valid sorted positions
    sorted_pos_ids = plan["uids"][plan["ranks_sorted"]]
    orig = flat[plan["perm"]]
    real = plan["ranks_sorted"] != plan["pad_rank"]
    np.testing.assert_array_equal(sorted_pos_ids[real], orig[real])
    # ranks ascending
    assert np.all(np.diff(plan["ranks_sorted"]) >= 0)


def test_blocked_gather_matches_xla(layout):
    ids, valid, plan = layout
    R = plan["n_rows_pad"]
    D = 16
    rng = np.random.default_rng(1)
    rows = rng.normal(size=(R, D)).astype(np.float32)
    rows[plan["pad_rank"]] = 0.0
    got = np.asarray(
        blocked_gather(
            jnp.asarray(rows),
            jnp.asarray(plan["ranks_sorted"]),
            jnp.asarray(plan["tile_base"]),
            interpret=True,
        )
    )
    real = plan["ranks_sorted"] != plan["pad_rank"]
    expect = rows[plan["ranks_sorted"]]
    # bf16 rows: compare at bf16 tolerance; padding positions may be 0
    np.testing.assert_allclose(got[real], expect[real], rtol=2e-2, atol=2e-2)
    assert np.all(np.abs(got[~real]) < 1e-6)


def test_blocked_scatter_matches_segment_sum(layout):
    ids, valid, plan = layout
    R = plan["n_rows_pad"]
    D = 16
    n = plan["ranks_sorted"].size
    rng = np.random.default_rng(2)
    g = rng.normal(size=(n, D)).astype(np.float32)
    got = np.asarray(
        blocked_scatter_add(
            jnp.asarray(g),
            jnp.asarray(plan["ranks_sorted"]),
            jnp.asarray(plan["tile_base"]),
            n_rows=R,
            interpret=True,
        )
    )
    expect = np.zeros((R, D), np.float32)
    np.add.at(expect, plan["ranks_sorted"], g.astype(np.float32))
    # hot rows sum hundreds of bf16 values: loose tolerance scaled by count
    counts = np.bincount(plan["ranks_sorted"], minlength=R).astype(np.float32)
    tol = 2e-2 * np.maximum(counts, 1.0)[:, None] * (np.abs(expect) + 1.0)
    assert np.all(np.abs(got - expect) <= tol)


def test_sorted_lookup_custom_vjp(layout):
    ids, valid, plan = layout
    R = plan["n_rows_pad"]
    D = 16
    rng = np.random.default_rng(3)
    rows = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ranks = jnp.asarray(plan["ranks_sorted"])
    tb = jnp.asarray(plan["tile_base"])
    coef = jnp.asarray(rng.normal(size=(ranks.size, D)).astype(np.float32))

    def f(rows):
        out = sorted_lookup(rows, ranks, tb, R, True)
        return jnp.sum(out * coef)

    g = np.asarray(jax.grad(f)(rows))
    # reference grad: scatter-add of coef
    expect = np.zeros((R, D), np.float32)
    np.add.at(expect, plan["ranks_sorted"], np.asarray(coef))
    counts = np.bincount(plan["ranks_sorted"], minlength=R).astype(np.float32)
    tol = 3e-2 * np.maximum(counts, 1.0)[:, None] * (np.abs(expect) + 1.0)
    assert np.all(np.abs(g - expect) <= tol)

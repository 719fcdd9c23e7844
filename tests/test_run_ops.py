"""Run-structured gather/scatter (ops/run_ops.py) vs brute force, and the
runops FM step vs the all-Pallas step."""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.ops.embedding_pallas import plan_sorted_layout
from lightctr_tpu.ops.run_ops import plan_runs, run_broadcast, run_scatter_add
from lightctr_tpu.models import fm_kernel


def _layout(seed=0, B=8, L=128, V=600):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :24] = rng.integers(0, 6, (B, 24))  # hot head
    valid = rng.random((B, L)) > 0.15
    plan = plan_sorted_layout(ids, valid)
    return plan


def test_run_broadcast_matches_gather():
    plan = _layout()
    R = plan["n_rows_pad"]
    n = plan["ranks_sorted"].size
    start_pos, last_pos = plan_runs(plan["ranks_sorted"], R)
    rng = np.random.default_rng(1)
    rows = rng.normal(size=(R, 16)).astype(np.float32)
    got = np.asarray(
        run_broadcast(jnp.asarray(rows), jnp.asarray(start_pos),
                      jnp.zeros((n, 16)))
    )
    expect = rows[plan["ranks_sorted"]]
    real = plan["ranks_sorted"] < plan["n_unique"]
    np.testing.assert_allclose(got[real], expect[real], rtol=1e-4, atol=1e-5)


def test_run_scatter_matches_segment_sum():
    plan = _layout(seed=2)
    R = plan["n_rows_pad"]
    n = plan["ranks_sorted"].size
    _, last_pos = plan_runs(plan["ranks_sorted"], R)
    rng = np.random.default_rng(3)
    g = (rng.normal(size=(n, 16)) * 1e-3).astype(np.float32)
    # pad positions carry zero grads (as in training, masked by xv)
    pad = plan["ranks_sorted"] == plan["pad_rank"]
    g[pad] = 0.0
    got = np.asarray(run_scatter_add(jnp.asarray(g), jnp.asarray(last_pos)))
    expect = np.zeros((R, 16), np.float32)
    np.add.at(expect, plan["ranks_sorted"], g)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-7)


def test_runops_fm_matches_pallas_fm():
    rng = np.random.default_rng(0)
    B, L, V = 8, 128, 300
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels)

    losses = {}
    for runops in (False, True):
        cfg = fm_kernel.KernelFMConfig(
            n_features=V, factor=4, learning_rate=0.05,
            interpret=True, exact=True, runops=runops,
        )
        st = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = fm_kernel.make_train_step(cfg, plan)
        ls = []
        for _ in range(5):
            st, l = step(st)
            ls.append(float(l))
        losses[runops] = ls
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-4)

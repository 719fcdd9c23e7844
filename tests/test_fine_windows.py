"""Fine-granularity (WTILE=128) window kernels vs their TILE-granular
baselines (interpret mode on CPU; the same code compiles for TPU).

The fine variants advance the rank window in 128-row blocks (e.g. a
512-position tile reads a 5x128=640-row window instead of 2x512=1024),
cutting one-hot compares/MACs ~37%. The scatter generalises the even/odd
parity outputs to mod-n_win residue buffers. These tests pin exact (fp32)
equality against rows[ranks] / np.add.at and against the coarse fm_forward.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lightctr_tpu.ops import fm_fused_pallas as K
from lightctr_tpu.ops.embedding_pallas import (
    WTILE,
    _fine_tile_base,
    blocked_gather_fine,
    blocked_scatter_add_fine,
    plan_sorted_layout,
)
from lightctr_tpu.models import fm_kernel


def _layout(n_rows_pad, seed=0, B=8, L=128, V=5000):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :32] = rng.integers(0, 8, (B, 32))     # hot head, CTR-like
    valid = rng.random((B, L)) > 0.1
    return ids, valid, plan_sorted_layout(ids, valid, n_rows_pad=n_rows_pad)


@pytest.mark.parametrize("n_win,tile,n_rows_pad", [(5, 512, 5120),
                                                   (3, 256, 9216)])
def test_fine_gather_matches_ranks(n_win, tile, n_rows_pad):
    ids, valid, plan = _layout(n_rows_pad)
    R = plan["n_rows_pad"]
    D = 16
    rng = np.random.default_rng(1)
    rows = rng.normal(size=(R, D)).astype(np.float32)
    rows[plan["pad_rank"]] = 0.0
    ranks = jnp.asarray(plan["ranks_sorted"])
    tbf = _fine_tile_base(ranks, R, n_win, tile)
    got = np.asarray(
        blocked_gather_fine(jnp.asarray(rows), ranks, tbf, n_win=n_win,
                            tile=tile, interpret=True, exact=True))
    real = plan["ranks_sorted"] != plan["pad_rank"]
    expect = rows[plan["ranks_sorted"]]
    np.testing.assert_allclose(got[real], expect[real], rtol=1e-6)
    # pad positions read the zeroed pad row (or fall outside the window)
    assert np.all(np.abs(got[~real]) < 1e-6)


@pytest.mark.parametrize("n_win,tile,n_rows_pad", [(5, 512, 5120),
                                                   (3, 256, 9216)])
def test_fine_scatter_matches_segment_sum(n_win, tile, n_rows_pad):
    ids, valid, plan = _layout(n_rows_pad, seed=2)
    R = plan["n_rows_pad"]
    D = 16
    n = plan["ranks_sorted"].size
    rng = np.random.default_rng(3)
    g = rng.normal(size=(n, D)).astype(np.float32)
    ranks = jnp.asarray(plan["ranks_sorted"])
    tbf = _fine_tile_base(ranks, R, n_win, tile)
    got = np.array(
        blocked_scatter_add_fine(jnp.asarray(g), ranks, tbf, n_rows=R,
                                 n_win=n_win, tile=tile, interpret=True,
                                 exact=True))
    expect = np.zeros((R, D), np.float32)
    np.add.at(expect, plan["ranks_sorted"], g)
    # the pad row may legitimately drop contributions from transition
    # tiles whose window no longer covers it — callers zero it anyway
    pad = plan["pad_rank"]
    expect[pad] = got[pad] = 0.0
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_fine_forward_matches_coarse():
    """fm_forward_fine (5x128 window) == fm_forward (2x512 window) in
    fp32-exact mode: identical rowsum and per-position embeddings."""
    rng = np.random.default_rng(4)
    B, L, V, KF = 8, 128, 300, 4
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :16] = rng.integers(0, 8, (B, 16))
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels, n_rows_pad=5120,
                                trim=True)
    R = plan.n_rows_pad
    rows = rng.normal(size=(R, K.D)).astype(np.float32) * 0.1
    rows[R - 1] = 0.0
    rows = jnp.asarray(rows)

    rowsum_c, epos_c = K.fm_forward(
        rows, plan.ranks_sorted, plan.rowid_sorted, plan.xv_sorted,
        plan.tile_base, n_k=KF, b_pad=plan.b_pad, interpret=True,
        exact=True)
    tbf = _fine_tile_base(plan.ranks_sorted, R, 5, 512)
    rowsum_f, epos_f = K.fm_forward_fine(
        rows, plan.ranks_sorted, plan.rowid_sorted, plan.xv_sorted,
        tbf, n_k=KF, b_pad=plan.b_pad, n_win=5, tile=512, interpret=True,
        exact=True)
    np.testing.assert_allclose(np.asarray(rowsum_f), np.asarray(rowsum_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(epos_f), np.asarray(epos_c),
                               rtol=1e-6, atol=1e-6)


def test_fine_tile_base_window_covers_tile_ranks():
    """Every tile's ranks fall inside its n_win*WTILE window (the
    invariant the one-hot compare relies on): dense sorted ranks rise by
    at most tile-1 within a tile, and the base is 128-aligned below the
    first rank."""
    ids, valid, plan = _layout(5120, seed=5)
    ranks = plan["ranks_sorted"]
    R = plan["n_rows_pad"]
    for n_win, tile in ((5, 512), (3, 256)):
        if (len(ranks) % tile) or (R % (n_win * WTILE)):
            continue
        tbf = np.asarray(_fine_tile_base(jnp.asarray(ranks), R, n_win, tile))
        for t in range(len(ranks) // tile):
            chunk = ranks[t * tile:(t + 1) * tile]
            real = chunk != plan["pad_rank"]
            if real.any():
                lo = tbf[t] * WTILE
                assert chunk[real].min() >= lo
                assert chunk[real].max() < lo + n_win * WTILE


def test_kernel_fm_fine_matches_staged():
    """cfg.fine=True (5x128 windows via plan_batch(fine=True)) must
    reproduce the staged coarse path exactly in fp32-exact mode."""
    rng = np.random.default_rng(7)
    B, L, V, KF = 8, 128, 300, 4
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :16] = rng.integers(0, 8, (B, 16))
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)

    import jax
    cfg_s = fm_kernel.KernelFMConfig(
        n_features=V, factor=KF, learning_rate=0.05, l2=1e-3,
        interpret=True, exact=True)
    cfg_f = dataclasses_replace(cfg_s, fine=True)
    plan_s = fm_kernel.plan_batch(ids, vals, mask, labels)
    plan_f = fm_kernel.plan_batch(ids, vals, mask, labels, fine=True)
    assert plan_f.n_rows_pad % 640 == 0
    st_s = fm_kernel.init(jax.random.PRNGKey(0), cfg_s, plan_s)
    st_f = fm_kernel.init(jax.random.PRNGKey(0), cfg_f, plan_f)
    # rank spaces may differ in padding size; align the common prefix
    R = min(plan_s.n_rows_pad, plan_f.n_rows_pad)
    rows = np.array(st_s.rows)
    rows_f = np.array(st_f.rows)
    rows_f[:R - 1] = rows[:R - 1]
    rows_f[plan_f.n_rows_pad - 1] = 0.0
    st_f = st_f._replace(rows=jnp.asarray(rows_f))
    step_s = fm_kernel.make_train_step(cfg_s, plan_s)
    step_f = fm_kernel.make_train_step(cfg_f, plan_f)
    for i in range(5):
        st_s, ls = step_s(st_s)
        st_f, lf = step_f(st_f)
        np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6,
                                   err_msg=f"step {i}")
    n_u = plan_s.n_unique
    np.testing.assert_allclose(np.asarray(st_f.rows)[:n_u],
                               np.asarray(st_s.rows)[:n_u],
                               rtol=1e-5, atol=1e-7)


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_merged_backward_scatter_matches_pair():
    """fm_backward_scatter_fine == fm_backward_positions +
    blocked_scatter_add_fine (fp32-exact, interpret mode)."""
    rng = np.random.default_rng(9)
    B, L, V, KF = 8, 128, 300, 4
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    ids[:, :16] = rng.integers(0, 8, (B, 16))
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    vals = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels, fine=True)
    R = plan.n_rows_pad
    n = plan.ranks_sorted.shape[0]
    e_pos = jnp.asarray(rng.normal(size=(n, K.D)).astype(np.float32))
    duals = jnp.asarray(
        rng.normal(size=(plan.b_pad, K.S)).astype(np.float32))

    dwv = K.fm_backward_positions(
        plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
        n_k=KF, b_pad=plan.b_pad, interpret=True, exact=True)
    want = blocked_scatter_add_fine(
        dwv, plan.ranks_sorted, plan.tile_base_fine, n_rows=R, n_win=5,
        interpret=True, exact=True)
    got = K.fm_backward_scatter_fine(
        plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
        plan.ranks_sorted, plan.tile_base_fine, n_k=KF, b_pad=plan.b_pad,
        n_rows=R, n_win=5, interpret=True, exact=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

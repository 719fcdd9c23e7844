"""ops/row_exchange: Pallas master-table pull/push vs XLA gather/scatter.

The kernels must be numerics-IDENTICAL to the XLA primitives they
replace in the streaming steps (fm_kernel.make_streaming_train_step_*):
  pull:  rows = packed[uids]            (zero beyond n_unique)
  push:  packed.at[uids[:n]].set(rows[:n])
Interpret mode on the CPU backend; the TPU timings live in
benchmarks/bench_row_exchange.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lightctr_tpu.ops import row_exchange as rx


def _mk(v=5000, w=32, n_unique=700, capacity=1024, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    packed = rng.normal(size=(v, w)).astype(np.float32)
    if skew:
        # zipf-ish: most ids in the first few chunks
        ids = rng.zipf(1.3, size=n_unique * 4) % v
    else:
        ids = rng.choice(v, size=n_unique * 2, replace=False)
    uids = np.unique(ids)[:n_unique].astype(np.int32)
    n_unique = len(uids)
    uids_pad = np.zeros(capacity, np.int32)
    uids_pad[:n_unique] = np.sort(uids)
    rows = rng.normal(size=(capacity, w)).astype(np.float32)
    return packed, uids_pad, n_unique, rows


CHUNK, UMAX = 256, 64


@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("unroll", [1, 8])
def test_pull_sweep_matches_gather(skew, unroll):
    packed, uids, n, rows = _mk(skew=skew)
    cids, meta = rx.plan_row_exchange(
        jnp.asarray(uids), jnp.int32(n), n_features=packed.shape[0],
        capacity=1024, chunk=CHUNK, u_max=UMAX)
    out = rx.pull_rows_sweep(
        jnp.asarray(packed), cids, meta, capacity=1024, chunk=CHUNK,
        u_max=UMAX, unroll=unroll, interpret=True)
    np.testing.assert_array_equal(np.asarray(out)[:n], packed[uids[:n]])
    np.testing.assert_array_equal(np.asarray(out)[n:], 0.0)


@pytest.mark.parametrize("skew", [False, True])
def test_push_sweep_matches_scatter(skew):
    packed, uids, n, rows = _mk(skew=skew)
    cids, meta = rx.plan_row_exchange(
        jnp.asarray(uids), jnp.int32(n), n_features=packed.shape[0],
        capacity=1024, chunk=CHUNK, u_max=UMAX)
    out = rx.push_rows_sweep(
        jnp.asarray(packed.copy()), jnp.asarray(rows), cids, meta,
        n_features=packed.shape[0], chunk=CHUNK, u_max=UMAX,
        interpret=True)
    want = packed.copy()
    want[uids[:n]] = rows[:n]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_pull_dma_matches_gather():
    packed, uids, n, rows = _mk()
    out = rx.pull_rows_dma(
        jnp.asarray(packed), jnp.asarray(uids), jnp.int32(n),
        capacity=1024, group=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out)[:n], packed[uids[:n]])
    np.testing.assert_array_equal(np.asarray(out)[n:], 0.0)


def test_push_dma_matches_scatter():
    packed, uids, n, rows = _mk()
    out = rx.push_rows_dma(
        jnp.asarray(packed.copy()), jnp.asarray(rows), jnp.asarray(uids),
        jnp.int32(n), group=128, interpret=True)
    want = packed.copy()
    want[uids[:n]] = rows[:n]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_plan_row_exchange_invariants():
    """Slot ranges tile [0, n_unique) contiguously; chunk ids are
    non-decreasing; dense chunks split into <= u_max sub-slots; padding
    repeats the last real chunk with zero-length ranges."""
    v, cap = 4096, 512
    rng = np.random.default_rng(3)
    # force one dense chunk: 100 ids inside chunk 2, plus scattered rest
    dense = 2 * CHUNK + rng.choice(CHUNK, 100, replace=False)
    rest = rng.choice(v - 3 * CHUNK, 60, replace=False) + 3 * CHUNK
    uids = np.sort(np.concatenate([dense, rest])).astype(np.int32)
    n = len(uids)
    pad = np.zeros(cap, np.int32)
    pad[:n] = uids
    cids, meta = rx.plan_row_exchange(
        jnp.asarray(pad), jnp.int32(n), n_features=v, capacity=cap,
        chunk=CHUNK, u_max=UMAX)
    cids, meta = np.asarray(cids), np.asarray(meta)
    starts, cnts, locals_ = meta[:, 0], meta[:, 1], meta[:, 2:]

    assert (np.diff(cids) >= 0).all()
    assert (cnts <= UMAX).all()
    # ranges tile [0, n)
    covered = []
    for s, c in zip(starts, cnts):
        covered.extend(range(s, s + c))
    assert covered == list(range(n))
    # locals point at the right rows
    for t in range(len(cids)):
        for j in range(cnts[t]):
            assert cids[t] * CHUNK + locals_[t, j] == uids[starts[t] + j]
    # the dense chunk split into ceil(100/64)=2 slots on the same chunk
    assert (cids[:np.sum(cnts > 0)] == 2).sum() == 2

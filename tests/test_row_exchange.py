"""ops/row_exchange: Pallas master-table pull/push vs XLA gather/scatter.

The kernels must be numerics-IDENTICAL to the XLA primitives they
replace in the streaming steps (fm_kernel.make_streaming_train_step_*):
  pull:  rows = packed[uids]      (rows >= n_unique UNSPECIFIED)
  push:  packed.at[uids[:n]].set(rows[:n])
Interpret mode on the CPU backend; the TPU timings live in
benchmarks/bench_row_exchange.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lightctr_tpu.ops import row_exchange as rx


def _mk(v=5120, w=32, n_unique=700, capacity=1024, seed=0, skew=False):
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


CHUNK, BROWS = 256, 256


def _plan(uids, n, v, cap=1024):
    return rx.plan_row_exchange(
        jnp.asarray(uids), jnp.int32(n), n_features=v, capacity=cap,
        chunk=CHUNK, block_rows=BROWS)


@pytest.mark.parametrize("skew", [False, True])
def test_pull_matches_gather(skew):
    packed, uids, n, rows = _mk(skew=skew)
    cids, oblks, lstarts, codes = _plan(uids, n, packed.shape[0])
    out = rx.pull_rows(
        jnp.asarray(packed), cids, oblks, lstarts, codes, capacity=1024,
        chunk=CHUNK, block_rows=BROWS, interpret=True)
    # rows beyond n_unique are UNSPECIFIED — compare the live prefix
    np.testing.assert_array_equal(np.asarray(out)[:n], packed[uids[:n]])


@pytest.mark.parametrize("skew", [False, True])
def test_push_matches_scatter(skew):
    packed, uids, n, rows = _mk(skew=skew)
    cids, oblks, lstarts, codes = _plan(uids, n, packed.shape[0])
    out = rx.push_rows(
        jnp.asarray(packed.copy()), jnp.asarray(rows), cids, oblks,
        lstarts, codes, chunk=CHUNK, block_rows=BROWS, interpret=True)
    want = packed.copy()
    want[uids[:n]] = rows[:n]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_pull_fast_mode_close():
    """exact=False runs the selection as ONE bf16 MXU pass — values
    round to bf16 (~0.4%); the fast path for bandwidth-bound serving."""
    packed, uids, n, rows = _mk()
    cids, oblks, lstarts, codes = _plan(uids, n, packed.shape[0])
    out = rx.pull_rows(
        jnp.asarray(packed), cids, oblks, lstarts, codes, capacity=1024,
        chunk=CHUNK, block_rows=BROWS, exact=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:n], packed[uids[:n]],
                               rtol=1e-2, atol=1e-2)


def test_push_dense_chunk_multi_slot():
    """A chunk denser than one rank line forces several slots on the
    same chunk — the copy-through-once logic must not clobber earlier
    sub-slot writes."""
    v, cap = 4096, 512
    rng = np.random.default_rng(3)
    dense = 2 * CHUNK + rng.choice(CHUNK, 200, replace=False)
    rest = rng.choice(v - 3 * CHUNK, 60, replace=False) + 3 * CHUNK
    uids = np.sort(np.concatenate([dense, rest])).astype(np.int32)
    n = len(uids)
    pad = np.zeros(cap, np.int32)
    pad[:n] = uids
    packed = rng.normal(size=(v, 32)).astype(np.float32)
    rows = rng.normal(size=(cap, 32)).astype(np.float32)
    cids, oblks, lstarts, codes = _plan(pad, n, v, cap)
    out = rx.push_rows(
        jnp.asarray(packed.copy()), jnp.asarray(rows), cids, oblks,
        lstarts, codes, chunk=CHUNK, block_rows=BROWS, interpret=True)
    want = packed.copy()
    want[uids] = rows[:n]
    np.testing.assert_array_equal(np.asarray(out), want)
    got = rx.pull_rows(
        jnp.asarray(packed), cids, oblks, lstarts, codes, capacity=cap,
        chunk=CHUNK, block_rows=BROWS, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], packed[uids])


def test_plan_row_exchange_invariants():
    """Slots: non-decreasing chunk/oblk/lstart; every live rank coded in
    exactly one slot at its line offset; sentinel everywhere else."""
    v, cap = 4096, 512
    rng = np.random.default_rng(3)
    dense = 2 * CHUNK + rng.choice(CHUNK, 200, replace=False)
    rest = rng.choice(v - 3 * CHUNK, 60, replace=False) + 3 * CHUNK
    uids = np.sort(np.concatenate([dense, rest])).astype(np.int32)
    n = len(uids)
    pad = np.zeros(cap, np.int32)
    pad[:n] = uids
    cids, oblks, lstarts, codes = _plan(pad, n, v, cap)
    cids, oblks, lstarts = map(np.asarray, (cids, oblks, lstarts))
    codes = np.asarray(codes)
    c4 = CHUNK // rx.PACK

    assert (np.diff(cids) >= 0).all()
    assert (np.diff(oblks) >= 0).all()
    assert (np.diff(lstarts) >= 0).all()
    assert (oblks == lstarts // BROWS).all()
    assert (lstarts % rx.LINE == 0).all()

    # reconstruct: every rank < n must be coded exactly once, correctly
    seen = np.zeros(n, int)
    for t in range(len(cids)):
        for r in range(rx.LINE):
            l4, k = codes[t, r]
            if l4 == c4:
                continue
            rank = lstarts[t] + r
            assert rank < n
            assert cids[t] * CHUNK + l4 * rx.PACK + k == uids[rank]
            seen[rank] += 1
    # padding slots are all-sentinel, so each live rank coded ONCE
    assert (seen == 1).all()
    # the dense chunk (200 ids) must span >= 2 slots on the same chunk
    real = cids[: int(np.sum([ (codes[t,:,0] != c4).any() for t in range(len(cids)) ]))]
    assert (real == 2).sum() >= 2

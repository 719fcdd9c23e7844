"""Range-partitioned packed master (fm_kernel.StreamingFMStatePartitioned).

Why it exists (measured, PARITY.md): XLA row-scatter cost is per-index
and scales with the target table's size (34 ns/idx @65k rows vs 160
donated @10M on v5e), so splitting the vocab-space master into id-range
partitions makes the hot head's exchange pay the small-table rate —
1.57x the push, bit-exact (benchmarks/bench_partitioned_exchange.py).
Reference analogue: the PS DHT shards the table by key range
(consistent_hash.h:31-40); this is that layout on one chip's HBM.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightctr_tpu.models import fm_kernel
from lightctr_tpu.ops.embedding_pallas import TILE


def _toy(seed=0, B=64, L=32, V=4096, zipfish=True):
    rng = np.random.default_rng(seed)
    if zipfish:
        ids = np.where(
            rng.random((B, L)) < 0.5,
            rng.integers(0, 64, (B, L)),
            rng.integers(0, V, (B, L)),
        ).astype(np.int64)
    else:
        ids = rng.integers(0, V, (B, L)).astype(np.int64)
    vals = rng.random((B, L)).astype(np.float32)
    mask = (rng.random((B, L)) > 0.15).astype(np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    return ids, vals, mask, labels


BOUNDS = (256, 1024, 4096)


def _steps(V=4096, capacity=4 * TILE, b_pad=128, caps=(256, 768, 2048),
           **kw):
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True, **kw)
    packed = fm_kernel.make_streaming_train_step_packed(cfg, capacity, b_pad)
    part = fm_kernel.make_streaming_train_step_partitioned(
        cfg, capacity, b_pad, BOUNDS, caps)
    return cfg, packed, part


def test_partitioned_matches_packed_trajectory():
    """Multi-batch trajectory must reproduce the packed step (shared
    _packed_rank_core; pull/push split over disjoint ranges). Tolerance:
    the core is inlined into two DIFFERENT compiled programs, so XLA may
    reorder reductions — observed 1-ulp accum noise; same rtol
    convention as test_fused_streaming_matches_plan_plus_step."""
    V, capacity, b_pad = 4096, 4 * TILE, 128
    cfg, step_p, step_q = _steps()

    st_p = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    st_q = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), BOUNDS)

    for i in range(5):
        ids, vals, mask, labels = _toy(seed=i, zipfish=(i % 2 == 0))
        b = fm_kernel.plan_batch_on_device(
            jnp.asarray(ids, jnp.int32), jnp.asarray(vals),
            jnp.asarray(mask), jnp.asarray(labels),
            jnp.ones((64,), jnp.float32), capacity=capacity, b_pad=b_pad)
        st_p, lp = step_p(st_p, b)
        (st_q, lq), overflow = step_q(st_q, b)
        assert not bool(overflow)
        np.testing.assert_allclose(float(lp), float(lq), rtol=1e-6)

    back = fm_kernel.departition_streaming_state(st_q)
    # atol: a 1-ulp accumulator difference passes through Adagrad's
    # 1/sqrt on near-zero accums, so tiny elements see ~1e-6 absolute
    # drift after a few steps while large ones stay at rtol
    np.testing.assert_allclose(np.asarray(back.packed),
                               np.asarray(st_p.packed),
                               rtol=1e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(back.w0), np.asarray(st_p.w0),
                               rtol=1e-6)


def test_partitioned_overflow_flag():
    """A batch whose partition-0 uniques exceed cap0 must raise the
    overflow flag (the state is then incomplete by contract)."""
    cfg, _, step_q = _steps(caps=(128, 768, 2048))
    st_q = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), BOUNDS)
    # >128 unique ids below 256
    ids = np.arange(64 * 32).reshape(64, 32) % 250
    b = fm_kernel.plan_batch_on_device(
        jnp.asarray(ids, jnp.int32), jnp.ones((64, 32), jnp.float32),
        jnp.ones((64, 32), jnp.float32), jnp.zeros((64,), jnp.float32),
        jnp.ones((64,), jnp.float32), capacity=4 * TILE, b_pad=128)
    (_, _), overflow = step_q(st_q, b)
    assert bool(overflow)


def test_partition_caps_for_covers_traffic():
    ids, vals, mask, labels = _toy(seed=3)
    plan = fm_kernel.plan_batch(ids, vals, mask, labels,
                                n_rows_pad=4 * TILE)
    caps = fm_kernel.partition_caps_for(plan.uids, plan.n_unique, BOUNDS,
                                        multiple=128)
    u = np.asarray(plan.uids)[: plan.n_unique]
    base = 0
    for b, cap in zip(BOUNDS, caps):
        assert ((u >= base) & (u < b)).sum() <= cap
        assert cap % 128 == 0
        base = b


def test_partition_state_roundtrip_and_bounds_check():
    cfg = fm_kernel.KernelFMConfig(n_features=4096, factor=4,
                                   interpret=True)
    st = fm_kernel.streaming_init_packed(jax.random.PRNGKey(1), cfg)
    q = fm_kernel.partition_streaming_state(st, BOUNDS)
    assert [p.shape[0] for p in q.parts] == [256, 768, 3072]
    back = fm_kernel.departition_streaming_state(q)
    np.testing.assert_array_equal(np.asarray(back.packed),
                                  np.asarray(st.packed))
    with pytest.raises(AssertionError):
        fm_kernel.partition_streaming_state(st, (256, 1024))  # != V


def test_fused_partitioned_matches_fused_packed():
    """The one-dispatch partitioned step (device planner traced in) must
    reproduce the fused packed step's trajectory."""
    V, capacity, b_pad = 4096, 4 * TILE, 128
    caps = (256, 768, 2048)
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True)
    step_f = fm_kernel.make_streaming_train_step_fused(cfg, capacity, b_pad)
    step_q = fm_kernel.make_streaming_train_step_fused_partitioned(
        cfg, capacity, b_pad, BOUNDS, caps)
    st_f = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    st_q = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), BOUNDS)
    for i in range(4):
        ids, vals, mask, labels = _toy(seed=10 + i, zipfish=(i % 2 == 0))
        args = (jnp.asarray(ids, jnp.int32), jnp.asarray(vals),
                jnp.asarray(mask), jnp.asarray(labels),
                jnp.ones((64,), jnp.float32))
        st_f, lf = step_f(st_f, *args)
        (st_q, lq), ov = step_q(st_q, *args)
        assert not bool(ov)
        np.testing.assert_allclose(float(lf), float(lq), rtol=1e-6)
    back = fm_kernel.departition_streaming_state(st_q)
    np.testing.assert_allclose(np.asarray(back.packed),
                               np.asarray(st_f.packed),
                               rtol=1e-5, atol=2e-6)


def test_engine_partitioned_matches_packed(monkeypatch):
    """train_fm_kernel(partitioned=True) must reproduce the packed
    engine's loss trajectory (same per-batch streaming path: the
    epoch-scan branch is forced off so both see the SAME host
    shuffling)."""
    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.train import kernel_engine

    monkeypatch.setattr(kernel_engine, "EPOCH_SCAN_MAX_POSITIONS", 0)

    rng = np.random.default_rng(0)
    n, L, V = 256, 32, 70_000
    ids = np.where(
        rng.random((n, L)) < 0.5,
        rng.integers(0, 64, (n, L)),
        rng.integers(0, V, (n, L)),
    ).astype(np.int32)
    mask = (rng.random((n, L)) > 0.1).astype(np.float32)
    ds = SparseDataset(
        ids=ids, vals=np.ones((n, L), np.float32),
        fields=np.zeros((n, L), np.int32), mask=mask,
        labels=rng.integers(0, 2, (n,)).astype(np.float32),
        nnz=mask.sum(1).astype(np.int32), n_features=V, n_fields=1)

    kw = dict(factor=4, learning_rate=0.2, l2=1e-4, epochs=2,
              batch_size=64, seed=0, exact=True, log=None)
    params_p, losses_p = kernel_engine.train_fm_kernel(ds, **kw)
    params_q, losses_q = kernel_engine.train_fm_kernel(
        ds, partitioned=True, **kw)

    np.testing.assert_allclose(losses_q, losses_p, rtol=1e-6)
    # cross-program reduction-order ulps through Adagrad's 1/sqrt — see
    # test_partitioned_matches_packed_trajectory's tolerance note
    np.testing.assert_allclose(np.asarray(params_q["v"]),
                               np.asarray(params_p["v"]),
                               rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(params_q["w"]),
                               np.asarray(params_p["w"]),
                               rtol=1e-5, atol=5e-6)


def test_fused_core_matches_separate_kernels():
    """cfg.fused routes _packed_rank_core through the ONE-pallas_call
    two-phase kernel (r4: the streaming core is grid-overhead-bound at
    production capacities). Same math as the separate fwd/bwd kernels —
    multi-batch packed trajectories must agree to cross-program ulps."""
    V, capacity, b_pad = 4096, 4 * TILE, 128
    cfg_s, step_s, _ = _steps()
    cfg_f, step_f, _ = _steps(fused=True)

    st_s = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg_s)
    st_f = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg_f)

    for i in range(5):
        ids, vals, mask, labels = _toy(seed=i, zipfish=(i % 2 == 0))
        b = fm_kernel.plan_batch_on_device(
            jnp.asarray(ids, jnp.int32), jnp.asarray(vals),
            jnp.asarray(mask), jnp.asarray(labels),
            jnp.ones((64,), jnp.float32), capacity=capacity, b_pad=b_pad)
        st_s, ls = step_s(st_s, b)
        st_f, lf = step_f(st_f, b)
        np.testing.assert_allclose(float(ls), float(lf), rtol=1e-5)

    np.testing.assert_allclose(np.asarray(st_f.packed),
                               np.asarray(st_s.packed),
                               rtol=1e-5, atol=2e-6)


def test_fused_core_partitioned_matches_packed():
    """fused core inside the PARTITIONED step: trajectory equality vs
    the fused packed step (the production zipf configuration)."""
    cfg, step_p, step_q = _steps(fused=True)
    st_p = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    st_q = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), BOUNDS)

    for i in range(4):
        ids, vals, mask, labels = _toy(seed=10 + i)
        b = fm_kernel.plan_batch_on_device(
            jnp.asarray(ids, jnp.int32), jnp.asarray(vals),
            jnp.asarray(mask), jnp.asarray(labels),
            jnp.ones((64,), jnp.float32), capacity=4 * TILE, b_pad=128)
        st_p, lp = step_p(st_p, b)
        (st_q, lq), overflow = step_q(st_q, b)
        assert not bool(overflow)
        np.testing.assert_allclose(float(lp), float(lq), rtol=1e-6)

    back = fm_kernel.departition_streaming_state(st_q)
    np.testing.assert_allclose(np.asarray(back.packed),
                               np.asarray(st_p.packed),
                               rtol=1e-5, atol=2e-6)


def test_split_fused_core_matches_plain():
    """plan_to_arrays_split + cfg.fused: two half-batch fused calls over
    the shared rank space must reproduce the plain packed step (rows
    partition cleanly between halves; grad_rows add)."""
    rng = np.random.default_rng(5)
    B, L, V = 128, 16, 4096
    capacity = 4 * TILE
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    vals = rng.random((B, L)).astype(np.float32)
    mask = (rng.random((B, L)) > 0.2).astype(np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)

    plan = fm_kernel.plan_batch(ids, vals, mask, labels,
                                n_rows_pad=capacity)
    b_pad = plan.b_pad
    arrays = fm_kernel.plan_to_arrays(plan, capacity)
    arrays_s = fm_kernel.plan_to_arrays_split(plan, capacity, n_halves=2)

    cfg_p = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True)
    cfg_f = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True, fused=True)

    step_p = fm_kernel.make_streaming_train_step_packed(cfg_p, capacity,
                                                        b_pad)
    step_f = fm_kernel.make_streaming_train_step_packed(cfg_f, capacity,
                                                        b_pad)
    st_p = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg_p)
    st_f = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg_f)
    for _ in range(3):
        st_p, lp = step_p(st_p, arrays)
        st_f, lf = step_f(st_f, arrays_s)
        np.testing.assert_allclose(float(lp), float(lf), rtol=1e-5)
    # splitting changes the position-accumulation order (gr_A + gr_B vs
    # one sweep), and those ulps pass through Adagrad's 1/sqrt on
    # near-zero accums — observed max 7e-6 abs on 4/131072 elements
    np.testing.assert_allclose(np.asarray(st_f.packed),
                               np.asarray(st_p.packed),
                               rtol=1e-4, atol=1e-5)


def test_fused_partitioned_binary_matches_general():
    """The ids+labels-only binary fused step reproduces the general
    fused partitioned step's trajectory on all-ones batches (the wire
    carries 1/3 the bytes; the math must be identical)."""
    V, capacity, b_pad = 4096, 4 * TILE, 128
    caps = (256, 768, 2048)
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, l2=1e-4,
        interpret=True, exact=True)
    step_g = fm_kernel.make_streaming_train_step_fused_partitioned(
        cfg, capacity, b_pad, BOUNDS, caps)
    step_b = fm_kernel.make_streaming_train_step_fused_partitioned_binary(
        cfg, capacity, b_pad, BOUNDS, caps)
    st_g = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), BOUNDS)
    st_b = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), BOUNDS)
    for i in range(3):
        ids, _, _, labels = _toy(seed=20 + i, zipfish=True)
        ones = np.ones(ids.shape, np.float32)
        (st_g, lg), ovg = step_g(
            st_g, jnp.asarray(ids, jnp.int32), jnp.asarray(ones),
            jnp.asarray(ones), jnp.asarray(labels),
            jnp.ones((ids.shape[0],), jnp.float32))
        (st_b, lb), ovb = step_b(
            st_b, jnp.asarray(ids, jnp.int32), jnp.asarray(labels))
        assert not bool(ovg) and not bool(ovb)
        np.testing.assert_allclose(float(lb), float(lg), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fm_kernel.departition_streaming_state(st_b).packed),
        np.asarray(fm_kernel.departition_streaming_state(st_g).packed),
        rtol=1e-6)


def test_engine_partitioned_binary_wire_matches_general(monkeypatch):
    """On a fixed-L all-ones dataset with full batches, the engine's
    partitioned path auto-selects the BINARY wire (ids+labels only) and
    must reproduce the general partitioned trajectory."""
    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.train import kernel_engine

    monkeypatch.setattr(kernel_engine, "EPOCH_SCAN_MAX_POSITIONS", 0)

    rng = np.random.default_rng(3)
    n, L, V = 256, 32, 70_000
    ids = np.where(
        rng.random((n, L)) < 0.5,
        rng.integers(0, 64, (n, L)),
        rng.integers(0, V, (n, L)),
    ).astype(np.int32)
    ds_bin = SparseDataset(
        ids=ids, vals=np.ones((n, L), np.float32),
        fields=np.zeros((n, L), np.int32),
        mask=np.ones((n, L), np.float32),
        labels=rng.integers(0, 2, (n,)).astype(np.float32),
        nnz=np.full((n,), L, np.int32), n_features=V, n_fields=1)

    kw = dict(factor=4, learning_rate=0.2, l2=1e-4, epochs=2,
              batch_size=64, seed=0, exact=True, log=None,
              partitioned=True)
    # general wire, forced by breaking the binary gate (mask-with-zeros
    # datasets use the general step)
    calls = []
    orig = kernel_engine.fm_kernel.make_streaming_train_step_fused_partitioned_binary

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(
        kernel_engine.fm_kernel,
        "make_streaming_train_step_fused_partitioned_binary", spy)
    params_b, losses_b = kernel_engine.train_fm_kernel(ds_bin, **kw)
    assert calls, "binary gate did not fire on an all-ones dataset"

    # the same batches through the GENERAL wire: break the gate with a
    # numpy proxy whose .all() is False inside kernel_engine only
    import types

    class _NoAll(types.ModuleType):
        def __getattr__(self, name):
            if name == "all":
                return lambda *a, **k: False
            return getattr(np, name)

    calls.clear()

    def no_binary(*a, **k):
        raise AssertionError("binary step built after gate monkeypatch")

    monkeypatch.setattr(
        kernel_engine.fm_kernel,
        "make_streaming_train_step_fused_partitioned_binary", no_binary)
    monkeypatch.setattr(kernel_engine, "np", _NoAll("np_noall"))
    params_gen, losses_gen = kernel_engine.train_fm_kernel(ds_bin, **kw)

    np.testing.assert_allclose(losses_b, losses_gen, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params_b["v"]),
                               np.asarray(params_gen["v"]),
                               rtol=1e-5, atol=5e-6)

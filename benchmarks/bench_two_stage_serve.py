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

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_two_stage_serve.py
"""

import json
import time

import numpy as np

N_ITEMS, D, TOPK = 1_000_000, 32, 100


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.serve.ann import mips_topk_chunked

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(N_ITEMS, D)).astype(np.float32)
                        / np.sqrt(D))
    # ranking model: FM over (user embedding x item embedding) — the
    # candidate's item vector doubles as its feature values, the user
    # vector as the query; stage-2 re-scores the top-k exactly like
    # fm_predict's O(k*nnz) pass over the candidate row
    w_item = jnp.asarray(rng.normal(size=(N_ITEMS,)).astype(np.float32) * .01)
    v_item = jnp.asarray(rng.normal(size=(N_ITEMS, 8)).astype(np.float32) * .1)

    @jax.jit
    def serve(items, w_item, v_item, queries, salt):
        # stage 1: exact MIPS recall over the full catalogue
        scores, cand = mips_topk_chunked(queries, items, k=TOPK)
        # stage 2: FM ranking of the candidates — gather candidate
        # parameters, score w + <v, q_proj> + recall score prior
        w = w_item[cand]                                       # [B, K]
        v = v_item[cand]                                       # [B, K, 8]
        qproj = queries[:, :8]                                 # [B, 8]
        z = w + jnp.einsum("bkf,bf->bk", v, qproj) + 0.1 * scores
        best = jnp.argmax(z, axis=-1)
        return jnp.sum(z.max(axis=-1)) + salt, jnp.take_along_axis(
            cand, best[:, None], axis=1)[:, 0]

    out = {"n_items": N_ITEMS, "topk": TOPK}
    for B in (1, 256, 4096):
        q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        s, ids = serve(items, w_item, v_item, q, 0.0)
        float(s)
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

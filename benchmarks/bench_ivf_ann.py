"""Two-tier IVF retrieval vs exact scan at 10M items (VERDICT r4 #5).

Target: >= 0.95 recall@100 at >= 5x the exact scan's QPS on 10M items.
Data: clustered embeddings (1024 Gaussian modes — the regime real
item embeddings live in; on fully isotropic data NO shortlist method
can beat exact scan, which is why exact stays the default).

Honest framing: the IVF win is a LATENCY win (small query batches —
the reference's per-user candidate-generation shape, ann_index.h
query:110); at large B the exact scan amortises its one big matmul
across queries. Both regimes reported.

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python benchmarks/bench_ivf_ann.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.serve.ann import IVFIndex, mips_topk_chunked

    small = bool(os.environ.get("LIGHTCTR_PROBE_SMALL"))
    N, D, MODES = (100_000, 16, 64) if small else (10_000_000, 16, 1024)
    n_q = 64
    k = 100
    rng = np.random.default_rng(0)
    out = {"n_items": N}

    modes = (rng.normal(size=(MODES, D)) * 3.0).astype(np.float32)
    which = rng.integers(0, MODES, N)
    items = (modes[which]
             + rng.normal(size=(N, D)).astype(np.float32)).astype(np.float32)
    queries = (modes[rng.integers(0, MODES, n_q)]
               + rng.normal(size=(n_q, D)).astype(np.float32))

    items_d = jnp.asarray(items)
    q_all = jnp.asarray(queries)

    # ---- exact ground truth + exact QPS (B=1 and B=n_q)
    s_ex, i_ex = mips_topk_chunked(q_all, items_d, k=k)
    truth = [set(np.asarray(i_ex[b]).tolist()) for b in range(n_q)]

    def timeit(fn, n=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jnp.asarray(r[0]).block_until_ready()
        float(jnp.sum(r[0][:1, :1]))
        return (time.perf_counter() - t0) / n

    q1 = q_all[:1]
    dt = timeit(lambda: mips_topk_chunked(q1, items_d, k=k))
    out["exact_b1_ms"] = round(dt * 1e3, 3)
    out["exact_b1_qps"] = round(1 / dt, 1)
    dt = timeit(lambda: mips_topk_chunked(q_all, items_d, k=k))
    out[f"exact_b{n_q}_ms"] = round(dt * 1e3, 3)
    out[f"exact_b{n_q}_qps"] = round(n_q / dt, 1)
    print(json.dumps(out), flush=True)

    # ---- IVF build + query
    t0 = time.perf_counter()
    idx = IVFIndex(items, n_clusters=64 if small else 8192,
                   bucket_cap=None if small else 2560,
                   n_iters=10, seed=0)
    out["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    out["ivf_tail_frac"] = round(idx.tail_frac, 4)

    for nprobe in (8, 16):
        _, i_iv = idx.query(q_all, k=k, nprobe=nprobe)
        rec = np.mean([
            len(truth[b] & set(np.asarray(i_iv[b]).tolist())) / k
            for b in range(n_q)
        ])
        out[f"ivf_np{nprobe}_recall_at_100"] = round(float(rec), 4)
        dt = timeit(lambda: idx.query(q1, k=k, nprobe=nprobe))
        out[f"ivf_np{nprobe}_b1_ms"] = round(dt * 1e3, 3)
        out[f"ivf_np{nprobe}_b1_qps"] = round(1 / dt, 1)
        out[f"ivf_np{nprobe}_b1_speedup"] = round(
            out[f"ivf_np{nprobe}_b1_qps"] / out["exact_b1_qps"], 2)
        dt = timeit(lambda: idx.query(q_all, k=k, nprobe=nprobe))
        out[f"ivf_np{nprobe}_b{n_q}_qps"] = round(n_q / dt, 1)
        print(json.dumps(out), flush=True)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

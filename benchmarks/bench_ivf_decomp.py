"""Decompose the 10M-item IVF B=1 latency (r5: the two-stage IVF row
measured ~112-117 ms while bench_ivf_ann's accepted r4 run reported
12.1 ms at nprobe=16 — find which knob moved: D=16 vs 32, the 2.5%
overflow tail, the per-bucket cap, or the wide top_k).

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 5400 python -u benchmarks/bench_ivf_decomp.py
"""

import json
import time

import numpy as np

N, TOPK = 10_000_000, 100


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.serve.ann import IVFIndex

    out = {}
    rng = np.random.default_rng(0)

    def timeit(fn, n=30):
        r = fn()
        jax.tree_util.tree_map(np.asarray, r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.tree_util.tree_map(np.asarray, r)
        return (time.perf_counter() - t0) / n

    for D in (16, 32):
        modes = (rng.normal(size=(1024, D)) * 3.0).astype(np.float32)
        which = rng.integers(0, 1024, N)
        items = (modes[which]
                 + rng.normal(size=(N, D)).astype(np.float32))
        q1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
        for cap in (2560, 5120):
            idx = IVFIndex(items, n_clusters=8192, bucket_cap=cap)
            key = f"d{D}_cap{cap}"
            out[f"{key}_tail_frac"] = round(idx.tail_frac, 4)
            for nprobe in (16,):
                dt = timeit(lambda: idx.query(q1, k=TOPK, nprobe=nprobe))
                out[f"{key}_np{nprobe}_b1_ms"] = round(dt * 1e3, 3)
            print(json.dumps(out), flush=True)
            del idx
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    import sys
    if "--compose" not in sys.argv:
        main()


def compose_probe():
    """Time the full two-stage composition at d32/cap2560 to find where
    the two-stage bench's 117 ms B=1 goes when the index alone is 4.5 ms."""
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.serve.ann import IVFIndex, _ivf_query

    out = {}
    rng = np.random.default_rng(0)
    D = 32
    modes = (rng.normal(size=(1024, D)) * 3.0).astype(np.float32)
    which = rng.integers(0, 1024, N)
    items = ((modes[which] + rng.normal(size=(N, D)).astype(np.float32))
             / np.sqrt(D)).astype(np.float32)
    idx = IVFIndex(items, n_clusters=8192, bucket_cap=2560)
    w_item = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * .01)
    v_item = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32) * .1)
    q1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    ivf_raw = _ivf_query.__wrapped__

    def timeit_chain(fn, n=30):
        acc = fn(jnp.float32(0.0))
        float(acc)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = fn(acc)
        float(acc)
        return (time.perf_counter() - t0) / n

    # (a) stage 1 only, chained through salt
    @jax.jit
    def s1(cent, bids, iext, tids, tvecs, q, salt):
        s, cand = ivf_raw(q, cent, bids, iext, tids, tvecs, N, TOPK,
                          16, "ip")
        return jnp.sum(s) + salt

    out["s1_chained_b1_ms"] = round(timeit_chain(
        lambda a: s1(idx.centroids, idx.bucket_ids, idx.items_ext,
                     idx.tail_ids, idx.tail_vecs, q1, a)) * 1e3, 3)
    print(json.dumps(out), flush=True)

    # (b) stage 1 + rank (the two-stage serve body)
    @jax.jit
    def s12(cent, bids, iext, tids, tvecs, w_item, v_item, q, salt):
        s, cand = ivf_raw(q, cent, bids, iext, tids, tvecs, N, TOPK,
                          16, "ip")
        w = w_item[jnp.minimum(cand, N - 1)]
        v = v_item[jnp.minimum(cand, N - 1)]
        z = w + jnp.einsum("bkf,bf->bk", v, q[:, :8]) + 0.1 * s
        z = jnp.where(cand >= N, jnp.finfo(jnp.float32).min, z)
        return jnp.sum(z.max(axis=-1)) + salt

    out["s12_chained_b1_ms"] = round(timeit_chain(
        lambda a: s12(idx.centroids, idx.bucket_ids, idx.items_ext,
                      idx.tail_ids, idx.tail_vecs, w_item, v_item, q1,
                      a)) * 1e3, 3)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys
    if "--compose" in sys.argv:
        compose_probe()

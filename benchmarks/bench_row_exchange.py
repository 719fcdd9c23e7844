"""Decide the production master-table exchange kernel (VERDICT r2 #1).

Times, at the PS-scale regime (V=10M, W=32 packed, capacity 262144),
the four ops/row_exchange.py Pallas kernels against the XLA
gather/scatter they replace, under the two bench.py traffic shapes:

  uniform — 260k unique rows/batch (worst case; every chunk touched)
  zipf1.2 — ~34k unique rows/batch (realistic CTR skew; few chunks)

Both regimes reuse ONE compiled program per kernel (the shapes are
capacity-static; idle slots repeat the last chunk id so their DMAs are
skipped) — fresh Mosaic compiles over this tunnel cost minutes, so
everything here is shape-shared and cache-enabled.

Also times plan_row_exchange (it joins the fused step's in-graph
planner) and spot-checks kernel outputs against the XLA ops on device.

    python benchmarks/bench_row_exchange.py
"""

import json
import os
import time

import numpy as np

V, W = 10_000_000, 32
CAPACITY = 262_144          # == plan.n_rows_pad at B=4096, L=64 uniform
CHUNK, UMAX = 2048, 256
IP = bool(int(os.environ.get("RX_INTERPRET", "0")))  # CPU smoke mode


def timeit(fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.ops import row_exchange as rx

    rng = np.random.default_rng(0)
    out = {}

    regimes = {}
    uids_u = np.unique(rng.integers(0, V, CAPACITY).astype(np.int64))
    regimes["uniform"] = uids_u[: CAPACITY - 8]
    zipf = np.minimum(rng.zipf(1.2, 4096 * 64) - 1, V - 1)
    regimes["zipf"] = np.unique(zipf)[: CAPACITY - 8]

    packed0 = jnp.asarray(rng.normal(size=(V, W)).astype(np.float32))
    rows_new = jnp.asarray(
        rng.normal(size=(CAPACITY, W)).astype(np.float32))

    for name, uids in regimes.items():
        n = len(uids)
        pad = np.zeros(CAPACITY, np.int32)
        pad[:n] = uids
        u = jnp.asarray(pad)
        nu = jnp.int32(n)
        out[f"{name}_unique"] = n
        print(f"--- {name}: {n} unique rows", flush=True)

        # plan cost
        plan = jax.jit(lambda u, nu: rx.plan_row_exchange(
            u, nu, n_features=V, capacity=CAPACITY, chunk=CHUNK,
            u_max=UMAX))
        cids, meta = plan(u, nu)
        cids.block_until_ready()
        out[f"{name}_plan_ms"] = round(timeit(
            lambda: float(plan(u, nu)[0][0])), 3)
        print("plan", out[f"{name}_plan_ms"], flush=True)

        # XLA baselines
        @jax.jit
        def xla_pull(t, u, salt):
            return jnp.sum(t[u]) + salt

        acc = 0.0
        float(xla_pull(packed0, u, 0.0))
        t0 = time.perf_counter()
        for _ in range(20):
            acc = xla_pull(packed0, u, acc)
        float(acc)
        out[f"{name}_xla_pull_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
        print("xla_pull", out[f"{name}_xla_pull_ms"], flush=True)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def xla_push(t, u, g, nu):
            pos = jnp.arange(CAPACITY)
            safe = jnp.where(pos < nu, u, V)
            return t.at[safe].set(g, mode="drop")

        t2 = xla_push(packed0 + 0, u, rows_new, nu)
        float(t2[0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            t2 = xla_push(t2, u, rows_new, nu)
        float(t2[0, 0])
        out[f"{name}_xla_push_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
        del t2
        print("xla_push", out[f"{name}_xla_push_ms"], flush=True)

        # sweep pull (+ device spot check vs XLA)
        got = rx.pull_rows_sweep(
            packed0, cids, meta, capacity=CAPACITY, chunk=CHUNK,
            u_max=UMAX, unroll=8, interpret=IP)
        want = packed0[u[:128]]
        np.testing.assert_allclose(np.asarray(got[:128]), np.asarray(want))
        acc = 0.0

        @jax.jit
        def sweep_pull_sum(packed, cids, meta, salt):
            return jnp.sum(rx.pull_rows_sweep(
                packed, cids, meta, capacity=CAPACITY, chunk=CHUNK,
                u_max=UMAX, unroll=8, interpret=IP)) + salt

        float(sweep_pull_sum(packed0, cids, meta, 0.0))
        t0 = time.perf_counter()
        for _ in range(20):
            acc = sweep_pull_sum(packed0, cids, meta, acc)
        float(acc)
        out[f"{name}_sweep_pull_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
        print("sweep_pull", out[f"{name}_sweep_pull_ms"], flush=True)

        # sweep push (donated chain)
        tbl = packed0 + 0
        tbl = rx.push_rows_sweep(tbl, rows_new, cids, meta,
                                 n_features=V, chunk=CHUNK, u_max=UMAX,
                                 interpret=IP)
        float(tbl[0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            tbl = rx.push_rows_sweep(tbl, rows_new, cids, meta,
                                     n_features=V, chunk=CHUNK,
                                     u_max=UMAX, interpret=IP)
        float(tbl[0, 0])
        out[f"{name}_sweep_push_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
        # spot check after the chain: touched rows hold rows_new
        np.testing.assert_allclose(
            np.asarray(tbl[u[:64]]), np.asarray(rows_new[:64]))
        del tbl
        print("sweep_push", out[f"{name}_sweep_push_ms"], flush=True)

        # per-row DMA pull
        got = rx.pull_rows_dma(packed0, u, nu, capacity=CAPACITY, interpret=IP)
        np.testing.assert_allclose(np.asarray(got[:128]), np.asarray(want))

        @jax.jit
        def dma_pull_sum(packed, u, nu, salt):
            return jnp.sum(rx.pull_rows_dma(
                packed, u, nu, capacity=CAPACITY, interpret=IP)) + salt

        acc = 0.0
        float(dma_pull_sum(packed0, u, nu, 0.0))
        t0 = time.perf_counter()
        for _ in range(20):
            acc = dma_pull_sum(packed0, u, nu, acc)
        float(acc)
        out[f"{name}_dma_pull_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
        print("dma_pull", out[f"{name}_dma_pull_ms"], flush=True)

        # per-row DMA push
        tbl = packed0 + 0
        tbl = rx.push_rows_dma(tbl, rows_new, u, nu, interpret=IP)
        float(tbl[0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            tbl = rx.push_rows_dma(tbl, rows_new, u, nu, interpret=IP)
        float(tbl[0, 0])
        out[f"{name}_dma_push_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
        np.testing.assert_allclose(
            np.asarray(tbl[u[:64]]), np.asarray(rows_new[:64]))
        del tbl
        print("dma_push", out[f"{name}_dma_push_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

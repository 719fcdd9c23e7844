"""Decide the production master-table exchange kernel (VERDICT r2 #1).

Times, at the PS-scale regime (V=10M rounded to a chunk multiple, W=32
packed, capacity 262144), ops/row_exchange.py's packed-lane one-hot
sweep kernels against the XLA gather/scatter they replace, under the
two bench.py traffic shapes:

  uniform — 260k unique rows/batch (worst case; every chunk touched)
  zipf1.2 — ~34k unique rows/batch (realistic CTR skew; few chunks)

Both regimes reuse ONE compiled program per kernel (shapes are
capacity-static; idle slots repeat the last indices so their DMAs are
skipped). Also times plan_row_exchange (it joins the fused step's
in-graph planner) and spot-checks kernel outputs against the XLA ops
on device.

History (earlier attempts this round, keep for the record): a per-row
in-VMEM copy-loop sweep measured 75.8 / 36.6 ms pull/push at the
uniform regime (~290 ns/row — Mosaic scalar loops + unaligned 32-lane
slices), and per-row async-DMA kernels failed to lower (HBM slices
must be 128-lane aligned). The 40 ms plan cost came from a 2-D-indexed
XLA scatter, now linearised.

    python benchmarks/bench_row_exchange.py
"""

import json
import os
import time

import numpy as np

CHUNKS, BROWS = (512, 2048), 16384
V, W = 10_002_432, 32       # 10M rounded to a multiple of every CHUNKS
CAPACITY = 262_144          # == plan.n_rows_pad at B=4096, L=64 uniform
IP = bool(int(os.environ.get("RX_INTERPRET", "0")))  # CPU smoke mode


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
            u, nu, n_features=V, capacity=CAPACITY, chunk=CHUNKS[0],
            block_rows=BROWS))
        cids, oblks, lstarts, codes = plan(u, nu)
        cids.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            float(plan(u, nu)[0][0])
        out[f"{name}_plan_ms"] = round(
            (time.perf_counter() - t0) / 20 * 1e3, 3)
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

        for C in CHUNKS:
            plan_c = jax.jit(lambda u, nu, C=C: rx.plan_row_exchange(
                u, nu, n_features=V, capacity=CAPACITY, chunk=C,
                block_rows=BROWS))
            cids, oblks, lstarts, codes = plan_c(u, nu)
            cids.block_until_ready()
            for exact in (True, False):
                tag = f"{name}_c{C}" + ("" if exact else "_fast")

                # pull (+ device spot check vs XLA on the exact path)
                got = rx.pull_rows(
                    packed0, cids, oblks, lstarts, codes,
                    capacity=CAPACITY, chunk=C, block_rows=BROWS,
                    exact=exact, interpret=IP)
                want = packed0[u[:128]]
                if exact:
                    np.testing.assert_allclose(np.asarray(got[:128]),
                                               np.asarray(want))

                @jax.jit
                def pull_sum(packed, cids, oblks, lstarts, codes, salt,
                             C=C, exact=exact):
                    r = rx.pull_rows(
                        packed, cids, oblks, lstarts, codes,
                        capacity=CAPACITY, chunk=C, block_rows=BROWS,
                        exact=exact, interpret=IP)
                    live = jnp.arange(CAPACITY)[:, None] < nu
                    return jnp.sum(jnp.where(live, r, 0.0)) + salt

                acc = 0.0
                float(pull_sum(packed0, cids, oblks, lstarts, codes, 0.0))
                t0 = time.perf_counter()
                for _ in range(20):
                    acc = pull_sum(packed0, cids, oblks, lstarts, codes,
                                   acc)
                float(acc)
                out[f"{tag}_pull_ms"] = round(
                    (time.perf_counter() - t0) / 20 * 1e3, 3)
                print(f"{tag} pull", out[f"{tag}_pull_ms"], flush=True)

                # push (donated chain)
                tbl = packed0 + 0
                tbl = rx.push_rows(tbl, rows_new, cids, oblks, lstarts,
                                   codes, chunk=C, block_rows=BROWS,
                                   exact=exact, interpret=IP)
                float(tbl[0, 0])
                t0 = time.perf_counter()
                for _ in range(20):
                    tbl = rx.push_rows(tbl, rows_new, cids, oblks,
                                       lstarts, codes, chunk=C,
                                       block_rows=BROWS, exact=exact,
                                       interpret=IP)
                float(tbl[0, 0])
                out[f"{tag}_push_ms"] = round(
                    (time.perf_counter() - t0) / 20 * 1e3, 3)
                if exact:
                    np.testing.assert_allclose(
                        np.asarray(tbl[u[:64]]), np.asarray(rows_new[:64]))
                del tbl
                print(f"{tag} push", out[f"{tag}_push_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

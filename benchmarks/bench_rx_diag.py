"""Diagnose the row-exchange sweep's ~11.5 us/slot fixed overhead.

bench_row_exchange.py measured the one-hot sweep at 78-91 ms pull /
46-56 ms push at BOTH traffic shapes — i.e. a per-slot constant, not
MXU/DMA. Candidates: (a) the [1,128,2] codes block DMA (128x8 B strided
into tile layout), (b) the chunk-block DMA not being skipped on
repeated indices, (c) Mosaic grid iteration overhead itself. This probe
times, at the uniform production shape, C=2048:

  noop     — same grid/blocks, kernel body writes nothing
  nocodes  — full body but codes replaced by a broadcasted constant
             (codes block still mapped; separates DMA from use)
  plan     — the argsort-compaction planner (searchsorted was 54 s)

    python benchmarks/bench_rx_diag.py
"""

import functools
import json
import time

import numpy as np

CHUNK, BROWS = 2048, 16384
V, CAPACITY = 10_002_432, 262_144


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.ops import row_exchange as rx

    rng = np.random.default_rng(0)
    uids = np.unique(rng.integers(0, V, CAPACITY).astype(np.int64))[: CAPACITY - 8]
    n = len(uids)
    pad = np.zeros(CAPACITY, np.int32)
    pad[:n] = uids
    u, nu = jnp.asarray(pad), jnp.int32(n)
    packed = jnp.asarray(rng.normal(size=(V, 32)).astype(np.float32))
    out = {}

    plan = jax.jit(lambda u, nu: rx.plan_row_exchange(
        u, nu, n_features=V, capacity=CAPACITY, chunk=CHUNK,
        block_rows=BROWS))
    cids, oblks, lstarts, codes = plan(u, nu)
    cids.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        float(plan(u, nu)[0][0])
    out["plan_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    print("plan", out["plan_ms"], flush=True)

    t_max = cids.shape[0]
    c4 = CHUNK // 4
    packed4 = packed.reshape(V // 4, 128)

    def run_variant(name, kernel, with_codes=True):
        in_specs = [
            pl.BlockSpec((1, 128, 2), lambda t, c, o, ls: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, 128), lambda t, c, o, ls: (c[t], 0),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_max,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((BROWS, 32),
                                   lambda t, c, o, ls: (o[t], 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((CAPACITY, 32), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(3 * BROWS + 4 * c4) * 128 * 4 + 2**22,
            ),
        )

        @jax.jit
        def f(cids, oblks, lstarts, codes, packed4, salt):
            r = call(cids, oblks, lstarts, codes, packed4)
            return jnp.sum(r[:128]) + salt

        acc = 0.0
        float(f(cids, oblks, lstarts, codes, packed4, 0.0))
        t0 = time.perf_counter()
        for _ in range(20):
            acc = f(cids, oblks, lstarts, codes, packed4, acc)
        float(acc)
        out[f"{name}_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        print(name, out[f"{name}_ms"], flush=True)

    def noop_kernel(c_ref, o_ref, ls_ref, codes_ref, blk_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[0:128, :] = jnp.zeros((128, 32), jnp.float32)

    run_variant("noop", noop_kernel)

    def nocodes_kernel(c_ref, o_ref, ls_ref, codes_ref, blk_ref, out_ref):
        # full matmul+store body, but l4/k from iota (codes block mapped
        # yet UNREAD) — separates the codes-DMA cost from its use
        t = pl.program_id(0)
        lrel = ls_ref[t] - o_ref[t] * BROWS
        l4 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        k = jnp.zeros((128, 1), jnp.int32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (128, c4), 1)
        onehot = (l4 == iota_s).astype(jnp.float32)
        lines = jax.lax.dot_general(
            onehot, blk_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = jnp.zeros((128, 32), jnp.float32)
        for kk in range(4):
            acc = acc + (k == kk).astype(jnp.float32) * lines[:, kk*32:(kk+1)*32]
        live = jnp.broadcast_to(l4 < c4, (128, 32))
        pltpu.store(out_ref.at[pl.ds(lrel, 128), :], acc, mask=live)

    run_variant("nocodes_1pass", nocodes_kernel)

    # the real pull at 1 pass (exact=False) and 3 passes for reference
    for exact in (False, True):
        tag = "pull_exact" if exact else "pull_fast"
        @jax.jit
        def g(packed, cids, oblks, lstarts, codes, salt, exact=exact):
            r = rx.pull_rows(packed, cids, oblks, lstarts, codes,
                             capacity=CAPACITY, chunk=CHUNK,
                             block_rows=BROWS, exact=exact)
            return jnp.sum(r[:128]) + salt

        acc = 0.0
        float(g(packed, cids, oblks, lstarts, codes, 0.0))
        t0 = time.perf_counter()
        for _ in range(20):
            acc = g(packed, cids, oblks, lstarts, codes, acc)
        float(acc)
        out[f"{tag}_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        print(tag, out[f"{tag}_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

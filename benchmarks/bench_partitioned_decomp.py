"""Decompose the 9.25 ms partitioned zipf production step (BENCH_r04).

The full step = pull (partitioned gathers) + _packed_rank_core (rank-
space fwd/bwd + Adagrad) + push (partitioned scatters). Exchange in
isolation measured pull 1.93 / push 3.54 ms
(bench_partitioned_exchange.py) — this probe times the CORE alone and
the pull+core prefix at the exact bench.py shapes, so the residual
"rest" in the production row has its own receipt (and a target if it
is attackable).

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python benchmarks/bench_partitioned_decomp.py
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

    from lightctr_tpu.models import fm_kernel

    small = bool(os.environ.get("LIGHTCTR_PROBE_SMALL"))
    B, L, vocab = (256, 64, 100_000) if small else (4096, 64, 10_000_000)
    rng = np.random.default_rng(0)
    ones = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False,
        interpret=small and jax.default_backend() == "cpu",
    )
    if os.environ.get("DECOMP_TRAFFIC") == "uniform":
        ids = rng.integers(0, vocab, (B, L)).astype(np.int64)
    else:
        ids = np.minimum(rng.zipf(1.2, (B, L)) - 1,
                         vocab - 1).astype(np.int64)
    plan = fm_kernel.plan_batch(ids, ones, ones, labels)
    capacity = plan.n_rows_pad
    b_pad = plan.b_pad
    arrays = fm_kernel.plan_to_arrays(plan, capacity)
    out = {"capacity": capacity, "n_unique": int(plan.n_unique)}

    def time_fn(fn, *args, n=100, donate_state=False):
        st = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, st)
        # chain through the first output; force with a readback
        t0 = time.perf_counter()
        cur = args[0]
        for _ in range(n):
            r = fn(cur, *args[1:])
            cur = r[0] if isinstance(r, tuple) else r
        leaf = jax.tree_util.tree_leaves(cur)[0]
        float(np.asarray(leaf).ravel()[0])
        return (time.perf_counter() - t0) / n

    # ---- core alone: rank-space fwd/bwd + optimizer on device-resident
    # pulled rows (the exchange never happens)
    pulled0 = jnp.asarray(
        rng.normal(size=(capacity, 32)).astype(np.float32) * 0.01)
    w0 = jnp.float32(0.0)
    w0a = jnp.float32(0.0)
    dev_arrays = jax.tree_util.tree_map(jnp.asarray, arrays)

    @jax.jit
    def core_only(pulled, b):
        packed_new, w0n, w0an, loss = fm_kernel._packed_rank_core(
            cfg, pulled, b, b_pad, capacity, w0, w0a,
            cfg.learning_rate, cfg.l2)
        return packed_new, loss

    dt = time_fn(core_only, pulled0, dev_arrays)
    out["core_only_ms"] = round(dt * 1e3, 3)

    # ---- full packed and partitioned steps (same numbers as bench.py,
    # re-measured here so the decomposition is internally consistent)
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step_packed(cfg, capacity, b_pad)
    st, loss = step(state, arrays)
    float(loss)
    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        st, loss = step(st, arrays)
    float(loss)
    out["packed_full_ms"] = round((time.perf_counter() - t0) / n * 1e3, 3)

    bounds = ((4_096, 16_384, vocab) if small
              else (65_536, 262_144, 1_048_576, vocab))
    caps = fm_kernel.partition_caps_for(plan.uids, plan.n_unique, bounds)
    stq = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), bounds)
    stepq = fm_kernel.make_streaming_train_step_partitioned(
        cfg, capacity, b_pad, bounds, caps)
    (stq, loss), ovf = stepq(stq, arrays)
    assert not bool(ovf)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        (stq, loss), ovf = stepq(stq, arrays)
    float(loss)
    out["partitioned_full_ms"] = round(
        (time.perf_counter() - t0) / n * 1e3, 3)

    out["partitioned_exchange_resid_ms"] = round(
        out["partitioned_full_ms"] - out["core_only_ms"], 3)
    print(json.dumps(out), flush=True)

    # ---- EQUAL-traffic partitioning on uniform traffic (r5, VERDICT r4
    # weak #1/#3): the zipf-head bounds lose on uniform (89% of uniques
    # land in one big cold partition — 60.2 vs 48.7 ms r4), but the
    # measured lever says per-index scatter cost scales with the TARGET
    # table size (34 ns @65k vs 160 ns @10M, bench_cache_probe.py). N
    # EQUAL partitions give EVERY index a 10M/N-row target. Sweep N.
    if os.environ.get("DECOMP_TRAFFIC") == "uniform":
        for n_parts in (8, 16, 32):
            bounds_n = tuple(vocab * (i + 1) // n_parts
                             for i in range(n_parts))
            caps_n = fm_kernel.partition_caps_for(
                plan.uids, plan.n_unique, bounds_n)
            st_n = fm_kernel.partition_streaming_state(
                fm_kernel.streaming_init_packed(jax.random.PRNGKey(0),
                                                cfg), bounds_n)
            step_n = fm_kernel.make_streaming_train_step_partitioned(
                cfg, capacity, b_pad, bounds_n, caps_n)
            try:
                (st_n, loss), ovf = step_n(st_n, arrays)
                assert not bool(ovf)
                float(loss)
                t0 = time.perf_counter()
                for _ in range(n):
                    (st_n, loss), ovf = step_n(st_n, arrays)
                float(loss)
                out[f"equal_part_{n_parts}_ms"] = round(
                    (time.perf_counter() - t0) / n * 1e3, 3)
            except Exception as e:                     # noqa: BLE001
                out[f"equal_part_{n_parts}_error"] = str(e)[:120]
            del st_n
            print(json.dumps(out), flush=True)

    # ---- core variants: the first decomposition run showed the step is
    # CORE-bound (core 8.1 of the 9.2 ms — the exchange overlaps almost
    # fully), so the kernel choice inside _packed_rank_core is now the
    # lever. Try the fine 5x128 windows (full-batch measured 2.13 vs
    # coarse 2.65 ms) and the device-xmat count matrices (gated to
    # small capacity by the engine — measure what "too big" costs here).
    import dataclasses

    variants = [("fine", dataclasses.replace(cfg, fine=True), True)]
    if os.environ.get("DECOMP_TRAFFIC") != "uniform":
        # r5: fine_tile=1024/nwin=10 halves the grid slots per sweep —
        # the fine core is Mosaic slot-overhead-bound (~5.8 us/slot)
        variants += [
            ("finewide", dataclasses.replace(
                cfg, fine=True, fine_tile=1024, fine_nwin=10), True),
        ]
    if os.environ.get("DECOMP_TRAFFIC") != "uniform":
        # uniform capacity ~262k: xmat's count matrix is ~4.3 GB and the
        # fused kernel's b_pad=4096 blocks crash the Mosaic compiler
        # (bench_fused_probe.py receipts) — zipf-only variants
        variants += [
            ("xmat", dataclasses.replace(cfg, xmat=True), False),
            # plain fused is a settled compiler crash at b_pad=4096;
            # splitfused runs TWO b_pad=2048 fused calls over the
            # shared rank space (plan_to_arrays_split)
            ("splitfused", dataclasses.replace(cfg, fused=True), False),
        ]
    for vname, vcfg, vfine in variants:
        vplan = fm_kernel.plan_batch(
            ids, ones, ones, labels, fine=vfine,
            fine_tile=vcfg.fine_tile, fine_nwin=vcfg.fine_nwin)
        vcap = vplan.n_rows_pad
        to_arrays = (fm_kernel.plan_to_arrays_split
                     if vname == "splitfused" else fm_kernel.plan_to_arrays)
        varrays = jax.tree_util.tree_map(
            jnp.asarray, to_arrays(vplan, vcap))
        vpulled = jnp.asarray(
            rng.normal(size=(vcap, 32)).astype(np.float32) * 0.01)

        @jax.jit
        def vcore(pulled, b, _cfg=vcfg, _cap=vcap):
            packed_new, w0n, w0an, loss = fm_kernel._packed_rank_core(
                _cfg, pulled, b, b_pad, _cap, w0, w0a,
                cfg.learning_rate, cfg.l2)
            return packed_new, loss

        try:
            dt = time_fn(vcore, vpulled, varrays)
        except Exception as e:                         # noqa: BLE001
            out[f"core_{vname}_error"] = str(e)[:120]
            print(json.dumps(out), flush=True)
            continue
        out[f"core_{vname}_ms"] = round(dt * 1e3, 3)
        out[f"core_{vname}_capacity"] = vcap
        print(json.dumps(out), flush=True)

        if vname == "xmat":
            continue
        if vname == "fine" and os.environ.get("DECOMP_TRAFFIC") == "uniform":
            # r5: the fine core measured FASTER than coarse on uniform
            # (15.4 vs 18.3 ms) — measure the PACKED full step with the
            # fine core (the uniform production path is packed, and its
            # 48.8 ms row has been flat since r2)
            stp = fm_kernel.streaming_init_packed(
                jax.random.PRNGKey(0), vcfg)
            stepp = fm_kernel.make_streaming_train_step_packed(
                vcfg, vcap, b_pad)
            stp, loss = stepp(stp, varrays)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(n):
                stp, loss = stepp(stp, varrays)
            float(loss)
            out["packed_full_fine_ms"] = round(
                (time.perf_counter() - t0) / n * 1e3, 3)
            del stp
            print(json.dumps(out), flush=True)
        # winner candidates end-to-end: fine / fused core inside the
        # partitioned step at the production zipf shape
        stf = fm_kernel.partition_streaming_state(
            fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), vcfg),
            bounds)
        stepf = fm_kernel.make_streaming_train_step_partitioned(
            vcfg, vcap, b_pad, bounds, caps)
        (stf, loss), ovf = stepf(stf, varrays)
        assert not bool(ovf)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            (stf, loss), ovf = stepf(stf, varrays)
        float(loss)
        out[f"partitioned_full_{vname}_ms"] = round(
            (time.perf_counter() - t0) / n * 1e3, 3)
        print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

"""Isolate the splitfused-core compile crash (r5).

bench_fused_probe: a STANDALONE fm_fused_step at (b_pad=2048, R=34816,
n=262144) compiles and runs. bench_partitioned_decomp: the splitfused
core (TWO b_pad=2048 fused calls over plan_to_arrays_split halves +
the rank-space Adagrad) crashes tpu_compile_helper. This pulls the real
half arrays from the production zipf plan and compiles the pieces one
at a time to find which composition step hits the cliff:

  half0        one fused call on halves[0]'s REAL arrays, own jit
  both_halves  both fused calls in one jit, grads summed, no optimizer
  core         the full _packed_rank_core splitfused branch (control —
               expected to reproduce the decomp crash if the cliff is
               in the composition)

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3600 python -u benchmarks/bench_splitfused_isolate.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.ops import fm_fused_pallas as K

    B, L, vocab = 4096, 64, 10_000_000
    rng = np.random.default_rng(0)
    ones = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    ids = np.minimum(rng.zipf(1.2, (B, L)) - 1, vocab - 1).astype(np.int64)
    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False,
        fused=True)
    plan = fm_kernel.plan_batch(ids, ones, ones, labels)
    capacity = plan.n_rows_pad
    b_pad = plan.b_pad
    arrays = fm_kernel.plan_to_arrays_split(plan, capacity)
    h0 = arrays["halves"][0]
    out = {"capacity": capacity, "b_pad": b_pad,
           "n_h": int(h0["ranks_sorted"].shape[0]),
           "bh": int(h0["labels_padded"].shape[0])}
    print(json.dumps(out), flush=True)
    rows = jnp.asarray(
        rng.normal(size=(capacity, K.D)).astype(np.float32) * 0.01)
    w0 = jnp.float32(0.0)

    def attempt(label, fn, *args):
        t0 = time.perf_counter()
        try:
            r = fn(*args)
            leaf = jax.tree_util.tree_leaves(r)[0]
            float(np.asarray(leaf).ravel()[0])
            out[label] = {"ok": True,
                          "compile_s": round(time.perf_counter() - t0, 1)}
            t0 = time.perf_counter()
            for _ in range(30):
                r = fn(*args)
            leaf = jax.tree_util.tree_leaves(r)[0]
            float(np.asarray(leaf).ravel()[0])
            out[label]["ms"] = round(
                (time.perf_counter() - t0) / 30 * 1e3, 3)
        except Exception as e:                         # noqa: BLE001
            out[label] = {"ok": False, "error": str(e)[:160]}
        print(json.dumps({label: out[label]}), flush=True)

    dev = jax.tree_util.tree_map(jnp.asarray, arrays)

    # 1) one fused call on the REAL half-0 arrays
    def one_half(rows, hb):
        bh = hb["labels_padded"].shape[0]
        n_valid = jnp.float32(B)
        stats, gr = K.fm_fused_step(
            rows, hb["ranks_sorted"], hb["rowid_sorted"], hb["xv_sorted"],
            hb["tile_base"], hb["labels_padded"],
            hb["row_mask_padded"] / n_valid, w0,
            n_k=8, b_pad=bh, n_rows=capacity, exact=False)
        return jnp.sum(stats), jnp.sum(gr)

    attempt("half0", jax.jit(one_half), rows, dev["halves"][0])

    # 2) both fused calls in one jit (no optimizer)
    def both_halves(rows, b):
        tot, g = jnp.float32(0.0), jnp.float32(0.0)
        for hb in b["halves"]:
            s2, g2 = one_half(rows, hb)
            tot, g = tot + s2, g + g2
        return tot, g

    attempt("both_halves", jax.jit(both_halves), rows, dev)

    # 2b) bisect what the core adds: the [R, 32] slice + padding-row zero
    def rows_slice(pulled, b):
        rows2 = pulled[:, :K.D]
        rows2 = rows2.at[capacity - 1].set(0.0)
        return both_halves(rows2, b)

    # 2c) the adagrad tail on the summed grads (rows arg directly)
    def opt_tail(rows2, acc, b):
        grad = jnp.zeros((capacity, K.D))
        tot = jnp.float32(0.0)
        for hb in b["halves"]:
            bh = hb["labels_padded"].shape[0]
            stats, gr = K.fm_fused_step(
                rows2, hb["ranks_sorted"], hb["rowid_sorted"],
                hb["xv_sorted"], hb["tile_base"], hb["labels_padded"],
                hb["row_mask_padded"] / jnp.float32(B), w0,
                n_k=8, b_pad=bh, n_rows=capacity, exact=False)
            tot = tot + jnp.sum(stats[:, K.S - 1])
            grad = grad + gr
        m = (jnp.arange(capacity) < 34000).astype(jnp.float32)[:, None]
        g = grad * m
        acc_new = acc + g * g
        rows_new = rows2 - 0.05 * g / (jnp.sqrt(acc_new) + 1e-7)
        return jnp.concatenate([rows_new, acc_new], axis=1), tot

    # 3) the full splitfused core (decomp control)
    pulled = jnp.asarray(
        rng.normal(size=(capacity, 32)).astype(np.float32) * 0.01)

    attempt("rows_slice", jax.jit(rows_slice), pulled, dev)
    attempt("opt_tail", jax.jit(opt_tail), rows, pulled[:, K.D:], dev)

    # 2d..2f) close the remaining gap to the core one delta at a time:
    # dynamic n_unique mask, traced n_valid denominator, w0 updates
    def core_manual(pulled, b, dyn_mask, traced_nvalid, w0_upd):
        rows2 = pulled[:, :K.D]
        acc = pulled[:, K.D:]
        rows2 = rows2.at[capacity - 1].set(0.0)
        if traced_nvalid:
            n_valid = jnp.maximum(jnp.sum(b["row_mask_padded"]), 1.0)
        else:
            n_valid = jnp.float32(B)
        loss = jnp.float32(0.0)
        g0 = jnp.float32(0.0)
        grad = jnp.zeros_like(rows2)
        for hb in b["halves"]:
            bh = hb["labels_padded"].shape[0]
            stats, gr = K.fm_fused_step(
                rows2, hb["ranks_sorted"], hb["rowid_sorted"],
                hb["xv_sorted"], hb["tile_base"], hb["labels_padded"],
                hb["row_mask_padded"] / n_valid, w0,
                n_k=8, b_pad=bh, n_rows=capacity, exact=False)
            loss = loss + jnp.sum(stats[:, K.S - 1])
            g0 = g0 + jnp.sum(stats[:, 0])
            grad = grad + gr
        if dyn_mask:
            m = (jnp.arange(capacity)
                 < b["n_unique"]).astype(jnp.float32)[:, None]
        else:
            m = (jnp.arange(capacity) < 34000).astype(jnp.float32)[:, None]
        g = grad * m
        acc_new = acc + g * g
        rows_new = rows2 - 0.05 * g / (jnp.sqrt(acc_new) + 1e-7)
        outp = jnp.concatenate([rows_new, acc_new], axis=1)
        if w0_upd:
            w0a_new = jnp.float32(0.0) + g0 * g0
            w0_new = w0 - 0.05 * g0 / (jnp.sqrt(w0a_new) + 1e-7)
            return outp, loss, w0_new
        return outp, loss

    # 2d-pre) the two smallest deltas between opt_tail (ok) and
    # manual_static (crash): g0 = sum(stats[:, 0]); rows sliced from the
    # [R, 32] pulled buffer (+ padding-row zero) with acc the other half
    def ot_g0(rows2, acc, b):
        outp, tot = opt_tail(rows2, acc, b)
        g0 = jnp.float32(0.0)
        for hb in b["halves"]:
            bh = hb["labels_padded"].shape[0]
            stats, _ = K.fm_fused_step(
                rows2, hb["ranks_sorted"], hb["rowid_sorted"],
                hb["xv_sorted"], hb["tile_base"], hb["labels_padded"],
                hb["row_mask_padded"] / jnp.float32(B), w0,
                n_k=8, b_pad=bh, n_rows=capacity, exact=False)
            g0 = g0 + jnp.sum(stats[:, 0])
        return outp, tot, g0

    def ot_pulled(pulled, b):
        rows2 = pulled[:, :K.D]
        rows2 = rows2.at[capacity - 1].set(0.0)
        return opt_tail(rows2, pulled[:, K.D:], b)

    attempt("ot_pulled", jax.jit(ot_pulled), pulled, dev)
    attempt("ot_g0", jax.jit(ot_g0), rows, pulled[:, K.D:], dev)

    # 2d-fix) workaround candidates for the ot_pulled crash: which part
    # of slice + zero-row DUS + optimizer does the compiler choke on,
    # and does an optimization_barrier (or a multiply-mask zero) dodge it?
    def ot_pulled_nz(pulled, b):
        return opt_tail(pulled[:, :K.D], pulled[:, K.D:], b)

    def ot_pulled_mulz(pulled, b):
        rows2 = pulled[:, :K.D]
        keep = (jnp.arange(capacity) != capacity - 1)
        rows2 = rows2 * keep.astype(rows2.dtype)[:, None]
        return opt_tail(rows2, pulled[:, K.D:], b)

    def ot_pulled_bar(pulled, b):
        rows2 = pulled[:, :K.D]
        rows2 = rows2.at[capacity - 1].set(0.0)
        rows2, acc = jax.lax.optimization_barrier(
            (rows2, pulled[:, K.D:]))
        return opt_tail(rows2, acc, b)

    attempt("ot_pulled_nz", jax.jit(ot_pulled_nz), pulled, dev)
    attempt("ot_pulled_mulz", jax.jit(ot_pulled_mulz), pulled, dev)
    attempt("ot_pulled_bar", jax.jit(ot_pulled_bar), pulled, dev)

    attempt("manual_static", jax.jit(
        lambda p, b: core_manual(p, b, False, False, False)), pulled, dev)
    attempt("manual_dynmask", jax.jit(
        lambda p, b: core_manual(p, b, True, False, False)), pulled, dev)
    attempt("manual_nvalid", jax.jit(
        lambda p, b: core_manual(p, b, True, True, False)), pulled, dev)
    attempt("manual_full", jax.jit(
        lambda p, b: core_manual(p, b, True, True, True)), pulled, dev)

    @jax.jit
    def core(pulled, b):
        packed_new, w0n, w0an, loss = fm_kernel._packed_rank_core(
            cfg, pulled, b, b_pad, capacity, w0, jnp.float32(0.0),
            cfg.learning_rate, cfg.l2)
        return packed_new, loss

    attempt("core", core, pulled, dev)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

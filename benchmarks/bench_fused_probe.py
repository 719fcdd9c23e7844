"""Isolate the fm_fused_step compile failure at production shapes (r4).

The fused two-phase kernel compiles and runs at the full-batch shape
(b_pad=1024, R=9216) but tpu_compile_helper crashes (HTTP 500, exit 1)
at the production zipf shape (b_pad=4096, R=34816, n=262144). Probe the
two axes separately to find the cliff.

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python -u benchmarks/bench_fused_probe.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.ops import fm_fused_pallas as K

    rng = np.random.default_rng(0)
    out = {}

    # (label, b_pad, n_rows R, n positions)
    shapes = [
        ("fullbatch_like", 1024, 9216, 245760),
        ("big_R", 1024, 34816, 245760),
        ("big_bpad", 4096, 9216, 245760),
        ("production", 4096, 34816, 262144),
        # bisect the b_pad cliff: if 2048 compiles, a half-batch split
        # (two fused calls over the shared rank space) covers B=4096
        ("bpad2048", 2048, 34816, 262144),
        ("bpad1536", 1536, 34816, 262144),
    ]
    for label, b_pad, R, n in shapes:
        ranks = np.sort(rng.integers(0, R - 1, n)).astype(np.int32)
        rowid = rng.integers(0, b_pad, n).astype(np.int32)
        xv = rng.random(n).astype(np.float32)
        # tile_base: first-rank block (of TILE rows) per 512-position tile
        tb = (ranks[::512] // 512).astype(np.int32)
        rows = (rng.normal(size=(R, 32)).astype(np.float32) * 0.01)[:, :16]
        labels_p = rng.integers(0, 2, b_pad).astype(np.float32)
        rmask = np.ones(b_pad, np.float32) / b_pad
        t0 = time.perf_counter()
        try:
            stats, grad = K.fm_fused_step(
                jnp.asarray(rows), jnp.asarray(ranks), jnp.asarray(rowid),
                jnp.asarray(xv), jnp.asarray(tb), jnp.asarray(labels_p),
                jnp.asarray(rmask), jnp.float32(0.0),
                n_k=8, b_pad=b_pad, n_rows=R, exact=False)
            float(jnp.sum(stats))
            out[label] = {"ok": True,
                          "compile_s": round(time.perf_counter() - t0, 1)}
            # warm timing
            t0 = time.perf_counter()
            for _ in range(50):
                stats, grad = K.fm_fused_step(
                    jnp.asarray(rows), jnp.asarray(ranks),
                    jnp.asarray(rowid), jnp.asarray(xv), jnp.asarray(tb),
                    jnp.asarray(labels_p), jnp.asarray(rmask),
                    jnp.float32(0.0), n_k=8, b_pad=b_pad, n_rows=R,
                    exact=False)
            float(jnp.sum(stats))
            out[label]["step_ms"] = round(
                (time.perf_counter() - t0) / 50 * 1e3, 3)
        except Exception as e:                         # noqa: BLE001
            out[label] = {"ok": False, "error": str(e)[:200]}
        print(json.dumps({label: out[label]}), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

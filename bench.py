"""Benchmark: FM rank-8 full-batch training on the bundled sparse CTR data.

Mirrors the reference's headline benchmark (BASELINE.md: LightCTR trains FM
k=8 for 1000 full-batch epochs over the 1000-row train_sparse.csv in 9.32 s
on an AVX CPU => ~107,296 examples/sec). Same data, same model size, same
full-batch Adagrad regime, run through the fused Pallas kernel trainer
(models/fm_kernel.py: blocked one-hot MXU gather/reduce/scatter over the
position-trimmed sorted layout — see ops/fm_fused_pallas.py).

Extra fields on the same single JSON line:
  step_ms                      headline step time
  mxu_util_pct                 algorithmic one-hot-matmul FLOPs of the step
                               over v5e bf16 peak (197 TFLOP/s) — a roofline
                               honesty number, NOT hardware-counter MFU
  production_examples_per_sec  streaming regime B=4096, L=64, 10M vocab
                               (the scale the reference needs its PS
                               cluster for). Measured in a BOUNDED
                               subprocess BEFORE the headline claims the
                               TPU: cold Mosaic compiles over the tunnel
                               can take many minutes, and a hung compile
                               must never suppress the primary metric
                               (fields are null when skipped).

Timing note: this backend's block_until_ready does not await real
completion, so loops are chained through the training state and forced
with a scalar readback of the final loss.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


REFERENCE_FM_EXAMPLES_PER_SEC = 1000 * 1000 / 9.32  # BASELINE.md vs_libfm k=8
V5E_BF16_PEAK_FLOPS = 197e12
PRODUCTION_TIMEOUT_S = int(os.environ.get("BENCH_PRODUCTION_TIMEOUT", "1500"))


def production_main():
    """Streaming kernel FM at PS scale (B=4096, L=64, 10M vocab), two
    traffic shapes:
      uniform — worst case: ~99% of the B*L ids unique per batch, so the
                master-table pull/push touches ~260k rows/step
      zipf    — realistic CTR traffic (power-law ids, like the bundled
                Criteo-style data): far smaller per-batch working set
    """
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import fm_kernel

    B, L, vocab = 4096, 64, 10_000_000
    rng = np.random.default_rng(0)
    ones = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False
    )
    out = {}
    for name, ids in (
        ("", rng.integers(0, vocab, (B, L)).astype(np.int64)),
        ("zipf_", np.minimum(rng.zipf(1.2, (B, L)) - 1,
                             vocab - 1).astype(np.int64)),
    ):
        plan = fm_kernel.plan_batch(ids, ones, ones, labels)
        capacity = plan.n_rows_pad
        # packed [V, 32] master layout: ONE row-gather + ONE row-scatter
        # per step (XLA gather/scatter at vocab scale is per-row bound —
        # benchmarks/bench_gather_cost.py)
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step_packed(
            cfg, capacity, plan.b_pad)
        arrays = fm_kernel.plan_to_arrays(plan, capacity)
        state, loss = step(state, arrays)
        float(loss)
        n = 100
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state, arrays)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        out[f"production_{name}examples_per_sec"] = round(B / dt, 1)
        out[f"production_{name}step_ms"] = round(dt * 1e3, 3)
        if name:
            out[f"production_{name}unique_rows"] = int(plan.n_unique)
    print(json.dumps(out))


def run_production_subprocess():
    try:
        out = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--production"],
            capture_output=True, text=True, timeout=PRODUCTION_TIMEOUT_S,
            env=os.environ,
        )
        for line in reversed(out.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError, OSError):
        pass
    return {"production_examples_per_sec": None, "production_step_ms": None}


def main():
    prod = run_production_subprocess()

    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.ops.embedding_pallas import TILE
    from lightctr_tpu.ops.fm_fused_pallas import D, S

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    batch_size = len(ds)  # full-batch, like the reference (train_fm_algo.cpp:38)

    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=8, learning_rate=0.05, fine=True
    )
    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels, fine=True
    )
    state = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = fm_kernel.make_train_step(cfg, plan)

    # warmup/compile
    state, loss = step(state)
    float(loss)

    n_steps = 500
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state)
    final_loss = float(loss)  # forces the dependent chain to finish
    dt = (time.perf_counter() - t0) / n_steps

    examples_per_sec = batch_size / dt
    if not np.isfinite(final_loss) or final_loss > 0.7:
        print(json.dumps({"metric": "fm_examples_per_sec_per_chip", "value": 0.0,
                          "unit": "examples/sec", "vs_baseline": 0.0,
                          "error": f"training diverged (loss={final_loss})"}))
        sys.exit(1)

    # roofline estimate: the step's 4 one-hot matmuls (gather, row-reduce,
    # duals-gather, scatter) over the trimmed sorted layout (fine=True:
    # 5x128-row windows instead of 2x512)
    n = plan.ranks_sorted.shape[0]
    window = 5 * 128 if cfg.fine else 2 * TILE
    macs = 2 * n * (window * D + plan.b_pad * S)
    mxu_util = (2 * macs / dt) / V5E_BF16_PEAK_FLOPS * 100

    print(json.dumps({
        "metric": "fm_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / REFERENCE_FM_EXAMPLES_PER_SEC, 3),
        "step_ms": round(dt * 1e3, 3),
        "mxu_util_pct": round(mxu_util, 1),
        **prod,
    }))


if __name__ == "__main__":
    if "--production" in sys.argv:
        production_main()
    else:
        main()

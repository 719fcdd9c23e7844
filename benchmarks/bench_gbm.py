"""GBM training benchmark vs the reference's TEST_GBM configuration.

Reference (instrumented build, /tmp/refprobe, -DNDEBUG — its split-stat
assert is an always-false float==double comparison, so the binary only
runs with asserts off): Train_GBM_Algo on data/train_dense.csv
(2221 rows x 784, 10 classes), maxDepth 12, 10 boosting rounds of K=10
trees = **13.14 s** on this host (1.31 s/round), train accuracy 0.971.

Ours: models/gbm.py — quantile-binned device histograms, vectorized
level-wise growth (exact splits in the reference vs 32-bin histograms
here: the XGBoost-style approximation the reference's own lineage uses).
Same data, same depth budget, same rounds.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python benchmarks/bench_gbm.py
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_gbm.py
"""

import json
import time

import numpy as np

REF_SECONDS_10_ROUNDS = 13.14


def main():
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data.dense import load_dense_csv
    from lightctr_tpu.models.gbm import GBM, GBMConfig

    x, y, k = load_dense_csv("/root/reference/data/train_dense.csv",
                             scale=1.0)
    print(f"rows={len(x)} features={x.shape[1]} classes={k} "
          f"backend={jax.default_backend()}", flush=True)

    cfg = GBMConfig(n_rounds=10, max_depth=12, n_classes=k, n_bins=32,
                    learning_rate=0.3, subsample=0.7, colsample=0.7)
    model = GBM(cfg)
    t0 = time.perf_counter()
    model.fit(x, y)
    dt = time.perf_counter() - t0
    acc = float((model.predict(x) == y).mean())
    out = {
        "gbm_seconds_10_rounds": round(dt, 2),
        "train_accuracy": round(acc, 4),
        "vs_reference": round(REF_SECONDS_10_ROUNDS / dt, 2),
        "backend": jax.default_backend(),
    }
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

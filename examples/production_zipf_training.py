"""Production-regime recipe: stream skewed (zipf) traffic against a
vocab-scale master with the range-partitioned engine, then dataset-score
with the scan scorer.

This is the end-to-end shape the reference needs its ParamServer cluster
for (/root/reference/LightCTR/distributed_algo_abst.h:176-280: per-batch
pull/push against a sharded vocab KV) condensed to one chip: the
partitioned packed master gives the zipf hot head small-table scatter
rates (PARITY.md partitioned-master row, 469k ex/s at the full
B=4096/L=64/10M-vocab shape), and scoring stacks K batches per dispatch.

Defaults are TINY so the script runs on CPU in seconds (the CI smoke
test runs it exactly so); scale the flags up on a TPU:

    # CPU smoke (seconds)
    JAX_PLATFORMS=cpu PYTHONPATH=. python examples/production_zipf_training.py

    # production shape on the chip (PARITY.md's measured regime)
    PYTHONPATH=.:/root/.axon_site python examples/production_zipf_training.py \
        --vocab 10000000 --rows 65536 --batch-size 4096 --length 64
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--rows", type=int, default=2_048)
    ap.add_argument("--length", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--scan", type=int, default=4)
    args = ap.parse_args()

    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.models import fm
    from lightctr_tpu.serve.scorer import batch_score
    from lightctr_tpu.train.kernel_engine import train_fm_kernel
    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # ---- synthesize zipf CTR traffic: power-law ids, planted signal
    rng = np.random.default_rng(0)
    n, L, V = args.rows, args.length, args.vocab
    ids = np.minimum(rng.zipf(args.zipf, (n, L)) - 1, V - 1).astype(np.int64)
    # planted rule: rows touching the hottest 32 ids lean positive —
    # centered on the MEDIAN hot-count so the classes stay balanced at
    # every vocab/zipf shape (at 10M-vocab zipf almost every row touches
    # hot ids; an absolute threshold saturates to one class)
    hot = (ids < 32).sum(axis=1)
    center = np.median(hot)
    labels = (rng.random(n)
              < 1 / (1 + np.exp(center - hot))).astype(np.float32)
    ds = SparseDataset(
        ids=ids,
        vals=np.ones((n, L), np.float32),
        fields=np.zeros((n, L), np.int64),
        mask=np.ones((n, L), np.float32),
        labels=labels,
        nnz=np.full((n,), L, np.int32),
        n_features=V,
        n_fields=1,
    )

    # ---- train: the partitioned streaming engine (binary-CTR data with
    # full batches auto-selects the ids+labels-only wire)
    params, losses = train_fm_kernel(
        ds, factor=args.factor, learning_rate=0.1, l2=1e-6,
        epochs=args.epochs, batch_size=args.batch_size, partitioned=True,
        log=lambda m: print(f"[train] {m}", flush=True),
    )

    # ---- score: K stacked batches per device dispatch
    cfg = fm.FMConfig(n_features=V, factor=args.factor)
    metrics = batch_score(fm, cfg, params, ds,
                          batch_size=args.batch_size, scan=args.scan)
    print("[score] " + json.dumps(metrics), flush=True)
    assert losses[-1] <= losses[0], "training did not reduce the loss"
    print(f"[done] epochs={args.epochs} final_loss={losses[-1]:.5f} "
          f"auc={metrics['auc']:.4f}", flush=True)


if __name__ == "__main__":
    main()

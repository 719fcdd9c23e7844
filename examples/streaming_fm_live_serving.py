"""End-to-end example: streaming FM training with LIVE serving via the
native shared-memory parameter KV.

The reference's deployment story for online models is a shared-memory
parameter table on each serving host (util/shm_hashtable.h: "shared
parameters KV store in physical nodes", README.md:12). This example is
that capability on the TPU build:

  1. a TRAINER process streams minibatches through the fused one-dispatch
     kernel FM step (vocab-space master table, per-batch device planning —
     models/fm_kernel.py), and after every epoch publishes the touched
     rows into a POSIX shared-memory KV (csrc/shm_kv.cpp via
     utils/shm_kv.ShmKV — CAS key claims, per-slot seqlocks);
  2. a SCORER process attaches to the same segment by name and scores the
     test set against whatever parameters are live *right now* — no files,
     no checkpoints, no RPC. Each refresh waits for a newer publish
     (seqlock'd epoch-counter row), so the log is the live quality
     trajectory. (The bundled 200-row test set swings test AUC 0.43-0.62
     on seed alone — see PARITY.md — so the mechanics, not the absolute
     AUC, are the point.)

Run (CPU is fine — the streaming step here uses the design-matrix (xmat)
formulation, pure XLA):

    python examples/streaming_fm_live_serving.py
"""

import argparse
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEG = os.environ.get("LIGHTCTR_LIVE_SEG", "/lightctr_live_fm_example")
# reserved metadata keys, far above any feature id (the KV itself
# reserves -1 as its EMPTY slot sentinel and rejects it)
W0_KEY = 1 << 62          # the global bias row
EPOCH_KEY = (1 << 62) + 1  # row[0] = number of publishes so far


def scorer_proc(test_path, n_features, n_fields, factor, n_refresh, out_q):
    """Attach to the live segment and score the test set repeatedly."""
    # the scorer is numpy-only; pin any (pre-)imported jax to CPU so the
    # child never opens a second client against a single-tenant TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.utils.metrics import auc as auc_fn
    from lightctr_tpu.utils.shm_kv import ShmKV

    ds = load_libffm(test_path, n_features=n_features, n_fields=n_fields)
    ids = np.asarray(ds.ids)
    xv = np.asarray(ds.vals) * np.asarray(ds.mask)
    labels = np.asarray(ds.labels)

    kv = ShmKV(SEG, create=False)
    for i in range(n_refresh):
        # wait until the trainer has published a NEWER snapshot than the
        # one this refresh is for (seqlock'd row, so the read is atomic)
        while True:
            e = kv.get(EPOCH_KEY)
            if e is not None and e[0] >= i + 1:
                break
            time.sleep(0.05)
        rows, _found = kv.get_batch(ids.reshape(-1))
        rows = rows.reshape(ids.shape + (1 + factor,))  # missing -> zeros
        w0 = kv.get(W0_KEY)
        w0 = float(w0[0]) if w0 is not None else 0.0
        wx = np.sum(rows[..., 0] * xv, axis=1)
        vx = rows[..., 1:] * xv[..., None]              # [B, L, K]
        s = vx.sum(axis=1)
        z = w0 + wx + 0.5 * (np.sum(s * s, -1) - np.sum(vx * vx, (1, 2)))
        a = float(auc_fn(1.0 / (1.0 + np.exp(-z)), labels))
        out_q.put((i, len(kv), a))
    kv.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default="/root/reference/data/train_sparse.csv")
    ap.add_argument("--test", default="/root/reference/data/test_sparse.csv")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=250)
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    args = ap.parse_args()

    import jax

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.utils.shm_kv import ShmKV

    ds = load_libffm(args.train)
    B, L = args.batch_size, ds.ids.shape[1]
    assert len(ds) % B == 0, "example expects batch_size | rows"

    # fused one-dispatch streaming step, design-matrix formulation
    # (pure XLA — runs anywhere); capacity must exceed per-batch uniques
    from lightctr_tpu.ops.embedding_pallas import TILE

    capacity = ((B * L + TILE) // TILE + 1) * TILE
    b_pad = max(128, 1 << (B - 1).bit_length())
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=args.factor,
        learning_rate=args.lr, l2=1e-4, xmat=True,
    )
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step_fused(cfg, capacity, b_pad)

    # the live segment: capacity for every id the data can touch + bias
    kv = ShmKV(SEG, capacity=2 * len(np.unique(ds.ids)) + 16,
               dim=1 + args.factor, create=True)
    uids = np.unique(ds.ids.reshape(-1)).astype(np.int64)

    # spawn, not fork: JAX is multithreaded and a forked child deadlocks
    ctx = mp.get_context("spawn")
    out_q = ctx.Queue()
    scorer = ctx.Process(
        target=scorer_proc,
        args=(args.test, ds.n_features, ds.n_fields, args.factor,
              args.epochs, out_q),
    )

    import queue as _queue

    rng = np.random.default_rng(0)
    scorer.start()  # blocks on EPOCH_KEY until the first publish
    seen = []
    try:
        for epoch in range(args.epochs):
            order = rng.permutation(len(ds))
            losses = []
            for s0 in range(0, len(ds), B):
                rows_idx = order[s0 : s0 + B]
                state, loss = step(
                    state,
                    jax.numpy.asarray(ds.ids[rows_idx]),
                    jax.numpy.asarray(ds.vals[rows_idx]),
                    jax.numpy.asarray(ds.mask[rows_idx]),
                    jax.numpy.asarray(ds.labels[rows_idx]),
                    jax.numpy.asarray(np.ones((B,), np.float32)),
                )
                losses.append(float(loss))
            # publish this epoch's table rows + bias into the live segment
            table = np.asarray(
                jax.device_get(state.packed[uids, : 1 + args.factor])
            )
            kv.put_batch(uids, table)
            w0row = np.zeros((1 + args.factor,), np.float32)
            w0row[0] = float(state.w0)
            kv.put(W0_KEY, w0row)
            erow = np.zeros((1 + args.factor,), np.float32)
            erow[0] = epoch + 1
            kv.put(EPOCH_KEY, erow)
            # lock-step with the scorer: each publish is scored before
            # the next epoch trains, so the refresh log IS the live
            # quality trajectory
            i, n_rows, a = out_q.get(timeout=300)
            seen.append((i, n_rows, a))
            print(f"epoch {epoch}: train_loss={np.mean(losses):.5f} | "
                  f"scorer refresh {i}: live rows={n_rows} "
                  f"test_auc={a:.4f}")

        scorer.join(timeout=60)
        assert len(seen) == args.epochs, "scorer missed a refresh"
    finally:
        if scorer.is_alive():
            scorer.terminate()
        kv.close(unlink=True)


if __name__ == "__main__":
    main()

"""End-to-end example: sharded Wide&Deep training + two-stage serving.

Demonstrates the flagship production path:
  1. libffm data via the native C++ parser
  2. (data x model) mesh; embedding tables row-sharded (PS replacement),
     batch data-parallel (Ring-AllReduce replacement)
  3. jitted SPMD train step with co-located optimizer state
  4. checkpoint save/restore
  5. serving: batch scoring + MIPS candidate retrieval

Run without a pod:
    python examples/train_widedeep_sharded.py --cpu-devices 8
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default="/root/reference/data/train_sparse.csv")
    ap.add_argument("--test", default="/root/reference/data/test_sparse.csv")
    ap.add_argument("--mesh", default="4x2")
    ap.add_argument("--cpu-devices", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=256,
                    help="must be a multiple of the mesh data axis")
    ap.add_argument("--ckpt", default="/tmp/widedeep_ckpt")
    args = ap.parse_args()

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    from lightctr_tpu import optim
    from lightctr_tpu.data import sparse_batches
    from lightctr_tpu.data.native import load_libffm_native
    from lightctr_tpu.models import widedeep
    from lightctr_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        partition_batch,
    )
    from lightctr_tpu.parallel.distributed import initialize_cluster
    from lightctr_tpu.parallel.sharding import init_sharded_state, round_up_vocab
    from lightctr_tpu.serve.ann import MIPSIndex
    from lightctr_tpu.serve.scorer import batch_score
    from lightctr_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from lightctr_tpu.utils.profiling import StepTimer

    info = initialize_cluster()
    print(f"cluster: {info}")

    train_ds = load_libffm_native(args.train)
    n_features = round_up_vocab(train_ds.n_features)
    test_ds = load_libffm_native(
        args.test, n_features=train_ds.n_features, n_fields=train_ds.n_fields
    )
    print(f"data: {len(train_ds)} train rows, vocab {n_features}")

    d, m = (int(x) for x in args.mesh.split("x"))
    mesh = make_mesh(data=d, model=m)
    cfg = widedeep.WideDeepConfig(
        n_features=n_features, n_fields=train_ds.n_fields, embed_dim=8, hidden=(50,)
    )
    tx = optim.chain(optim.clip_by_value(15.0), optim.adam(2e-3))
    state = init_sharded_state(widedeep, cfg, tx, mesh, seed=0)
    step = make_sharded_train_step(widedeep, cfg, tx, mesh)

    timer = StepTimer(batch_size=args.batch_size, window=4)
    rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        losses = []
        for b in sparse_batches(train_ds, args.batch_size, rng=rng):
            state, loss = step(state, partition_batch(b, mesh))
            losses.append(loss)
            if timer.tick():
                float(loss)
                print("  " + timer.report())
        print(f"epoch {epoch}: loss={float(np.mean([float(l) for l in losses])):.5f}")

    save_checkpoint(args.ckpt, jax.device_get(state.params), {"epoch": args.epochs})
    print(f"checkpoint -> {args.ckpt}.npz")
    restored = load_checkpoint(args.ckpt, jax.device_get(state.params))
    print("restore ok:", np.allclose(
        np.asarray(restored["embed"])[:8], np.asarray(state.params["embed"])[:8]))

    metrics = batch_score(widedeep, cfg, state.params, test_ds)
    print(f"test: {metrics}")

    # two-stage serve: retrieval over item embeddings sharded on `model`
    items = np.asarray(state.params["embed"])[:4096]
    index = MIPSIndex(items, mesh=mesh)
    scores, ids = index.query(items[:4], k=5)
    print(f"MIPS top-5 for 4 probes: {np.asarray(ids).tolist()}")


if __name__ == "__main__":
    main()

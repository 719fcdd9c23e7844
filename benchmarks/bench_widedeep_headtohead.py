"""Distributed W&D head-to-head: the reference's flagship PS cluster
vs one TPU chip (VERDICT r2 quality-table gap; BASELINE.json's center).

THE REFERENCE CLUSTER ACTUALLY RAN (round 3): the tree vendors zmq.h
(LightCTR/third/zeromq/include) and this image ships libzmq.so.5, so
the real MASTER/PS/WORKER binaries build and form a loopback cluster
(/tmp/run_ps_cluster.sh recipe; master at LightCTR_MASTER_ADDR —
WITHOUT a tcp:// prefix, network.h:36 prepends it). Measured on this
host, W&D on the bundled 1000-row sparse data (embed 4, tower
272->50 tanh ->1, batch 50, lr 0.05, PS-side SGD — main.cpp:64-73,
distributed_algo_abst.h:93-117), 30 epochs:

  1 PS + 1 worker : 98.7 s wall (3.29 s/epoch), final train
                    loss/row 0.099-0.115, accuracy 0.960-0.962
  1 PS + 2 workers: 186.1 s (1.9x SLOWER than 1 worker) — loopback
                    PS contention + SSP spin; final acc 0.980/0.963
                    on the two shards
  2 PS            : workers ABORT with NaN in the first FC forward
                    (fullyconnLayer.h:103) — the multi-PS tensor path
                    is broken on this host out of the box
  1 PS + 4 workers: NO epoch completes in 10 minutes (livelock)
  (every worker also aborts at teardown on the MemoryPool leak
  assertion after printing "Train Task Complete")

OURS (this file): the same model/hypers on ONE v5e chip, no cluster.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_widedeep_headtohead.py
"""

import json
import time

REF = {
    "1ps_1worker_wall_s": 98.7,
    "1ps_2workers_wall_s": 186.1,
    "2ps": "NaN crash, batch 1",
    "1ps_4workers": "no epoch in 10 min",
    "final_train_acc": "0.960-0.962 (1 worker)",
}


def main():
    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu import optim
    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import widedeep
    from lightctr_tpu.train.loop import evaluate, train_model

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    test = load_libffm("/root/reference/data/test_sparse.csv",
                       n_features=ds.n_features, n_fields=ds.n_fields)
    cfg = widedeep.WideDeepConfig(
        n_features=ds.n_features, n_fields=ds.n_fields, embed_dim=4,
        hidden=(50,), activation="tanh")
    out = {"reference": REF}

    for name, tx in (("sgd_matched", optim.sgd(0.05)),
                     ("adagrad_ours", optim.adagrad(0.1))):
        train_model(widedeep, cfg, ds, tx, epochs=1, batch_size=50,
                    seed=0, log=None)            # warm compile
        t0 = time.perf_counter()
        state = train_model(widedeep, cfg, ds, tx, epochs=30,
                            batch_size=50, seed=0, log=None)
        wall = time.perf_counter() - t0
        m = evaluate(widedeep, cfg, state.params, ds, 250)
        mt = evaluate(widedeep, cfg, state.params, test, 250)
        out[name] = {
            "wall_s": round(wall, 2),
            "speedup_vs_1worker": round(REF["1ps_1worker_wall_s"] / wall, 1),
            "train_acc": round(m["accuracy"], 4),
            "train_auc": round(m["auc"], 4),
            "test_auc": round(mt["auc"], 4),
        }
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""GMM head-to-head vs the reference -DTEST_GMM binary on its REAL data.

Round-2 PARITY.md claimed this comparison was impossible ("empty
train_cluster.csv") — WRONG (advisor r2): the file holds 10,000
whitespace-separated floats with no newline characters, so line counts
show 0 but the reference loader (em_algo_abst.h:58-90, sscanf over one
getline'd blob, flushing every feature_cnt=10 values) parses 1000 rows
x 10 features fine. Measured here (this host, 4 threads, /tmp/refprobe
build run from its own root so ./data/train_cluster.csv resolves):

  PROBE_SEED=7: 25 epochs (converged), 0.365 s, final ELOB -44247.68
  PROBE_SEED=1: 50 epochs (cap),       0.646 s, final ELOB -44310.31
  PROBE_SEED=2: 23 epochs (converged), 0.312 s, final ELOB -46377.76
  PROBE_SEED=3: 50 epochs (cap),       0.631 s, final ELOB -44249.54

Ours: models/gmm.py fit_scan — the whole EM loop is ONE compiled
program (device-side lax.while_loop, reference convergence semantics:
|total ll delta| <= 1e-3, cap 50), timed warm with a scalar readback.

    python benchmarks/bench_gmm_headtohead.py
"""

import json
import time

import numpy as np

REF_RUNS = {  # seed -> (epochs, wall_s, final_total_ll)
    7: (25, 0.365, -44247.68),
    1: (50, 0.646, -44310.31),
    2: (23, 0.312, -46377.76),
    3: (50, 0.631, -44249.54),
}


def load_cluster_csv(path="/root/reference/data/train_cluster.csv", dim=10):
    vals = np.fromstring(open(path).read(), sep=" ", dtype=np.float32)
    n = (len(vals) // dim) * dim
    return vals[:n].reshape(-1, dim)


def main():
    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import gmm

    x = load_cluster_csv()
    out = {"rows": int(x.shape[0]), "dim": int(x.shape[1])}

    runs = []
    for seed in (0, 1, 2, 3):
        cfg = gmm.GMMConfig(n_clusters=100, dim=10, seed=seed)
        # warm compile (shapes identical across seeds -> one compile)
        state, ll, ep = gmm.fit_scan(x, cfg, epochs=50, tol_total=1e-3)
        t0 = time.perf_counter()
        state, ll, ep = gmm.fit_scan(x, cfg, epochs=50, tol_total=1e-3)
        dt = time.perf_counter() - t0
        runs.append({"seed": seed, "epochs": ep, "wall_s": round(dt, 4),
                     "final_total_ll": round(ll, 2)})
        print("ours", runs[-1], flush=True)

    out["ours"] = runs
    out["reference"] = [
        {"seed": s, "epochs": e, "wall_s": w, "final_total_ll": ll}
        for s, (e, w, ll) in REF_RUNS.items()
    ]
    ref_per_epoch = np.mean([w / e for e, w, _ in REF_RUNS.values()])
    our_per_epoch = np.mean([r["wall_s"] / max(r["epochs"], 1) for r in runs])
    out["ref_ms_per_epoch"] = round(ref_per_epoch * 1e3, 3)
    out["our_ms_per_epoch"] = round(our_per_epoch * 1e3, 3)
    out["speedup_per_epoch"] = round(ref_per_epoch / our_per_epoch, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

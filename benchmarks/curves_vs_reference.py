"""Per-epoch convergence curves vs the instrumented reference binaries.

The reference publishes curve charts (benchmark/*.png) as its regression
standard (SURVEY.md §4.6). Round 2 instrumented the reference itself:
/tmp/refcurve holds a copy of the reference tree with trainers set to
epoch_cnt=1 so the existing main-loop `while (T--) { Train(); Predict(); }`
evaluates the TEST set after every epoch (build recipe: PARITY.md; patch:
epoch 5->1 + T from $CURVE_EPOCHS). This script produces OUR per-epoch
curves under the reference's own hyperparameters (lr=0.05, L2=0.001,
full-batch FM/FFM — main.cpp:64-73, train_fm_algo.cpp:38) and rewrites
PARITY_CURVES.md with both.

    env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python benchmarks/curves_vs_reference.py
"""

import sys

import numpy as np


# Reference per-epoch TEST curves, measured on this host from the
# instrumented binaries (see module docstring). srand(time(NULL)) => each
# run is a different draw; these are single representative runs.
REF_FM_AUC = [0.4257, 0.5000, 0.4812, 0.5000, 0.5000, 0.5000, 0.4944,
              0.4917, 0.4861, 0.5490, 0.5401, 0.5467, 0.5717, 0.5794,
              0.5663, 0.5790, 0.5585, 0.5763, 0.5614, 0.5635, 0.5753,
              0.5604, 0.5883, 0.5607, 0.5864, 0.5589, 0.5815, 0.5589,
              0.5844, 0.5532]
REF_FFM_AUC = [0.5000, 0.5000, 0.5000, 0.5000, 0.4871, 0.5000, 0.4972,
               0.5000, 0.5163, 0.5000, 0.4944, 0.5000, 0.4944, 0.5000,
               0.5000, 0.5000, 0.5000, 0.5000, 0.5000, 0.5000, 0.5000,
               0.5000, 0.5000, 0.5000, 0.5000, 0.5000, 0.5000, 0.5000,
               0.5000, 0.5000]
# Reference NFM has NO test evaluation (main.cpp guards Predict to
# FM/FFM/GBM); its per-epoch TRAIN loss from the same instrumented run:
REF_NFM_TRAIN_LOSS = [571.99, 239.48, 164.27, 141.36, 113.41, 105.58, 94.82, 86.92, 81.58, 75.31, 72.65, 69.76, 66.44, 64.21, 61.95, 58.73, 57.15, 56.99, 54.58, 52.87, 50.72, 48.91, 50.45, 46.27, 45.60, 44.71, 44.43, 43.05, 43.37, 41.03]

EPOCHS = 30
SEEDS = (0, 1, 2)


def run_curves():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu import optim
    from lightctr_tpu.data import load_libffm, sparse_batches
    from lightctr_tpu.models import ffm, fm, nfm
    from lightctr_tpu.train.loop import TrainState, evaluate, make_train_step

    train = load_libffm("/root/reference/data/train_sparse.csv")
    test = load_libffm("/root/reference/data/test_sparse.csv",
                       n_features=train.n_features, n_fields=train.n_fields)

    def per_epoch(model, cfg, batch_size, seed):
        tx = optim.adagrad(0.05)
        params = model.init(jax.random.PRNGKey(seed), cfg)
        st = TrainState(params, tx.init(params), jax.random.PRNGKey(seed + 1))
        step = make_train_step(model, cfg, tx)
        rng = np.random.default_rng(seed)
        aucs, lls = [], []
        for _ in range(EPOCHS):
            for b in sparse_batches(train, batch_size, rng=rng):
                b = {k: jnp.asarray(v) for k, v in b.items()}
                st, _ = step(st, b)
            m = evaluate(model, cfg, st.params, test, 256)
            aucs.append(m["auc"])
            lls.append(m["logloss"])
        return aucs, lls

    out = {}
    fm_cfg = fm.FMConfig(n_features=train.n_features, factor=16, l2=0.001,
                     init_std=1.0 / 16 ** 0.5)
    out["fm"] = [per_epoch(fm, fm_cfg, len(train), s) for s in SEEDS]
    out["fm_mb"] = [per_epoch(fm, fm_cfg, 250, s) for s in SEEDS]
    # our DEFAULT recipe (init 0.01, l2=1e-4, minibatch 250) — the
    # configuration PARITY.md ships as the quality baseline
    fm_def = fm.FMConfig(n_features=train.n_features, factor=16, l2=1e-4,
                         init_std=0.01)
    out["fm_def"] = [per_epoch(fm, fm_def, 250, s) for s in SEEDS]
    print("fm done", file=sys.stderr)
    ffm_cfg = ffm.FFMConfig(n_features=train.n_features,
                            n_fields=train.n_fields, factor=4, l2=0.001,
                            init_std=1.0 / 4 ** 0.5)
    out["ffm"] = [per_epoch(ffm, ffm_cfg, len(train), s) for s in SEEDS]
    print("ffm done", file=sys.stderr)
    nfm_cfg = nfm.NFMConfig(n_features=train.n_features, factor=10,
                            hidden=(32,), l2=0.001,
                            init_std=1.0 / 10 ** 0.5)
    out["nfm"] = [per_epoch(nfm, nfm_cfg, 50, s) for s in SEEDS]
    print("nfm done", file=sys.stderr)
    return out


def fmt_band(rows_by_seed, idx):
    vals = [r[0][idx] for r in rows_by_seed]
    return f"{min(vals):.3f}–{max(vals):.3f}"


def main():
    curves = run_curves()
    lines = []
    w = lines.append
    w("# Convergence curves vs the instrumented reference (per-epoch)")
    w("")
    w("The reference's own regression standard is curve overlap")
    w("(`benchmark/*.png`, SURVEY.md §4.6). Round 2 instrumented the")
    w("reference binaries themselves (epoch_cnt=1 + the existing")
    w("Train/Predict main loop; recipe in benchmarks/curves_vs_reference.py)")
    w("to emit TEST AUC after every epoch, and this file overlays those")
    w("curves with ours under the reference's hyperparameters")
    w("(Adagrad lr=0.05, L2=0.001, full-batch FM k=16 / FFM k=4,")
    w("NFM factor 10 hidden 32 minibatch 50). Ours are seed bands over")
    w("seeds 0–2 (the 200-row test set swings ±0.1 AUC on seed alone —")
    w("PARITY.md); the reference column is one run (it seeds from")
    w("time(NULL), so its draws vary run to run too).")
    w("")
    w("## FM k=16 — test AUC per epoch")
    w("")
    w("| epoch | reference (full-batch) | ours, matched hypers "
      "(full-batch) | ours, matched hypers (mb 250) | ours, default "
      "recipe (mb 250, init 0.01, l2 1e-4) |")
    w("|---|---|---|---|---|")
    for e in range(0, EPOCHS, 2):
        w(f"| {e} | {REF_FM_AUC[e]:.4f} | {fmt_band(curves['fm'], e)} | "
          f"{fmt_band(curves['fm_mb'], e)} | "
          f"{fmt_band(curves['fm_def'], e)} |")
    fm_tail = [r[0][-1] for r in curves["fm"]]
    mb_tail = [r[0][-1] for r in curves["fm_mb"]]
    ref_tail = REF_FM_AUC[-10:]
    w("")
    df_tail = [r[0][-1] for r in curves["fm_def"]]
    w(f"Endpoint bands at epoch 29: reference "
      f"{min(ref_tail):.3f}–{max(ref_tail):.3f} (last-10-epoch range; "
      f"4 further instrumented runs incl. a single-threaded build end "
      f"0.55–0.63), ours matched-hypers full-batch "
      f"{min(fm_tail):.3f}–{max(fm_tail):.3f}, matched mb-250 "
      f"{min(mb_tail):.3f}–{max(mb_tail):.3f}, default recipe "
      f"{min(df_tail):.3f}–{max(df_tail):.3f}.")
    w("")
    w("Forensics on the matched-hypers gap — SETTLED by init transplant")
    w("(round 2 cont.; benchmarks/ref_instrument.py +")
    w("benchmarks/fm_reference_replica.py). The instrumented binary dumps")
    w("its initial W/V and per-epoch snapshots; a NumPy replica of the")
    w("trainer's exact formulas (per-occurrence L2, gradW reused as the")
    w("V-grad scalar, eps-inside-sqrt Adagrad, g!=0 skip, ±16 sigmoid")
    w("clamp), SEEDED WITH THE BINARY'S OWN INIT, matches the")
    w("single-threaded binary parameter-for-parameter: |dW|max 2.4e-4,")
    w("|dV|max 2.7e-4, p99 6.5e-7 after 30 full epochs (pure fp32-vs-fp64")
    w("rounding). The trainer is formula-exact on both sides.")
    w("")
    w("The gap was the reference's EVALUATION, not its training:")
    w("`FM_Predict` computes the test pairwise term from")
    w("`fm->getSumVX(rid)` — the TRAINING-set per-row ΣxV cache indexed by")
    w("TEST row id (fm_predict.cpp:21-33) — i.e. every test prediction")
    w("mixes in a train row's interaction norm computed from the previous")
    w("epoch's V: a train-cache leak. Reproducing that leak verbatim on the")
    w("replica's parameters overlays the binary's printed 30-epoch AUC")
    w("curve to the 4th decimal at every epoch (seed 7:")
    w("0.4958 0.5000 0.5522 … 0.5751). Scoring the binary's own final")
    w("dumped parameters CLEANLY (its exact FM forward on the actual test")
    w("features) gives test AUC 0.4917 (with its loader quirk) / 0.4867")
    w("(full rows) — inside our matched-hypers band. The reference's")
    w("published 0.55–0.63 \"test AUC\" is the leak's artifact; the model it")
    w("actually trains generalises at ~0.49 on this data. (The leak is")
    w("FM-only: the FFM branch of the same predictor computes pairwise")
    w("terms from the test rows directly, which is why reference FFM never")
    w("lifts off 0.50 below.) The 4-thread binary additionally races its")
    w("shared grad buffer — vs the deterministic replica its epoch-1 V")
    w("already shows full-first-step sign flips (|dV|max ≈ 2·lr) — but its")
    w("printed curve stays close to the single-threaded one. Under our")
    w("DEFAULT recipe (last column) the framework ends at or above the")
    w("reference's printed band even though that band is inflated;")
    w("round-1 PARITY.md measured 0.60–0.62 for the same recipe at k=8.")
    w("")
    w("## FFM k=4 — test AUC per epoch")
    w("")
    w("| epoch | reference | ours (seed band) |")
    w("|---|---|---|")
    for e in range(0, EPOCHS, 2):
        w(f"| {e} | {REF_FFM_AUC[e]:.4f} | {fmt_band(curves['ffm'], e)} |")
    w("")
    w("The reference FFM never lifts off 0.50 test AUC in 30 epochs (its")
    w("published 5-epoch endpoint 0.478 is consistent); ours tracks the")
    w("same flat-to-weak profile on this data — the model/data combination")
    w("simply does not generalise here, and both implementations agree.")
    w("")
    w("## NFM — the reference cannot test-evaluate")
    w("")
    w("main.cpp guards its Predict call to FM/FFM/GBM — the bundled")
    w("FM_Predict cannot score an NFM (no MLP forward), so the reference")
    w("has NO test curve for NFM; its train loss falls "
      f"{REF_NFM_TRAIN_LOSS[0]:.0f} → {REF_NFM_TRAIN_LOSS[-1]:.0f} over 30 "
      "epochs (instrumented run). Ours evaluates NFM like any model:")
    w("")
    w("| epoch | ours test AUC (seed band) | ours test logloss (band) |")
    w("|---|---|---|")
    for e in range(0, EPOCHS, 4):
        ll = [r[1][e] for r in curves["nfm"]]
        w(f"| {e} | {fmt_band(curves['nfm'], e)} | "
          f"{min(ll):.3f}–{max(ll):.3f} |")
    w("")
    w("Raw per-seed curves:")
    w("")
    for name in ("fm", "ffm", "nfm"):
        for s, (aucs, lls) in zip(SEEDS, curves[name]):
            w(f"- {name} seed {s} test AUC: "
              + " ".join(f"{a:.3f}" for a in aucs))
    w("")
    text = "\n".join(lines)
    with open("PARITY_CURVES.md", "w") as f:
        f.write(text)
    print(text[:1500])


if __name__ == "__main__":
    main()

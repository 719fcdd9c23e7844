"""Deterministic NumPy replica of the reference FM trainer, with INIT
TRANSPLANT from the instrumented binary (benchmarks/ref_instrument.py).

Implements train_fm_algo.cpp's exact update (full-batch, k=16):
  pred      = clamped sigmoid(W.x + 0.5||sum_i x_i V_i||^2
                              - 0.5 sum_i ||x_i V_i||^2)   [+-16 clamp,
              activations.h:63-72 -> 1e-7 / 1-1e-7]
  per OCCURRENCE (fid, x) of each row (duplicates kept, loader order):
    gW_occ       = (pred - y) * x + L2 * W[fid]            [L2 applied per
                   occurrence — fm_algo_abst.h:159, train_fm_algo.cpp:108]
    update_W[fid]+= gW_occ
    update_V[fid]+= gW_occ * (sumVX[row] - x * V[fid]) + L2 * V[fid]
                   [NOTE the reference scales the V-term by gW_occ, which
                   INCLUDES the W-L2 term — train_fm_algo.cpp:110-115;
                   replicated verbatim]
  ApplyGrad (AdagradUpdater_Num, gradientUpdater.h:128-150):
    g /= N;  where g != 0:  accum += g^2;  w -= lr*g/sqrt(accum + 1e-7)

Given the binary's init dump (model_epoch_1000.txt) it steps the SAME
parameters the binary stepped; per-epoch test AUC is printed next to the
binary's, and W/V after epochs 1..3 are diffed against the binary's
dumps (the residual there bounds the binary's Hogwild race noise, since
everything else is bit-deterministic given the init).

  python benchmarks/ref_instrument.py
  cd /tmp/refprobe && PROBE_SEED=7 CURVE_EPOCHS=30 ./refprobe_fm > run.log
  python benchmarks/fm_reference_replica.py /tmp/refprobe [epochs]
"""

import re
import sys

import numpy as np

LR = 0.05
L2 = 0.001
K = 16


def load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            y = int(parts[0])
            feats = []
            for tok in parts[1:]:
                _, fid, val = tok.split(":")
                feats.append((int(fid), float(val)))
            if feats:
                rows.append((y, feats))
    return rows


def load_dump(path, feature_cnt):
    """Parse fm_algo_abst.h saveModel: line 1 = 'fid:W ' pairs (nonzero
    only), then one 'fid:v0 v1 ... v{k-1}' line per feature."""
    W = np.zeros(feature_cnt, np.float64)
    V = np.zeros((feature_cnt, K), np.float64)
    with open(path) as f:
        first = f.readline()
        for pair in first.split():
            fid, w = pair.split(":")
            W[int(fid)] = float(w)
        for line in f:
            m = re.match(r"(\d+):(.*)", line.strip())
            if not m:
                continue
            fid = int(m.group(1))
            V[fid] = [float(v) for v in m.group(2).split()]
    return W, V


def auc_exact(labels, scores):
    labels = np.asarray(labels)
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    s = np.asarray(scores)[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    pos = labels == 1
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def predict_scores(rows, W, V, drop_first=False):
    out = []
    feature_cnt = len(W)
    for y, feats in rows:
        use = feats[1:] if drop_first else feats
        # OOV test fids (1/55321 tokens) are skipped; the binary reads
        # past its W/V arrays there (UB) — nothing sane to replicate
        use = [(fid, x) for fid, x in use if fid < feature_cnt]
        z = 0.0
        sumvx = np.zeros(K)
        for fid, x in use:
            z += W[fid] * x
            xv = x * V[fid]
            sumvx += xv
            z -= 0.5 * xv @ xv
        z += 0.5 * sumvx @ sumvx
        out.append(1.0 / (1.0 + np.exp(-np.clip(z, -16, 16))))
    return np.array(out)


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refprobe"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    # fp32 mode mirrors the binary's arithmetic width: trajectory
    # divergence between fp32 and fp64 replicas bounds the genuine
    # fp-chaos of this training problem (Adagrad's first step is
    # ~lr*sign(g), so ulp-level sign flips in near-zero gradients become
    # full +-lr parameter differences)
    dt = np.float32 if "--fp32" in sys.argv else np.float64

    train = load_rows(f"{base}/data/ad_data.csv")
    test = load_rows(f"{base}/data/ad_test.csv")
    feature_cnt = 1 + max(fid for _, fs in train for fid, _ in fs)
    N = len(train)

    W, V = load_dump(f"{base}/output/model_epoch_1000.txt", feature_cnt)
    W = W.astype(dt)
    V = V.astype(dt)
    accum = np.zeros(feature_cnt * (1 + K), dt)
    test_y = np.array([y for y, _ in test])

    # flat [B, Lmax] arrays for the vectorised epoch
    Lmax = max(len(fs) for _, fs in train)
    fid_m = np.zeros((N, Lmax), np.int64)
    x_m = np.zeros((N, Lmax), np.float64)
    msk = np.zeros((N, Lmax), bool)
    y_v = np.zeros(N)
    for r, (y, fs) in enumerate(train):
        y_v[r] = y
        for i, (fid, x) in enumerate(fs):
            fid_m[r, i] = fid
            x_m[r, i] = x
            msk[r, i] = True
    flat_fid = fid_m[msk]
    flat_x = x_m[msk]
    flat_row = np.repeat(np.arange(N), msk.sum(axis=1))

    flat_x = flat_x.astype(dt)
    y_v = y_v.astype(dt)
    for ep in range(epochs):
        # forward (per-row sums over occurrences)
        xv = flat_x[:, None] * V[flat_fid]                    # [n, K]
        sumvx = np.zeros((N, K), dt)
        np.add.at(sumvx, flat_row, xv)
        wx = np.zeros(N, dt)
        np.add.at(wx, flat_row, W[flat_fid] * flat_x)
        self_t = np.zeros(N, dt)
        np.add.at(self_t, flat_row, np.einsum("nk,nk->n", xv, xv))
        z = np.clip(wx + 0.5 * (np.einsum("nk,nk->n", sumvx, sumvx)
                                - self_t), -16, 16)
        pred = np.where(z <= -16, 1e-7,
                        np.where(z >= 16, 1 - 1e-7, 1 / (1 + np.exp(-z))))

        # per-occurrence grads (reference accumWVGrad verbatim)
        dl = pred - y_v
        gW_occ = dl[flat_row] * flat_x + L2 * W[flat_fid]
        gV_occ = (gW_occ[:, None] * (sumvx[flat_row] - xv)
                  + L2 * V[flat_fid])
        update_W = np.zeros(feature_cnt, dt)
        np.add.at(update_W, flat_fid, gW_occ)
        update_V = np.zeros((feature_cnt, K), dt)
        np.add.at(update_V, flat_fid, gV_occ)

        # AdagradUpdater_Num
        g = np.concatenate([update_W, update_V.reshape(-1)]) / N
        nz = g != 0
        accum[nz] += g[nz] ** 2
        stepv = np.zeros_like(g)
        stepv[nz] = LR * g[nz] / np.sqrt(accum[nz] + 1e-7)
        W -= stepv[:feature_cnt]
        V -= stepv[feature_cnt:].reshape(feature_cnt, K)

        scores_q = predict_scores(test, W, V, drop_first=True)
        scores_f = predict_scores(test, W, V, drop_first=False)
        # binary-faithful eval: FM_Predict's pairwise term reads
        # fm->getSumVX(rid) — the TRAINING-set row cache indexed by TEST
        # row id (fm_predict.cpp:32), i.e. a train-cache leak computed
        # with the PRE-update V of the final epoch. Reproduced verbatim:
        # test row rid's own linear + self terms (quirked loader, first
        # feature dropped) + 0.5*||sumVX_train[rid]||^2.
        zb = np.zeros(len(test))
        for rid, (y, feats) in enumerate(test):
            use = [(f, x) for f, x in feats[1:] if f < feature_cnt]
            z_own = sum(W[f] * x for f, x in use)
            z_own -= 0.5 * sum((x * V[f]) @ (x * V[f]) for f, x in use)
            zb[rid] = z_own + 0.5 * sumvx[rid] @ sumvx[rid]
        zb = np.clip(zb, -16, 16)
        sb = np.where(zb <= -16, 1e-7,
                      np.where(zb >= 16, 1 - 1e-7, 1 / (1 + np.exp(-zb))))
        line = (f"epoch {ep}: auc(quirked-loader)={auc_exact(test_y, scores_q):.4f} "
                f"auc(full)={auc_exact(test_y, scores_f):.4f} "
                f"auc(binary-faithful)={auc_exact(test_y, sb):.4f}")

        if ep + 1 <= 3:
            try:
                Wb, Vb = load_dump(f"{base}/output/model_epoch_{ep+1}.txt",
                                   feature_cnt)
                dV = np.abs(V - Vb).reshape(-1)
                # entries at full-first-step scale (~lr): the Adagrad
                # amplifier — a near-zero gradient whose SIGN differs
                # under fp noise takes a full +-lr/sqrt(1) first step
                flips = int((dV > LR / 2).sum())
                line += (f"  |dW|max={np.abs(W - Wb).max():.2e} "
                         f"|dV|max={dV.max():.2e} "
                         f"|dV|p99={np.quantile(dV, 0.99):.2e} "
                         f"step-scale-diffs={flips}/{dV.size}")
            except FileNotFoundError:
                pass
        print(line, flush=True)


if __name__ == "__main__":
    main()

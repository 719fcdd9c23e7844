"""Gradient-boosted trees (XGBoost-style, 2nd order) — capability parity
with the reference's GBM (gbm_algo_abst.h, train_gbm_algo.{h,cpp}:
grad/hess per row :30-101, split finding :224-322, L1-thresholded
gain/weight train_gbm_algo.h:94-104, row/feature subsampling 0.7 :72-86,
multiclass = K trees/round with softmax grads :66-94).

TPU-native layout: features are quantile-binned once (uint8), and split
finding per level is ONE scatter-add histogram over (active-node, feature,
bin) followed by cumulative sums — an XLA reduction, not the reference's
per-thread sorted sweeps. Tree structure/growth decisions stay on host
(data-dependent control flow is a poor fit for the compiler; SURVEY.md §7
flags this explicitly); all O(N*F) work runs on device.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GBMConfig:
    n_rounds: int = 10
    max_depth: int = 6
    learning_rate: float = 0.3
    n_bins: int = 32
    reg_lambda: float = 1.0
    reg_alpha: float = 0.0        # L1 threshold on G (reference lambda L1)
    gamma: float = 0.0            # min split gain
    min_child_hess: float = 1.0   # reference minLeafHess
    subsample: float = 0.7        # row subsample  (reference :72-86)
    colsample: float = 0.7        # feature subsample
    n_classes: int = 2            # 2 = binary (single tree/round)
    seed: int = 0


@dataclasses.dataclass
class Tree:
    feature: np.ndarray    # [n_nodes] split feature (-1 = leaf)
    threshold: np.ndarray  # [n_nodes] split bin (go left if bin <= thr)
    left: np.ndarray       # [n_nodes] child index
    right: np.ndarray
    value: np.ndarray      # [n_nodes] leaf weight
    nan_left: np.ndarray   # [n_nodes] route missing (last bin) left?


def quantile_bins(x: np.ndarray, n_bins: int):
    """Per-feature quantile bin edges [F, n_bins-1]; returns (bin_ids uint8,
    edges). NaNs (missing values) get the reserved last bin `n_bins - 1`
    and are routed by a learned default direction at each split (the
    reference's two-sweep missing handling,
    train_gbm_algo.cpp findSplitFeature_Wrapper:215-222)."""
    nan_mask = np.isnan(x)
    qs = np.linspace(0, 1, n_bins)[1:-1]  # reserve the top bin for NaN
    with np.errstate(all="ignore"):
        edges = np.nanquantile(x, qs, axis=0).T.astype(np.float32)  # [F, n_bins-2]
    edges = np.nan_to_num(edges)
    bin_ids = np.empty(x.shape, np.uint8)
    for f in range(x.shape[1]):
        bin_ids[:, f] = np.searchsorted(edges[f], x[:, f], side="right")
    bin_ids[nan_mask] = n_bins - 1
    return bin_ids, edges


import functools


@functools.partial(jax.jit, static_argnums=(4, 5))
def _histogram(node_of_row, bin_ids, g, h, n_nodes, n_bins):
    """Scatter-add G/H histograms: [n_nodes, F, n_bins]."""
    N, F = bin_ids.shape
    flat = (
        node_of_row[:, None] * (F * n_bins)
        + jnp.arange(F)[None, :] * n_bins
        + bin_ids.astype(jnp.int32)
    ).reshape(-1)
    gh = jnp.stack([jnp.repeat(g, F), jnp.repeat(h, F)], axis=-1)
    hist = jnp.zeros((n_nodes * F * n_bins, 2), jnp.float32).at[flat].add(gh)
    return hist.reshape(n_nodes, F, n_bins, 2)


def _l1_thresh(g, alpha):
    return jnp.sign(g) * jnp.maximum(jnp.abs(g) - alpha, 0.0)


@jax.jit
def _best_splits(hist, reg_lambda, reg_alpha, gamma, min_child_hess):
    """hist [M, F, B, 2] -> best (gain, feature, bin, nan_left) per node.

    The last bin holds missing values; gains are evaluated twice per
    threshold — missing routed left vs right (the reference's two
    sweeps) — and the better direction is kept."""
    g = hist[..., 0]
    h = hist[..., 1]
    g_nan = g[..., -1:]
    h_nan = h[..., -1:]
    g_cum = jnp.cumsum(g[..., :-1], axis=-1)       # [M,F,B-1] non-NaN sweep
    h_cum = jnp.cumsum(h[..., :-1], axis=-1)
    g_tot = g_cum[..., -1:] + g_nan
    h_tot = h_cum[..., -1:] + h_nan
    gl, hl = g_cum[..., :-1], h_cum[..., :-1]       # candidate thresholds

    def score(g, h):
        t = _l1_thresh(g, reg_alpha)
        return t * t / (h + reg_lambda)

    parent = score(g_tot, h_tot)

    def split_gain(gl_, hl_):
        gr_, hr_ = g_tot - gl_, h_tot - hl_
        gain = 0.5 * (score(gl_, hl_) + score(gr_, hr_) - parent) - gamma
        valid = (hl_ >= min_child_hess) & (hr_ >= min_child_hess)
        return jnp.where(valid, gain, -jnp.inf)

    gain_right = split_gain(gl, hl)                 # missing -> right
    gain_left = split_gain(gl + g_nan, hl + h_nan)  # missing -> left
    nan_left = gain_left > gain_right
    gain = jnp.maximum(gain_left, gain_right)

    flat = gain.reshape(gain.shape[0], -1)
    best = jnp.argmax(flat, axis=-1)
    best_gain = jnp.take_along_axis(flat, best[:, None], axis=-1)[:, 0]
    best_nan_left = jnp.take_along_axis(
        nan_left.reshape(nan_left.shape[0], -1), best[:, None], axis=-1
    )[:, 0]
    n_thr = gain.shape[-1]
    return (best_gain, best // n_thr, best % n_thr, best_nan_left,
            g_tot[..., 0, 0], h_tot[..., 0, 0])


def _leaf_value(g, h, cfg: GBMConfig):
    t = np.sign(g) * max(abs(g) - cfg.reg_alpha, 0.0)
    return float(-t / (h + cfg.reg_lambda))


def _grow_tree(bin_ids_d, g_d, h_d, row_mask, cfg: GBMConfig, rng) -> Tree:
    """Level-wise growth over compact active-node ids."""
    N, F = bin_ids_d.shape
    feat_mask = rng.random(F) < cfg.colsample
    if not feat_mask.any():
        feat_mask[rng.integers(F)] = True

    feature = [-1]
    threshold = [0]
    left = [-1]
    right = [-1]
    value = [0.0]
    nan_left = [False]

    # node assignment per row; -1 = out of tree (subsampled away)
    node_of_row = np.where(row_mask, 0, -1).astype(np.int32)
    active = [0]  # tree node ids that are growable at current level

    g_np = np.asarray(g_d)
    h_np = np.asarray(h_d)

    for depth in range(cfg.max_depth):
        if not active:
            break
        compact = {nid: i for i, nid in enumerate(active)}
        M = len(active)
        comp_of_row = np.full(N, M, np.int32)  # M = trash slot
        for nid, i in compact.items():
            comp_of_row[node_of_row == nid] = i

        hist = np.array(
            _histogram(
                jnp.asarray(comp_of_row), bin_ids_d, g_d, h_d, M + 1, cfg.n_bins
            )
        )[:M]
        hist[:, ~feat_mask, :, :] = 0.0
        gains, feats, bins, nan_lefts, g_tots, h_tots = (
            np.asarray(t)
            for t in _best_splits(
                jnp.asarray(hist),
                cfg.reg_lambda,
                cfg.reg_alpha,
                cfg.gamma,
                cfg.min_child_hess,
            )
        )

        next_active = []
        bin_np = np.asarray(bin_ids_d)
        nan_bin = cfg.n_bins - 1
        for i, nid in enumerate(active):
            if not np.isfinite(gains[i]) or gains[i] <= 0:
                value[nid] = _leaf_value(g_tots[i], h_tots[i], cfg)
                continue
            f, b = int(feats[i]), int(bins[i])
            nl = bool(nan_lefts[i])
            lid, rid = len(feature), len(feature) + 1
            feature.extend([-1, -1])
            threshold.extend([0, 0])
            left.extend([-1, -1])
            right.extend([-1, -1])
            value.extend([0.0, 0.0])
            nan_left.extend([False, False])
            feature[nid] = f
            threshold[nid] = b
            left[nid] = lid
            right[nid] = rid
            nan_left[nid] = nl
            rows = node_of_row == nid
            fbins = bin_np[:, f]
            # threshold candidates never include the NaN bin, so routing
            # missing left is exactly the extra (fbins == nan_bin) clause
            goes_left = rows & (
                (fbins <= b) | (nl & (fbins == nan_bin))
            )
            node_of_row[goes_left] = lid
            node_of_row[rows & ~goes_left] = rid
            if depth + 1 < cfg.max_depth:
                next_active.extend([lid, rid])
            else:
                for cid in (lid, rid):
                    rsel = node_of_row == cid
                    value[cid] = _leaf_value(g_np[rsel].sum(), h_np[rsel].sum(), cfg)
        active = next_active

    # any still-active nodes at loop end got leaf values above
    return Tree(
        feature=np.asarray(feature, np.int32),
        threshold=np.asarray(threshold, np.int32),
        left=np.asarray(left, np.int32),
        right=np.asarray(right, np.int32),
        value=np.asarray(value, np.float32),
        nan_left=np.asarray(nan_left, bool),
    )


def _predict_tree_binned(tree: Tree, bin_ids: np.ndarray, nan_bin: int) -> np.ndarray:
    """Vectorised traversal over pre-binned rows."""
    node = np.zeros(bin_ids.shape[0], np.int32)
    for _ in range(64):  # > max depth
        is_leaf = tree.feature[node] < 0
        if is_leaf.all():
            break
        f = np.maximum(tree.feature[node], 0)
        fbins = bin_ids[np.arange(len(node)), f]
        go_left = (fbins <= tree.threshold[node]) | (
            tree.nan_left[node] & (fbins == nan_bin)
        )
        nxt = np.where(go_left, tree.left[node], tree.right[node])
        node = np.where(is_leaf, node, nxt)
    return tree.value[node]


class GBM:
    """Boosted ensemble. For n_classes > 2, K trees per round with softmax
    grads (reference train_gbm_algo.cpp:66-94)."""

    def __init__(self, cfg: GBMConfig):
        self.cfg = cfg
        self.trees: list[list[Tree]] = []  # [round][class]
        self.edges = None
        self.base_score = 0.0

    def fit(self, x: np.ndarray, y: np.ndarray, log=None):
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        K = cfg.n_classes if cfg.n_classes > 2 else 1
        bin_ids, self.edges = quantile_bins(x, cfg.n_bins)
        bin_ids_d = jnp.asarray(bin_ids)
        N = x.shape[0]
        margin = np.zeros((N, K), np.float32)

        for rnd in range(cfg.n_rounds):
            if K == 1:
                p = 1.0 / (1.0 + np.exp(-margin[:, 0]))
                g = (p - y).astype(np.float32)
                h = np.maximum(p * (1 - p), 1e-6).astype(np.float32)
                grads = [(g, h)]
            else:
                e = np.exp(margin - margin.max(axis=1, keepdims=True))
                p = e / e.sum(axis=1, keepdims=True)
                grads = []
                for k in range(K):
                    yk = (y == k).astype(np.float32)
                    grads.append(
                        (
                            (p[:, k] - yk).astype(np.float32),
                            np.maximum(p[:, k] * (1 - p[:, k]), 1e-6).astype(np.float32),
                        )
                    )
            row_mask = rng.random(N) < cfg.subsample
            if not row_mask.any():
                row_mask[:] = True
            round_trees = []
            for k, (g, h) in enumerate(grads):
                tree = _grow_tree(
                    bin_ids_d, jnp.asarray(g), jnp.asarray(h), row_mask, cfg, rng
                )
                margin[:, k] += cfg.learning_rate * _predict_tree_binned(tree, bin_ids, cfg.n_bins - 1)
                round_trees.append(tree)
            self.trees.append(round_trees)
            if log:
                if K == 1:
                    p = 1.0 / (1.0 + np.exp(-margin[:, 0]))
                    ll = -np.mean(y * np.log(p + 1e-9) + (1 - y) * np.log(1 - p + 1e-9))
                    log(f"gbm round {rnd}: logloss={ll:.4f}")
                else:
                    acc = (margin.argmax(axis=1) == y).mean()
                    log(f"gbm round {rnd}: acc={acc:.4f}")
        return self

    def _bin(self, x: np.ndarray) -> np.ndarray:
        # Mirrors quantile_bins: NaN lands in the reserved last bin so the
        # learned nan_left default directions apply at inference too.
        nan_mask = np.isnan(x)
        bin_ids = np.empty(x.shape, np.uint8)
        for f in range(x.shape[1]):
            bin_ids[:, f] = np.searchsorted(
                self.edges[f], np.nan_to_num(x[:, f]), side="right"
            )
        bin_ids[nan_mask] = self.cfg.n_bins - 1
        return bin_ids

    def predict_margin(self, x: np.ndarray) -> np.ndarray:
        K = self.cfg.n_classes if self.cfg.n_classes > 2 else 1
        bin_ids = self._bin(x)
        margin = np.zeros((x.shape[0], K), np.float32)
        for round_trees in self.trees:
            for k, tree in enumerate(round_trees):
                margin[:, k] += self.cfg.learning_rate * _predict_tree_binned(tree, bin_ids, self.cfg.n_bins - 1)
        return margin

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        """Sigmoid (binary) / softmax (multiclass) — GBM_Predict semantics
        (predict/gbm_predict.cpp:12-73)."""
        m = self.predict_margin(x)
        if m.shape[1] == 1:
            p = 1.0 / (1.0 + np.exp(-m[:, 0]))
            return np.stack([1 - p, p], axis=1)
        e = np.exp(m - m.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    def predict(self, x: np.ndarray) -> np.ndarray:
        return self.predict_proba(x).argmax(axis=1)


# ---------------------------------------------------------------------------
# Sparse-input GBM: CSR rows, missing = absent feature.
#
# The reference ingests sparse `map<fid,val>` rows and routes rows lacking
# the split feature by a learned default direction
# (gbm_algo_abst.h:128-168 `nextLevel` dataRow.find -> dataNAN_go_Right).
# TPU-native layout (LightGBM-style missing-as-complement):
#   - features compacted to those PRESENT anywhere (225k vocab -> ~8k
#     active on the bundled CTR data), per-feature quantile bins from
#     present values only, bin B-1 reserved for "absent"
#   - per level, ONE device scatter-add over the nnz entries builds the
#     present histograms; the absent mass is node_total - present_sum,
#     materialised into bin B-1 — after which the dense engine's
#     two-sweep _best_splits applies unchanged
#   - split application/prediction materialise one feature column at a
#     time from a CSC view (absent rows read bin B-1)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _sparse_histogram(comp_of_row, row_of_entry, col_of_entry, bin_of_entry,
                      g, h, n_nodes, n_feats, n_bins):
    """[M+1, F, B, 2] histograms from CSR entries + absent mass in bin B-1."""
    comp_e = comp_of_row[row_of_entry]
    flat = (
        comp_e * (n_feats * n_bins)
        + col_of_entry * n_bins
        + bin_of_entry.astype(jnp.int32)
    )
    gh_e = jnp.stack([g[row_of_entry], h[row_of_entry]], axis=-1)
    hist = (
        jnp.zeros((n_nodes * n_feats * n_bins, 2), jnp.float32)
        .at[flat].add(gh_e)
        .reshape(n_nodes, n_feats, n_bins, 2)
    )
    tot = (
        jnp.zeros((n_nodes, 2), jnp.float32)
        .at[comp_of_row].add(jnp.stack([g, h], axis=-1))
    )
    absent = tot[:, None, :] - hist.sum(axis=2)          # [M+1, F, 2]
    hist = hist.at[:, :, n_bins - 1, :].add(absent)
    return hist


class SparseGBM:
    """GBM over CSR rows (missing = absent feature, learned default
    direction). fit/predict accept a SparseDataset or a CSR triple."""

    def __init__(self, cfg: GBMConfig):
        self.cfg = cfg
        self.trees: list[list[Tree]] = []
        self.feats = None       # [F_active] original feature ids
        self.edges = None       # list of per-feature edge arrays
        self.n_rows_ = 0

    # ---- data prep -------------------------------------------------

    def _csr(self, data):
        if isinstance(data, tuple):
            indptr, ids, vals = data
        else:
            from ..data.libffm import to_csr

            indptr, ids, vals, _ = to_csr(data)
        return (np.asarray(indptr, np.int64), np.asarray(ids, np.int64),
                np.asarray(vals, np.float32))

    def _prepare(self, indptr, ids, vals):
        """Compact features, per-feature quantile edges, per-entry bins."""
        cfg = self.cfg
        self.feats = np.unique(ids)
        col = np.searchsorted(self.feats, ids).astype(np.int32)
        F = len(self.feats)
        order = np.argsort(col, kind="stable")
        bins = np.empty(len(ids), np.uint8)
        qs = np.linspace(0, 1, cfg.n_bins)[1:-1]  # top bin reserved: absent
        self.edges = [None] * F
        start = 0
        counts = np.bincount(col, minlength=F)
        for f in range(F):
            seg = order[start : start + counts[f]]
            start += counts[f]
            v = vals[seg]
            e = np.quantile(v, qs).astype(np.float32)
            self.edges[f] = e
            bins[seg] = np.searchsorted(e, v, side="right")
        row_of_entry = np.repeat(
            np.arange(len(indptr) - 1), np.diff(indptr)
        ).astype(np.int32)
        return col, bins, row_of_entry

    def _csc(self, col, bins, row_of_entry, n_feats):
        order = np.argsort(col, kind="stable")
        ptr = np.zeros(n_feats + 1, np.int64)
        np.cumsum(np.bincount(col, minlength=n_feats), out=ptr[1:])
        return ptr, row_of_entry[order], bins[order]

    def _feature_column(self, f, n_rows, csc):
        """Dense bin column for compact feature f; absent rows = bin B-1."""
        ptr, rows, bins = csc
        out = np.full(n_rows, self.cfg.n_bins - 1, np.uint8)
        s, e = ptr[f], ptr[f + 1]
        out[rows[s:e]] = bins[s:e]
        return out

    # ---- training --------------------------------------------------

    def fit(self, data, y, log=None):
        cfg = self.cfg
        indptr, ids, vals = self._csr(data)
        y = np.asarray(y)
        N = len(indptr) - 1
        self.n_rows_ = N
        col, bins, row_of_entry = self._prepare(indptr, ids, vals)
        F = len(self.feats)
        csc = self._csc(col, bins, row_of_entry, F)
        col_d = jnp.asarray(col)
        bins_d = jnp.asarray(bins)
        row_e_d = jnp.asarray(row_of_entry)

        rng = np.random.default_rng(cfg.seed)
        K = cfg.n_classes if cfg.n_classes > 2 else 1
        margin = np.zeros((N, K), np.float32)
        for rnd in range(cfg.n_rounds):
            if K == 1:
                p = 1.0 / (1.0 + np.exp(-margin[:, 0]))
                grads = [((p - y).astype(np.float32),
                          np.maximum(p * (1 - p), 1e-6).astype(np.float32))]
            else:
                e = np.exp(margin - margin.max(axis=1, keepdims=True))
                p = e / e.sum(axis=1, keepdims=True)
                grads = [((p[:, k] - (y == k)).astype(np.float32),
                          np.maximum(p[:, k] * (1 - p[:, k]), 1e-6).astype(np.float32))
                         for k in range(K)]
            row_mask = rng.random(N) < cfg.subsample
            if not row_mask.any():
                row_mask[:] = True
            round_trees = []
            for k, (g, h) in enumerate(grads):
                tree = self._grow_tree(
                    N, F, col_d, bins_d, row_e_d, csc,
                    jnp.asarray(g), jnp.asarray(h), g, h, row_mask, rng,
                )
                margin[:, k] += cfg.learning_rate * self._predict_tree(
                    tree, N, lambda f: self._feature_column(f, N, csc)
                )
                round_trees.append(tree)
            self.trees.append(round_trees)
            if log:
                if K == 1:
                    p = 1.0 / (1.0 + np.exp(-margin[:, 0]))
                    ll = -np.mean(y * np.log(p + 1e-9)
                                  + (1 - y) * np.log(1 - p + 1e-9))
                    log(f"sparse-gbm round {rnd}: logloss={ll:.4f}")
                else:
                    log(f"sparse-gbm round {rnd}: "
                        f"acc={(margin.argmax(axis=1) == y).mean():.4f}")
        return self

    def _grow_tree(self, N, F, col_d, bins_d, row_e_d, csc,
                   g_d, h_d, g_np, h_np, row_mask, rng) -> Tree:
        cfg = self.cfg
        feat_mask = rng.random(F) < cfg.colsample
        if not feat_mask.any():
            feat_mask[rng.integers(F)] = True

        feature, threshold = [-1], [0]
        left, right = [-1], [-1]
        value, nan_left = [0.0], [False]
        node_of_row = np.where(row_mask, 0, -1).astype(np.int32)
        active = [0]
        nan_bin = cfg.n_bins - 1

        for depth in range(cfg.max_depth):
            if not active:
                break
            M = len(active)
            comp_of_row = np.full(N, M, np.int32)
            for i, nid in enumerate(active):
                comp_of_row[node_of_row == nid] = i
            hist = np.array(_sparse_histogram(
                jnp.asarray(comp_of_row), row_e_d, col_d, bins_d,
                g_d, h_d, M + 1, F, cfg.n_bins,
            ))[:M]
            hist[:, ~feat_mask, :, :] = 0.0
            gains, feats, bins_, nan_lefts, g_tots, h_tots = (
                np.asarray(t) for t in _best_splits(
                    jnp.asarray(hist), cfg.reg_lambda, cfg.reg_alpha,
                    cfg.gamma, cfg.min_child_hess,
                )
            )
            next_active = []
            for i, nid in enumerate(active):
                if not np.isfinite(gains[i]) or gains[i] <= 0:
                    value[nid] = _leaf_value(g_tots[i], h_tots[i], cfg)
                    continue
                f, b = int(feats[i]), int(bins_[i])
                nl = bool(nan_lefts[i])
                lid, rid = len(feature), len(feature) + 1
                feature.extend([-1, -1]); threshold.extend([0, 0])
                left.extend([-1, -1]); right.extend([-1, -1])
                value.extend([0.0, 0.0]); nan_left.extend([False, False])
                feature[nid], threshold[nid] = f, b
                left[nid], right[nid], nan_left[nid] = lid, rid, nl
                rows = node_of_row == nid
                fbins = self._feature_column(f, N, csc)
                goes_left = rows & ((fbins <= b) | (nl & (fbins == nan_bin)))
                node_of_row[goes_left] = lid
                node_of_row[rows & ~goes_left] = rid
                if depth + 1 < cfg.max_depth:
                    next_active.extend([lid, rid])
                else:
                    for cid in (lid, rid):
                        rsel = node_of_row == cid
                        value[cid] = _leaf_value(
                            g_np[rsel].sum(), h_np[rsel].sum(), cfg)
            active = next_active

        return Tree(
            feature=np.asarray(feature, np.int32),
            threshold=np.asarray(threshold, np.int32),
            left=np.asarray(left, np.int32),
            right=np.asarray(right, np.int32),
            value=np.asarray(value, np.float32),
            nan_left=np.asarray(nan_left, bool),
        )

    # ---- prediction ------------------------------------------------

    def _predict_tree(self, tree: Tree, n_rows, col_fn) -> np.ndarray:
        """Traversal with per-feature column materialisation (only the
        tree's own split features are densified, <= n_nodes columns)."""
        nan_bin = self.cfg.n_bins - 1
        used = np.unique(tree.feature[tree.feature >= 0])
        cols = {int(f): col_fn(int(f)) for f in used}
        node = np.zeros(n_rows, np.int32)
        for _ in range(64):
            is_leaf = tree.feature[node] < 0
            if is_leaf.all():
                break
            for f in used:
                sel = ~is_leaf & (tree.feature[node] == f)
                if not sel.any():
                    continue
                fbins = cols[int(f)][sel]
                go_left = (fbins <= tree.threshold[node][sel]) | (
                    tree.nan_left[node][sel] & (fbins == nan_bin)
                )
                node[sel] = np.where(
                    go_left, tree.left[node][sel], tree.right[node][sel]
                )
        return tree.value[node]

    def _test_columns(self, data):
        """(n_rows, col_fn) for unseen data: unknown features -> absent."""
        indptr, ids, vals = self._csr(data)
        N = len(indptr) - 1
        pos = np.searchsorted(self.feats, ids)
        known = (pos < len(self.feats)) & (
            self.feats[np.minimum(pos, len(self.feats) - 1)] == ids
        )
        col = np.where(known, pos, 0).astype(np.int32)
        bins = np.zeros(len(ids), np.uint8)
        row_of_entry = np.repeat(np.arange(N), np.diff(indptr)).astype(np.int32)
        order = np.argsort(col, kind="stable")
        start = 0
        counts = np.bincount(col, minlength=len(self.feats))
        for f in range(len(self.feats)):
            seg = order[start : start + counts[f]]
            start += counts[f]
            if len(seg):
                bins[seg] = np.searchsorted(
                    self.edges[f], vals[seg], side="right")
        # unknown-feature entries are dropped: those slots read as absent
        k = known
        csc = self._csc(col[k], bins[k], row_of_entry[k], len(self.feats))
        return N, (lambda f: self._feature_column(f, N, csc))

    def predict_margin(self, data) -> np.ndarray:
        K = self.cfg.n_classes if self.cfg.n_classes > 2 else 1
        N, col_fn = self._test_columns(data)
        margin = np.zeros((N, K), np.float32)
        for round_trees in self.trees:
            for k, tree in enumerate(round_trees):
                margin[:, k] += self.cfg.learning_rate * self._predict_tree(
                    tree, N, col_fn)
        return margin

    def predict_proba(self, data) -> np.ndarray:
        m = self.predict_margin(data)
        if m.shape[1] == 1:
            p = 1.0 / (1.0 + np.exp(-m[:, 0]))
            return np.stack([1 - p, p], axis=1)
        e = np.exp(m - m.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    def predict(self, data) -> np.ndarray:
        return self.predict_proba(data).argmax(axis=1)

"""GMM / PLSA / CBOW / GBM tests."""

import numpy as np
import jax.numpy as jnp

from lightctr_tpu.models import gmm, plsa
from lightctr_tpu.models.gbm import GBM, GBMConfig
from lightctr_tpu.models import embedding as emb


def test_gmm_recovers_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 5.0]], np.float32)
    x = np.concatenate(
        [rng.normal(c, 0.5, size=(100, 2)).astype(np.float32) for c in centers]
    )
    cfg = gmm.GMMConfig(n_clusters=3, dim=2, seed=1)
    state, ll = gmm.fit(x, cfg, epochs=100)
    labels = np.asarray(gmm.predict(state, x))
    # each true cluster maps to one dominant predicted cluster
    for i in range(3):
        seg = labels[i * 100 : (i + 1) * 100]
        assert (seg == np.bincount(seg).argmax()).mean() > 0.95
    # means recovered (match each true center to nearest learned mean)
    mu = np.asarray(state.mu)
    for c in centers:
        assert np.min(np.linalg.norm(mu - c, axis=1)) < 0.5


def test_gmm_loglik_monotone():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 4)).astype(np.float32)
    cfg = gmm.GMMConfig(n_clusters=5, dim=4, seed=0)
    state = gmm.init(__import__("jax").random.PRNGKey(0), cfg, jnp.asarray(x))
    lls = []
    for _ in range(10):
        state, ll = gmm.em_step(state, jnp.asarray(x))
        lls.append(float(ll))
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:]))


def test_gmm_fit_scan_matches_fit():
    """fit_scan (device-side while_loop, one compiled program — the
    head-to-head path, benchmarks/bench_gmm_headtohead.py) runs the same
    EM math as the host-loop fit(): identical state after the same
    number of epochs, and the reference convergence semantics
    (em_algo_abst.h:33-48: |total ll delta| <= tol) actually stop it."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(300, 6)).astype(np.float32) * 3.0
    cfg = gmm.GMMConfig(n_clusters=4, dim=6, seed=3)

    state_scan, ll_scan, epochs = gmm.fit_scan(x, cfg, epochs=12,
                                               tol_total=0.0)
    assert epochs == 12  # tol 0 -> never converges early
    state_loop, _ = gmm.fit(x, cfg, epochs=12, tol=0.0)
    np.testing.assert_allclose(state_scan.mu, state_loop.mu,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(state_scan.var, state_loop.var,
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(ll_scan)

    # a loose tolerance stops well before the cap
    _, _, epochs_loose = gmm.fit_scan(x, cfg, epochs=50, tol_total=50.0)
    assert epochs_loose < 50


def test_plsa_separates_topics():
    rng = np.random.default_rng(0)
    # two synthetic topics over disjoint vocab halves
    W, D = 40, 60
    counts = np.zeros((D, W), np.float32)
    for d in range(D):
        if d < D // 2:
            words = rng.integers(0, W // 2, size=50)
        else:
            words = rng.integers(W // 2, W, size=50)
        np.add.at(counts[d], words, 1)
    cfg = plsa.PLSAConfig(n_topics=2, n_words=W, seed=0)
    state, ll = plsa.fit(counts, cfg, epochs=100)
    topics = np.asarray(plsa.doc_topics(state))
    first, second = topics[: D // 2], topics[D // 2 :]
    assert (first == np.bincount(first).argmax()).mean() > 0.9
    assert (second == np.bincount(second).argmax()).mean() > 0.9
    assert np.bincount(first).argmax() != np.bincount(second).argmax()
    tw = np.asarray(plsa.top_words(state, k=10))
    # top words of the two topics come from the two vocab halves
    halves = {int(np.median(tw[0]) // (W // 2)), int(np.median(tw[1]) // (W // 2))}
    assert halves == {0, 1}


def test_huffman_tree_valid():
    counts = np.array([50, 30, 10, 5, 5])
    node_ids, signs, mask = emb.build_huffman(counts)
    assert node_ids.shape[0] == 5
    # frequent words get shorter codes
    lens = mask.sum(axis=1)
    assert lens[0] <= lens[2] <= lens[3]
    # all internal node ids < V-1
    assert node_ids.max() <= 3
    # signs are +-1 where mask on
    assert set(np.unique(signs[mask > 0])) <= {-1.0, 1.0}


def test_cbow_negative_sampling_learns():
    # corpus where word pairs co-occur: (2i, 2i+1) always adjacent
    rng = np.random.default_rng(0)
    V = 20
    pairs = rng.integers(0, V // 2, size=4000)
    tokens = np.empty(8000, np.int64)
    tokens[0::2] = pairs * 2
    tokens[1::2] = pairs * 2 + 1
    counts = np.bincount(tokens, minlength=V)
    cfg = emb.CBOWConfig(vocab_size=V, dim=16, window=1, n_negatives=5,
                         subsample_t=1e9, seed=0)
    params = emb.train_cbow(tokens, counts, cfg, epochs=10, batch_size=256,
                            learning_rate=0.5)
    # CBOW learns emb[context] -> out[center]: a word's input embedding
    # should align with its partner's OUTPUT embedding far more than with
    # random words' output embeddings.
    e = np.asarray(params["emb"])
    o = np.asarray(params["out"])
    e = e / np.linalg.norm(e, axis=1, keepdims=True).clip(1e-12)
    o = np.linalg.norm(o, axis=1, keepdims=True).clip(1e-12) ** -1 * o
    cross = e @ o.T
    partner = np.mean(
        [cross[2 * i, 2 * i + 1] for i in range(V // 2)]
        + [cross[2 * i + 1, 2 * i] for i in range(V // 2)]
    )
    off = (cross.sum() - np.trace(cross)) / (V * V - V)
    assert partner > off + 0.2


def test_cbow_hsoftmax_runs_and_decreases():
    rng = np.random.default_rng(0)
    V = 12
    tokens = rng.integers(0, V, size=3000)
    counts = np.bincount(tokens, minlength=V)
    cfg = emb.CBOWConfig(vocab_size=V, dim=8, window=2, mode="hsoftmax",
                         subsample_t=1e9, seed=0)
    losses = []
    params = emb.train_cbow(tokens, counts, cfg, epochs=5, batch_size=256,
                            learning_rate=0.3, log=lambda s: losses.append(s))
    assert len(losses) == 5  # ran all epochs without NaN


def test_gbm_binary():
    rng = np.random.default_rng(0)
    n = 600
    x = rng.normal(size=(n, 10)).astype(np.float32)
    y = ((x[:, 0] + x[:, 1] * x[:, 2]) > 0).astype(np.float32)
    cfg = GBMConfig(n_rounds=20, max_depth=4, learning_rate=0.3, subsample=1.0,
                    colsample=1.0, n_classes=2, seed=0)
    model = GBM(cfg).fit(x, y)
    p = model.predict_proba(x)[:, 1]
    assert ((p > 0.5) == y).mean() > 0.9


def test_gbm_missing_values_two_sweep():
    """NaN features route through a learned default direction (the
    reference's two-sweep missing handling)."""
    rng = np.random.default_rng(5)
    n = 600
    x = rng.normal(size=(n, 6)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float32)
    # knock out 30% of the informative feature; missing implies class 1
    miss = rng.random(n) < 0.3
    y[miss] = 1.0
    x[miss, 0] = np.nan
    cfg = GBMConfig(n_rounds=15, max_depth=4, subsample=1.0, colsample=1.0,
                    n_classes=2, seed=0)
    model = GBM(cfg).fit(x, y)
    p = model.predict_proba(x)[:, 1]
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.9
    # the missing rows specifically must be classified (needs the learned
    # direction; random routing would cap around their base rate)
    assert ((p[miss] > 0.5) == y[miss]).mean() > 0.9
    # routing matters: NaN on the informative feature implies class 1
    # (must score like x0=+3, far from x0=-3)
    probe = np.zeros((3, 6), np.float32)
    probe[0, 0] = np.nan
    probe[1, 0] = 3.0
    probe[2, 0] = -3.0
    pp = model.predict_proba(probe)[:, 1]
    assert abs(pp[0] - pp[1]) < 0.1      # NaN grouped with the class-1 side
    assert abs(pp[0] - pp[2]) > 0.5      # far from the class-0 side


def test_gbm_missing_routes_left_at_predict():
    """Regression (ADVICE r1): predict-time binning must send NaN to the
    reserved NaN bin so a learned missing->LEFT direction applies at
    inference, not only during training."""
    rng = np.random.default_rng(7)
    n = 600
    x = rng.normal(size=(n, 6)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float32)
    # missing implies class 0 — the LEFT (negative-x0) side of the split
    miss = rng.random(n) < 0.3
    y[miss] = 0.0
    x[miss, 0] = np.nan
    cfg = GBMConfig(n_rounds=15, max_depth=4, subsample=1.0, colsample=1.0,
                    n_classes=2, seed=0)
    model = GBM(cfg).fit(x, y)
    p = model.predict_proba(x)[:, 1]
    assert ((p[miss] > 0.5) == y[miss]).mean() > 0.9
    probe = np.zeros((3, 6), np.float32)
    probe[0, 0] = np.nan
    probe[1, 0] = -3.0
    probe[2, 0] = 3.0
    pp = model.predict_proba(probe)[:, 1]
    assert abs(pp[0] - pp[1]) < 0.1      # NaN grouped with the class-0 side
    assert abs(pp[0] - pp[2]) > 0.5


def test_sparse_gbm_matches_dense_on_full_data():
    """With every feature present, SparseGBM (CSR path) must reproduce the
    dense GBM: same binning, same histograms, same trees."""
    from lightctr_tpu.models.gbm import SparseGBM

    rng = np.random.default_rng(0)
    n, F = 400, 8
    x = rng.normal(size=(n, F)).astype(np.float32)
    y = ((x[:, 0] + x[:, 1] * x[:, 2]) > 0).astype(np.float32)
    cfg = GBMConfig(n_rounds=8, max_depth=4, subsample=1.0, colsample=1.0,
                    n_classes=2, seed=0)
    dense = GBM(cfg).fit(x, y)
    p_dense = dense.predict_proba(x)[:, 1]

    # CSR with all entries present, feature ids 0..F-1
    indptr = np.arange(n + 1) * F
    ids = np.tile(np.arange(F), n)
    vals = x.reshape(-1)
    sparse = SparseGBM(cfg).fit((indptr, ids, vals), y)
    p_sparse = sparse.predict_proba((indptr, ids, vals))[:, 1]
    np.testing.assert_allclose(p_sparse, p_dense, atol=1e-5)


def test_sparse_gbm_absent_default_direction():
    """Absent features route by the learned default direction — the
    reference's map<fid,val> missing semantics (gbm_algo_abst.h:128-168)."""
    from lightctr_tpu.models.gbm import SparseGBM

    rng = np.random.default_rng(1)
    n = 500
    rows = []
    y = np.zeros(n, np.float32)
    for i in range(n):
        feats = set(rng.choice(50, size=6, replace=False).tolist())
        if rng.random() < 0.5:
            feats.add(3)          # signal feature PRESENT -> class 1
            y[i] = 1.0
        else:
            feats.discard(3)
        rows.append(sorted(feats))
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum([len(r) for r in rows])
    ids = np.concatenate([np.asarray(r) for r in rows])
    vals = np.ones(len(ids), np.float32)
    cfg = GBMConfig(n_rounds=5, max_depth=3, subsample=1.0, colsample=1.0,
                    n_classes=2, seed=0)
    model = SparseGBM(cfg).fit((indptr, ids, vals), y)
    p = model.predict_proba((indptr, ids, vals))[:, 1]
    assert (((p > 0.5) == y).mean()) > 0.97
    # at least one split must route absent rows by a learned direction
    assert any(t.feature.max() >= 0 for rt in model.trees for t in rt)


def test_sparse_gbm_on_ctr_data(train_sparse_path):
    """Trains on the bundled 225k-feature libffm data (VERDICT r1 #7:
    the dense path cannot even represent this)."""
    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models.gbm import SparseGBM

    ds = load_libffm(train_sparse_path)
    cfg = GBMConfig(n_rounds=3, max_depth=4, n_bins=16, subsample=1.0,
                    colsample=1.0, n_classes=2, seed=0)
    model = SparseGBM(cfg).fit(ds, ds.labels)
    assert len(model.feats) > 5000           # active-feature compaction
    p = model.predict_proba(ds)[:, 1]
    acc = ((p > 0.5) == ds.labels).mean()
    assert acc > 0.8, acc


def test_gbm_multiclass():
    rng = np.random.default_rng(1)
    n = 450
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y = (x[:, 0] > 0.3).astype(int) + (x[:, 1] > 0.3).astype(int)  # 3 classes
    cfg = GBMConfig(n_rounds=15, max_depth=4, subsample=1.0, colsample=1.0,
                    n_classes=3, seed=0)
    model = GBM(cfg).fit(x, y)
    assert (model.predict(x) == y).mean() > 0.85


def test_gbm_lossguide_policy():
    """Leaf-wise (best-gain-first) growth with a leaf budget reaches the
    same quality as depthwise on separable data and respects max_leaves."""
    rng = np.random.default_rng(0)
    n = 600
    x = rng.normal(size=(n, 10)).astype(np.float32)
    y = ((x[:, 0] + x[:, 1] * x[:, 2]) > 0).astype(np.float32)
    cfg = GBMConfig(n_rounds=20, max_depth=6, learning_rate=0.3,
                    subsample=1.0, colsample=1.0, n_classes=2, seed=0,
                    grow_policy="lossguide", max_leaves=16)
    model = GBM(cfg).fit(x, y)
    p = model.predict_proba(x)[:, 1]
    assert ((p > 0.5) == y).mean() > 0.9
    for rt in model.trees:
        for t in rt:
            n_leaves = int((t.feature < 0).sum())
            assert n_leaves <= 16


def test_sparse_gbm_lossguide():
    from lightctr_tpu.models.gbm import SparseGBM

    rng = np.random.default_rng(0)
    n, F = 400, 8
    x = rng.normal(size=(n, F)).astype(np.float32)
    y = ((x[:, 0] + x[:, 1] * x[:, 2]) > 0).astype(np.float32)
    indptr = np.arange(n + 1) * F
    ids = np.tile(np.arange(F), n)
    vals = x.reshape(-1)
    cfg = GBMConfig(n_rounds=10, max_depth=6, subsample=1.0, colsample=1.0,
                    n_classes=2, seed=0, grow_policy="lossguide",
                    max_leaves=12)
    model = SparseGBM(cfg).fit((indptr, ids, vals), y)
    p = model.predict_proba((indptr, ids, vals))[:, 1]
    assert ((p > 0.5) == y).mean() > 0.85


def test_gbm_leaf_values_survive_feature0_colsample():
    """Regression: node totals must come from RAW histograms. When
    colsample masks feature 0, the old code read the masked feature-0
    column for (G, H) totals and emitted 0-valued leaves."""
    from lightctr_tpu.models.gbm import _DenseSource, _grow, quantile_bins

    class RiggedRng:
        """Feature mask excludes feature 0, keeps feature 1."""

        def random(self, n):
            return np.array([1.0] + [0.0] * (n - 1))  # 1.0 >= colsample

        def integers(self, n):
            return 1

    n = 64
    rng = np.random.default_rng(3)
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = (x[:, 1] > 0).astype(np.float32)
    g = (0.5 - y).astype(np.float32)       # sigmoid(0) - y
    h = np.full(n, 0.25, np.float32)
    # gamma so high nothing splits: the tree is a single leaf
    cfg = GBMConfig(max_depth=3, colsample=0.5, gamma=1e9, n_classes=2)
    bin_ids, _ = quantile_bins(x, cfg.n_bins)
    src = _DenseSource(bin_ids, cfg.n_bins)
    tree = _grow(cfg, n, src, g, h, np.ones(n, bool), RiggedRng())
    assert tree.feature[0] == -1           # root stayed a leaf
    expected = -g.sum() / (h.sum() + cfg.reg_lambda)
    np.testing.assert_allclose(tree.value[0], expected, rtol=1e-5)


def test_cbow_streaming_matches_quality():
    """Streamed chunked corpus (train_cbow_streaming) learns the same
    pair structure as the in-memory trainer."""
    rng = np.random.default_rng(0)
    V = 20
    pairs = rng.integers(0, V // 2, size=4000)
    tokens = np.empty(8000, np.int64)
    tokens[0::2] = pairs * 2
    tokens[1::2] = pairs * 2 + 1
    counts = np.bincount(tokens, minlength=V)
    cfg = emb.CBOWConfig(vocab_size=V, dim=16, window=1, n_negatives=5,
                         subsample_t=1e9, seed=0)

    def chunks(epoch):
        # 5 chunks per epoch, boundaries aligned to pairs
        for s in range(0, len(tokens), 1600):
            yield tokens[s:s + 1600]

    params = emb.train_cbow_streaming(chunks, counts, cfg, epochs=10,
                                      batch_size=256, learning_rate=0.5)
    e = np.asarray(params["emb"])
    o = np.asarray(params["out"])
    e = e / np.linalg.norm(e, axis=1, keepdims=True).clip(1e-12)
    o = np.linalg.norm(o, axis=1, keepdims=True).clip(1e-12) ** -1 * o
    cross = e @ o.T
    partner = np.mean(
        [cross[2 * i, 2 * i + 1] for i in range(V // 2)]
        + [cross[2 * i + 1, 2 * i] for i in range(V // 2)]
    )
    off = (cross.sum() - np.trace(cross)) / (V * V - V)
    assert partner > off + 0.2


def test_token_chunks_from_text(tmp_path):
    from lightctr_tpu.data.prep import token_chunks_from_text, tokens_from_text

    vocab = ["alpha", "beta", "gamma"]
    text = ("alpha beta unknown gamma " * 50 + "\n") * 8
    p = tmp_path / "corpus.txt"
    p.write_text(text)
    whole = tokens_from_text(str(p), vocab)
    chunks = list(token_chunks_from_text(str(p), vocab, chunk_tokens=100))
    assert len(chunks) > 3
    assert all(len(c) <= 100 for c in chunks[:-1])
    np.testing.assert_array_equal(np.concatenate(chunks), whole)


def test_plsa_fit_scan_matches_fit():
    """fit_scan (one compiled while_loop — the head-to-head path) runs
    the same EM math as the host-loop fit()."""
    rng = np.random.default_rng(5)
    counts = rng.poisson(1.0, size=(60, 40)).astype(np.float32)
    cfg = plsa.PLSAConfig(n_topics=4, n_words=40, seed=2)
    state_scan, ll_scan, epochs = plsa.fit_scan(counts, cfg, epochs=15,
                                                tol_total=0.0)
    assert epochs == 15
    state_loop, ll_loop = plsa.fit(counts, cfg, epochs=15, tol=0.0)
    np.testing.assert_allclose(np.asarray(state_scan.p_w_t),
                               np.asarray(state_loop.p_w_t),
                               rtol=1e-5, atol=1e-7)
    # loose tolerance stops early
    _, _, ep_loose = plsa.fit_scan(counts, cfg, epochs=200, tol_total=50.0)
    assert ep_loose < 200

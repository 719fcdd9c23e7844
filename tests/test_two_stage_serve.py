"""BASELINE config 5: two-stage serve — train Wide&Deep on the bundled CTR
data, cache its item/feature embeddings, retrieve candidates with on-TPU
MIPS top-k over a sharded table, then rescore with the full model.
Also BASELINE config 4: NFM parity on the bundled data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightctr_tpu import optim
from lightctr_tpu.data import load_libffm
from lightctr_tpu.models import nfm, widedeep
from lightctr_tpu.parallel import make_mesh
from lightctr_tpu.serve.ann import MIPSIndex
from lightctr_tpu.serve.scorer import batch_score
from lightctr_tpu.train.loop import evaluate, train_model


@pytest.mark.slow
def test_nfm_reference_data_parity(train_sparse_path, test_sparse_path):
    """NFM trains to reference-grade quality on the bundled data
    (reference TEST_NFM: factor 10, hidden 32, 5 epochs)."""
    train = load_libffm(train_sparse_path)
    test = load_libffm(
        test_sparse_path, n_features=train.n_features, n_fields=train.n_fields
    )
    cfg = nfm.NFMConfig(
        n_features=train.n_features, factor=10, hidden=(32,), l2=1e-4
    )
    tx = optim.adam(5e-3)
    state = train_model(nfm, cfg, train, tx, epochs=10, batch_size=250, log=None)
    m_train = evaluate(nfm, cfg, state.params, train)
    m_test = evaluate(nfm, cfg, state.params, test)
    assert m_train["auc"] > 0.95
    # same parity band as FM (PARITY.md): reference gets 0.60 +- seed var
    assert m_test["auc"] > 0.5
    assert m_test["logloss"] < 1.2  # reference test logloss is 3.18/row


def test_two_stage_retrieve_then_score(sparse_small):
    """Stage 1: MIPS top-k over cached per-item embeddings (sharded over
    the model axis) narrows candidates; stage 2: full Wide&Deep rescoring
    of the shortlist. The shortlist must contain the model's true top
    items far more often than chance."""
    cfg = widedeep.WideDeepConfig(
        n_features=sparse_small.n_features,
        n_fields=sparse_small.n_fields,
        embed_dim=8,
        hidden=(32,),
    )
    tx = optim.adam(0.01)
    state = train_model(
        widedeep, cfg, sparse_small, tx, epochs=6, batch_size=128, log=None
    )
    params = state.params

    # treat each dataset row as an "item"; cache its field-sum embedding
    from lightctr_tpu.ops.interactions import field_sum_embeddings
    from lightctr_tpu.data import sparse_batches

    item_vecs = []
    full_scores = []
    for b in sparse_batches(sparse_small, batch_size=128):
        xv = b["vals"] * b["mask"]
        fs = field_sum_embeddings(
            params["embed"], jnp.asarray(b["ids"]), jnp.asarray(b["fields"]),
            jnp.asarray(xv), cfg.n_fields,
        )
        item_vecs.append(np.asarray(fs.reshape(fs.shape[0], -1)))
        logits = widedeep.forward(params, b, cfg)
        full_scores.append(np.asarray(logits))
    items = np.concatenate(item_vecs)[: len(sparse_small)]
    full_scores = np.concatenate(full_scores)[: len(sparse_small)]

    # stage 1: retrieval via the deep tower's first layer as query proj
    mesh = make_mesh(data=1, model=8)
    index = MIPSIndex(items, mesh=mesh)
    w1 = np.asarray(params["mlp"][0]["w"])  # [F*K, H]
    query = items[:8] @ w1 @ w1.T           # crude query embedding
    scores, ids = index.query(query, k=50)
    ids = np.asarray(ids)

    # stage 2: rescore the shortlist with the full model; the candidate set
    # should cover the globally top-scored items much better than random
    top_global = set(np.argsort(-full_scores)[:50].tolist())
    hits = [len(top_global & set(ids[i].tolist())) for i in range(ids.shape[0])]
    # random 50-of-512 would expect ~4.9 overlap
    assert np.mean(hits) > 2 * 50 * 50 / len(sparse_small)


def test_scorer_on_widedeep(sparse_small):
    cfg = widedeep.WideDeepConfig(
        n_features=sparse_small.n_features,
        n_fields=sparse_small.n_fields,
        embed_dim=4,
        hidden=(16,),
    )
    tx = optim.adam(0.01)
    state = train_model(
        widedeep, cfg, sparse_small, tx, epochs=5, batch_size=128, log=None
    )
    metrics = batch_score(widedeep, cfg, state.params, sparse_small)
    assert metrics["auc"] > 0.9


def test_mips_topk_chunked_matches_dense():
    """The chunked running-top-k (the large-catalogue serving path)
    returns the same ids/scores as the dense mips_topk."""
    import numpy as np
    import jax.numpy as jnp
    from lightctr_tpu.serve.ann import mips_topk, mips_topk_chunked

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(1000, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(7, 16)).astype(np.float32))
    for metric in ("ip", "cos", "l2"):
        s1, i1 = mips_topk(q, items, k=9, metric=metric)
        s2, i2 = mips_topk_chunked(q, items, k=9, metric=metric, chunk=256)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.sort(np.asarray(i2), axis=1),
                                      np.sort(np.asarray(i1), axis=1))


def test_ffm_kernel_scorer_matches_dense():
    """The kernel-formulation FFM scorer (the serving path for shapes
    where the dense [B, L, F, K] forward cannot compile) returns the
    SAME probabilities and batch_score metrics as the dense scorer."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.models import ffm
    from lightctr_tpu.serve.scorer import batch_score, make_ffm_kernel_scorer, make_scorer

    rng = np.random.default_rng(0)
    V, F, Kf, N, L = 5000, 6, 4, 200, 10
    ids = rng.integers(0, V, (N, L)).astype(np.int64)
    ds = SparseDataset(
        ids=ids,
        vals=np.ones((N, L), np.float32),
        fields=(ids % F).astype(np.int64),
        mask=np.ones((N, L), np.float32),
        labels=rng.integers(0, 2, (N,)).astype(np.float32),
        nnz=np.full((N,), L, np.int32),
        n_features=V,
        n_fields=F,
    )
    cfg = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(0), cfg)
    params["w"] = jnp.asarray(
        rng.normal(size=(V,)).astype(np.float32) * 0.1)

    m_dense = batch_score(ffm, cfg, params, ds, batch_size=64)
    m_kernel = batch_score(ffm, cfg, params, ds, batch_size=64,
                           engine="kernel")
    assert abs(m_dense["auc"] - m_kernel["auc"]) < 1e-6
    assert abs(m_dense["logloss"] - m_kernel["logloss"]) < 1e-5


def test_ffm_grouped_scorer_matches_dense():
    """The grouped active-width FFM scorer (the serving twin of the
    grouped trainer) returns the SAME probabilities as the dense scorer
    on an init-transplanted model — including masked positions, skewed
    field sizes, and non-unit values."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.models import ffm
    from lightctr_tpu.serve.scorer import make_ffm_grouped_scorer, make_scorer

    rng = np.random.default_rng(7)
    V, F, Kf, B, L = 5000, 6, 4, 64, 10
    # skewed fields: ids partition by id % F but traffic favours field 0
    raw = np.where(rng.random((B, L)) < 0.6,
                   rng.integers(0, V // F, (B, L)) * F,
                   rng.integers(0, V, (B, L)))
    ids = raw.astype(np.int64)
    mask = (rng.random((B, L)) < 0.9).astype(np.float32)
    batch = {
        "ids": ids,
        "vals": rng.normal(size=(B, L)).astype(np.float32),
        "fields": (ids % F).astype(np.int64),
        "mask": mask,
        "labels": np.zeros((B,), np.float32),
        "row_mask": np.ones((B,), np.float32),
    }
    cfg = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(3), cfg)
    params["w"] = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
    params["w0"] = jnp.asarray(0.2)

    dense = make_scorer(ffm, cfg, params)
    grouped = make_ffm_grouped_scorer(cfg, params, max_groups=3)
    p_dense = np.asarray(dense({k: jnp.asarray(v) for k, v in batch.items()}))
    p_grp = np.asarray(grouped(batch))
    np.testing.assert_allclose(p_grp, p_dense, rtol=2e-5, atol=2e-6)

    # frozen layout: a second batch with similar traffic reuses the ONE
    # compiled program (no re-calibration, no fresh compile)
    ids2 = np.where(rng.random((B, L)) < 0.6,
                    rng.integers(0, V // F, (B, L)) * F,
                    rng.integers(0, V, (B, L))).astype(np.int64)
    batch2 = dict(batch, ids=ids2, fields=(ids2 % F).astype(np.int64))
    p2_dense = np.asarray(dense({k: jnp.asarray(v)
                                 for k, v in batch2.items()}))
    p2 = np.asarray(grouped(batch2))
    np.testing.assert_allclose(p2, p2_dense, rtol=2e-5, atol=2e-6)
    assert grouped.state["replans"] == 1
    assert len(grouped.compile_keys) == 1

    # overflow: much heavier traffic breaches the calibrated capacities
    # -> loud re-calibration, results still exact
    B3 = 4 * B
    ids3 = rng.integers(0, V, (B3, L)).astype(np.int64)
    batch3 = {
        "ids": ids3,
        "vals": np.ones((B3, L), np.float32),
        "fields": (ids3 % F).astype(np.int64),
        "mask": np.ones((B3, L), np.float32),
        "labels": np.zeros((B3,), np.float32),
        "row_mask": np.ones((B3,), np.float32),
    }
    p3_dense = np.asarray(dense({k: jnp.asarray(v)
                                 for k, v in batch3.items()}))
    p3 = np.asarray(grouped(batch3))
    np.testing.assert_allclose(p3, p3_dense, rtol=2e-5, atol=2e-6)
    assert grouped.state["replans"] == 2
    # (exact=False bf16 mode is TPU-only — the CPU test backend lacks
    # bf16 x bf16 = f32 dots; measured on-chip in bench_scoring.py)


def test_scorer_compute_dtype_cast_path():
    """compute_dtype exercises the cast path (params + float batch
    entries); with float32 it must be a no-op vs the default scorer.
    (bfloat16 is TPU-measured in bench_scoring — CPU lacks bf16 dots.)"""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.models import ffm
    from lightctr_tpu.serve.scorer import make_scorer

    rng = np.random.default_rng(5)
    V, F, Kf, B, L = 1000, 4, 4, 16, 8
    ids = rng.integers(0, V, (B, L)).astype(np.int64)
    batch = {
        "ids": jnp.asarray(ids),
        "vals": jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)),
        "fields": jnp.asarray((ids % F).astype(np.int64)),
        "mask": jnp.ones((B, L), jnp.float32),
        "labels": jnp.zeros((B,), jnp.float32),
        "row_mask": jnp.ones((B,), jnp.float32),
    }
    cfg = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(0), cfg)
    p0 = np.asarray(make_scorer(ffm, cfg, params)(batch))
    p1 = np.asarray(make_scorer(ffm, cfg, params,
                                compute_dtype=jnp.float32)(batch))
    np.testing.assert_allclose(p1, p0, rtol=1e-6)


def test_scan_scorer_matches_per_batch():
    """make_scan_scorer (K stacked batches, one dispatch) returns the
    same probabilities as make_scorer applied per batch."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.models import ffm
    from lightctr_tpu.serve.scorer import make_scan_scorer, make_scorer

    rng = np.random.default_rng(9)
    V, F, Kf, K, B, L = 800, 4, 4, 3, 16, 8
    ids = rng.integers(0, V, (K, B, L)).astype(np.int64)
    batches = {
        "ids": jnp.asarray(ids),
        "vals": jnp.asarray(rng.normal(size=(K, B, L)).astype(np.float32)),
        "fields": jnp.asarray((ids % F).astype(np.int64)),
        "mask": jnp.asarray((rng.random((K, B, L)) < 0.9)
                            .astype(np.float32)),
        "labels": jnp.zeros((K, B), jnp.float32),
        "row_mask": jnp.ones((K, B), jnp.float32),
    }
    cfg = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(1), cfg)
    scan = make_scan_scorer(ffm, cfg, params)
    per = make_scorer(ffm, cfg, params)
    p_scan = np.asarray(scan(batches))
    assert p_scan.shape == (K, B)
    for k in range(K):
        pk = np.asarray(per({key: v[k] for key, v in batches.items()}))
        np.testing.assert_allclose(p_scan[k], pk, rtol=1e-6)


def test_batch_score_scan_matches_per_batch():
    """batch_score(scan=K) — stacked-dispatch dataset scoring — returns
    identical metrics and dump to per-batch scoring, including the
    zero-filled partial final stack."""
    import numpy as np
    import jax

    from lightctr_tpu.data.libffm import SparseDataset
    from lightctr_tpu.models import ffm
    from lightctr_tpu.serve.scorer import batch_score

    rng = np.random.default_rng(11)
    V, F, Kf, N, L = 2000, 5, 4, 310, 10   # 310 rows: partial batch AND
    ids = rng.integers(0, V, (N, L)).astype(np.int64)  # partial stack
    ds = SparseDataset(
        ids=ids,
        vals=np.ones((N, L), np.float32),
        fields=(ids % F).astype(np.int64),
        mask=np.ones((N, L), np.float32),
        labels=rng.integers(0, 2, (N,)).astype(np.float32),
        nnz=np.full((N,), L, np.int32),
        n_features=V,
        n_fields=F,
    )
    cfg = ffm.FFMConfig(n_features=V, n_fields=F, factor=Kf)
    params = ffm.init(jax.random.PRNGKey(2), cfg)
    m0 = batch_score(ffm, cfg, params, ds, batch_size=64)
    m1 = batch_score(ffm, cfg, params, ds, batch_size=64, scan=3)
    assert abs(m0["auc"] - m1["auc"]) < 1e-9
    assert abs(m0["logloss"] - m1["logloss"]) < 1e-7


def test_scan_scorer_widedeep_and_nfm():
    """make_scan_scorer works across the model zoo (widedeep needs
    fields; nfm is field-free) — per-batch equality like the FFM test."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.models import nfm, widedeep
    from lightctr_tpu.serve.scorer import make_scan_scorer, make_scorer

    rng = np.random.default_rng(13)
    V, F, K, B, L = 600, 4, 3, 8, 6
    ids = rng.integers(0, V, (K, B, L)).astype(np.int64)
    batches = {
        "ids": jnp.asarray(ids),
        "vals": jnp.ones((K, B, L), jnp.float32),
        "fields": jnp.asarray((ids % F).astype(np.int64)),
        "mask": jnp.ones((K, B, L), jnp.float32),
        "labels": jnp.zeros((K, B), jnp.float32),
        "row_mask": jnp.ones((K, B), jnp.float32),
    }
    for mod, cfg in (
        (widedeep, widedeep.WideDeepConfig(
            n_features=V, n_fields=F, embed_dim=4, hidden=(8,))),
        (nfm, nfm.NFMConfig(n_features=V, factor=4, hidden=(8,))),
    ):
        params = mod.init(jax.random.PRNGKey(0), cfg)
        p_scan = np.asarray(make_scan_scorer(mod, cfg, params)(batches))
        per = make_scorer(mod, cfg, params)
        for k in range(K):
            pk = np.asarray(per({key: v[k] for key, v in batches.items()}))
            np.testing.assert_allclose(p_scan[k], pk, rtol=1e-6)

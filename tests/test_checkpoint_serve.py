import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu import optim
from lightctr_tpu.models import fm
from lightctr_tpu.serve.ann import MIPSIndex, mips_topk
from lightctr_tpu.serve.scorer import batch_score
from lightctr_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from lightctr_tpu.train.loop import train_model


def test_checkpoint_roundtrip(tmp_path):
    cfg = fm.FMConfig(n_features=100, factor=4)
    params = fm.init(jax.random.PRNGKey(0), cfg)
    tx = optim.adam(0.01)
    opt_state = tx.init(params)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": params, "opt": opt_state}, {"step": 7})
    restored = load_checkpoint(path, {"params": params, "opt": opt_state})
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["v"]), np.asarray(params["v"])
    )
    # optimizer state structure survives (count, mu, nu)
    assert int(restored["opt"].count) == int(opt_state.count)
    np.testing.assert_array_equal(
        np.asarray(restored["opt"].mu["v"]), np.asarray(opt_state.mu["v"])
    )

    from lightctr_tpu.train.checkpoint import checkpoint_metadata

    assert checkpoint_metadata(path)["step"] == 7


def test_checkpoint_mismatch_raises(tmp_path):
    cfg = fm.FMConfig(n_features=100, factor=4)
    params = fm.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    other = fm.init(jax.random.PRNGKey(0), fm.FMConfig(n_features=100, factor=8))
    try:
        load_checkpoint(path, {"different": other})
    except ValueError:
        pass
    else:
        raise AssertionError("expected mismatch error")


def test_mips_topk_exact():
    rng = np.random.default_rng(0)
    items = rng.normal(size=(1000, 16)).astype(np.float32)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    scores, ids = mips_topk(jnp.asarray(queries), jnp.asarray(items), k=5)
    brute = queries @ items.T
    expect_ids = np.argsort(-brute, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(ids), expect_ids)
    # l2 metric returns nearest neighbours
    scores_l2, ids_l2 = mips_topk(jnp.asarray(queries), jnp.asarray(items), k=3, metric="l2")
    d2 = ((queries[:, None, :] - items[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(ids_l2), np.argsort(d2, axis=1)[:, :3])


def test_mips_index_sharded():
    from lightctr_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(1)
    items = rng.normal(size=(800, 16)).astype(np.float32)
    idx = MIPSIndex(items, mesh=mesh)
    queries = rng.normal(size=(4, 16)).astype(np.float32)
    scores, ids = idx.query(queries, k=4)
    expect = np.argsort(-(queries @ items.T), axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(ids), expect)


def test_batch_score_dump(tmp_path, sparse_small):
    cfg = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    tx = optim.adagrad(0.2)
    state = train_model(fm, cfg, sparse_small, tx, epochs=3, batch_size=128, log=None)
    dump = str(tmp_path / "preds.txt")
    metrics = batch_score(fm, cfg, state.params, sparse_small, dump_path=dump)
    assert metrics["auc"] > 0.8
    lines = open(dump).read().splitlines()
    assert len(lines) == len(sparse_small)
    assert all(0.0 <= float(x) <= 1.0 for x in lines[:10])


def test_fm_text_model_roundtrip(tmp_path, sparse_small):
    import jax

    from lightctr_tpu.models.fm import load_text_model, save_text_model

    cfg = fm.FMConfig(n_features=sparse_small.n_features, factor=4)
    tx = optim.adagrad(0.2)
    state = train_model(fm, cfg, sparse_small, tx, epochs=3, batch_size=128, log=None)
    path = str(tmp_path / "fm_model.txt")
    n = save_text_model(path, state.params)
    assert 0 < n <= sparse_small.n_features
    restored = load_text_model(path, cfg)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(restored["w"]), np.asarray(state.params["w"]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(restored["v"]), np.asarray(state.params["v"]), atol=2e-6
    )


def test_sparse_dump_roundtrip_and_size(tmp_path):
    """The PS wire codec as a FILE format (r2 weakness: wire.py was a
    capability demo): a vocab-scale FM params dict round-trips through
    save/load_sparse_dump at fp16 precision, untouched rows stay exactly
    zero, and the dump is a small fraction of the dense npz."""
    import os

    import numpy as np
    import jax.numpy as jnp

    from lightctr_tpu.train.checkpoint import (
        load_sparse_dump,
        save_checkpoint,
        save_sparse_dump,
    )

    rng = np.random.default_rng(0)
    V, K, live_n = 200_000, 8, 1500
    live = np.sort(rng.choice(V, live_n, replace=False))
    w = np.zeros(V, np.float32)
    v = np.zeros((V, K), np.float32)
    w[live] = rng.normal(size=live_n)
    v[live] = rng.normal(size=(live_n, K))
    params = {"w0": jnp.float32(0.25), "w": jnp.asarray(w),
              "v": jnp.asarray(v)}

    n = save_sparse_dump(str(tmp_path / "m"), params, {"model": "fm"})
    assert n == live_n
    got, meta = load_sparse_dump(str(tmp_path / "m"))
    assert meta == {"model": "fm"}
    np.testing.assert_allclose(np.asarray(got["w"]), w, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["v"]), v, rtol=2e-3,
                               atol=2e-3)
    dead = np.setdiff1d(np.arange(V), live)[:1000]
    assert (np.asarray(got["w"])[dead] == 0).all()
    assert float(got["w0"]) == 0.25

    save_checkpoint(str(tmp_path / "dense"), params)
    sparse_bytes = os.path.getsize(tmp_path / "m.spz")
    dense_bytes = os.path.getsize(tmp_path / "dense.npz")
    assert sparse_bytes < dense_bytes / 50

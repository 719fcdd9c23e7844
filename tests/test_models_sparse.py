"""End-to-end model tests: each sparse model learns the synthetic rule,
and FM reaches reference-grade AUC on the bundled real CTR data."""

import numpy as np
import pytest

from lightctr_tpu import optim
from lightctr_tpu.data import load_libffm
from lightctr_tpu.models import ffm, fm, lr, nfm, widedeep
from lightctr_tpu.train.loop import evaluate, train_model


def _fit_and_auc(model, cfg, ds, tx, epochs=8, batch_size=128):
    state = train_model(
        model, cfg, ds, tx, epochs=epochs, batch_size=batch_size, log=None
    )
    return evaluate(model, cfg, state.params, ds)["auc"]


def test_lr_ftrl_learns(sparse_small):
    cfg = lr.LRConfig(n_features=sparse_small.n_features)
    tx = optim.ftrl(alpha=0.3, lambda1=0.01, lambda2=0.01)
    assert _fit_and_auc(lr, cfg, sparse_small, tx) > 0.9


def test_fm_learns(sparse_small):
    cfg = fm.FMConfig(n_features=sparse_small.n_features, factor=8)
    tx = optim.adagrad(0.2)
    assert _fit_and_auc(fm, cfg, sparse_small, tx) > 0.9


def test_ffm_learns(sparse_small):
    cfg = ffm.FFMConfig(
        n_features=sparse_small.n_features,
        n_fields=sparse_small.n_fields,
        factor=4,
    )
    tx = optim.adagrad(0.2)
    assert _fit_and_auc(ffm, cfg, sparse_small, tx) > 0.9


def test_nfm_learns(sparse_small):
    cfg = nfm.NFMConfig(n_features=sparse_small.n_features, factor=8, hidden=(32,))
    tx = optim.adam(0.01)
    assert _fit_and_auc(nfm, cfg, sparse_small, tx) > 0.9


def test_widedeep_learns(sparse_small):
    cfg = widedeep.WideDeepConfig(
        n_features=sparse_small.n_features,
        n_fields=sparse_small.n_fields,
        embed_dim=4,
        hidden=(50,),
    )
    tx = optim.adam(0.01)
    assert _fit_and_auc(widedeep, cfg, sparse_small, tx) > 0.9


@pytest.mark.slow
def test_fm_reference_data_auc(train_sparse_path, test_sparse_path):
    """AUC-parity gate on the bundled CTR data (BASELINE.md acceptance)."""
    train = load_libffm(train_sparse_path)
    nf = train.n_features
    test = load_libffm(test_sparse_path, n_features=nf, n_fields=train.n_fields)
    # OOV test ids are hashed into the train vocabulary by the loader
    assert test.ids.max() < nf
    # Reference ground truth (measured by building/running the reference's
    # TEST_FM on this host, k=16, 5 epochs, same data): test AUC = 0.6018,
    # test accuracy = 0.74, test logloss = 3.18/row (heavy overfit on the
    # 1000-row train set). Gate: match its AUC, beat its logloss.
    cfg = fm.FMConfig(n_features=nf, factor=8, l2=1e-4)
    tx = optim.adagrad(0.05)
    state = train_model(fm, cfg, train, tx, epochs=30, batch_size=250, log=None)
    m_train = evaluate(fm, cfg, state.params, train)
    m_test = evaluate(fm, cfg, state.params, test)
    assert m_train["auc"] > 0.95
    assert m_test["auc"] > 0.58
    assert m_test["logloss"] < 1.2

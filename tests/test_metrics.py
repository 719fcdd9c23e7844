import numpy as np
import pytest

from lightctr_tpu.utils.metrics import (
    MetricAccumulator,
    accuracy,
    auc,
    logloss,
    precision_recall_f1,
)


def _sklearn_free_auc(scores, labels):
    """Exact pairwise AUC (O(n^2)) as ground truth."""
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
    return wins / (len(pos) * len(neg))


@pytest.mark.parametrize("seed", [0, 1])
def test_auc_matches_exact_pairwise(seed):
    rng = np.random.default_rng(seed)
    n = 500
    labels = rng.integers(0, 2, n).astype(np.float32)
    scores = np.clip(rng.random(n).astype(np.float32), 0, 1)
    expect = _sklearn_free_auc(scores, labels)
    got = float(auc(scores, labels))
    assert abs(got - expect) < 1e-3


def test_auc_perfect_and_random():
    labels = np.array([0, 0, 1, 1], np.float32)
    assert float(auc(np.array([0.1, 0.2, 0.8, 0.9]), labels)) == pytest.approx(1.0, abs=1e-6)
    assert float(auc(np.array([0.9, 0.8, 0.2, 0.1]), labels)) == pytest.approx(0.0, abs=1e-6)
    assert float(auc(np.array([0.5, 0.5, 0.5, 0.5]), labels)) == pytest.approx(0.5, abs=1e-6)


def test_logloss_and_accuracy():
    labels = np.array([1, 0], np.float32)
    scores = np.array([0.9, 0.1], np.float32)
    expect = -np.mean([np.log(0.9), np.log(0.9)])
    assert float(logloss(scores, labels)) == pytest.approx(expect, rel=1e-5)
    assert float(accuracy(scores, labels)) == 1.0


def test_precision_recall_f1():
    labels = np.array([1, 1, 0, 0], np.float32)
    scores = np.array([0.9, 0.1, 0.8, 0.2], np.float32)
    p, r, f1 = precision_recall_f1(scores, labels)
    assert float(p) == pytest.approx(0.5)
    assert float(r) == pytest.approx(0.5)
    assert float(f1) == pytest.approx(0.5)


def test_streaming_accumulator_matches_oneshot():
    rng = np.random.default_rng(2)
    n = 400
    labels = rng.integers(0, 2, n).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    acc = MetricAccumulator()
    acc.update(scores[:150], labels[:150])
    acc.update(scores[150:], labels[150:])
    res = acc.result()
    assert res["auc"] == pytest.approx(float(auc(scores, labels)), abs=1e-4)
    assert res["logloss"] == pytest.approx(float(logloss(scores, labels)), rel=1e-4)
